"""Offline video rendering from logged trajectories.

Replaces the reference's two rendering paths: the in-sim camera video
(reference: envs/base_task.py:96-140 + utils/runner.py:230-241) and the
MuJoCo batch state-renderer (reference: play_mujoco.py:451-688).  Design:
simulation logs states, rendering happens offline from states — never in
the hot loop — using MuJoCo's offscreen renderer with a worker pool.

Requires a GL backend (EGL/osmesa); raises a clear error when the host has
none (this container does not).
"""

import multiprocessing as mp
import os

import numpy as np


def _gl_available():
    for backend in ("egl", "osmesa", "glfw"):
        try:
            os.environ.setdefault("MUJOCO_GL", backend)
            import mujoco

            m = mujoco.MjModel.from_xml_string("<mujoco><worldbody/></mujoco>")
            mujoco.Renderer(m, 32, 32)
            return True
        except Exception:
            os.environ.pop("MUJOCO_GL", None)
    return False


def _render_worker(mjcf_path, qpos_chunk, width, height, queue, idx):
    import mujoco

    model = mujoco.MjModel.from_xml_path(mjcf_path)
    data = mujoco.MjData(model)
    renderer = mujoco.Renderer(model, height, width)
    cam = mujoco.MjvCamera()
    frames = []
    for qpos in qpos_chunk:
        data.qpos[:] = qpos
        mujoco.mj_forward(model, data)
        cam.lookat[:] = data.qpos[:3]
        cam.distance = 3.0
        cam.elevation = -20
        renderer.update_scene(data, cam)
        frames.append(renderer.render().copy())
    queue.put((idx, frames))


def render_states_to_video(mjcf_path, qpos_seq, out_path, fps=50,
                           width=640, height=480, workers=4):
    """Batch-render a qpos sequence to mp4 using a process pool (the
    reference's mp.Process + Queue pattern, play_mujoco.py:533-688)."""
    if not _gl_available():
        raise RuntimeError(
            "no GL backend (EGL/osmesa) available for offscreen rendering")
    import imageio

    qpos_seq = np.asarray(qpos_seq)
    chunks = np.array_split(qpos_seq, workers)
    queue = mp.Queue()
    procs = []
    for i, chunk in enumerate(chunks):
        p = mp.Process(
            target=_render_worker,
            args=(mjcf_path, chunk, width, height, queue, i))
        p.start()
        procs.append(p)
    results = {}
    for _ in procs:
        idx, frames = queue.get()
        results[idx] = frames
    for p in procs:
        p.join()
    with imageio.get_writer(out_path, fps=fps) as writer:
        for i in range(len(chunks)):
            for frame in results[i]:
                writer.append_data(frame)
    return out_path


def render_trajectory(cfg, traj, env_idx=0, out_dir="videos"):
    """Render one env's logged trajectory (from Runner.play) to video."""
    import time as _time

    from booster_gym_tpu.envs.t1 import _resolve_asset

    os.makedirs(out_dir, exist_ok=True)
    qpos_seq = [
        np.concatenate([t["root_pos"][env_idx], t["root_quat"][env_idx], t["q"][env_idx]])
        for t in traj
    ]
    name = _time.strftime("%Y-%m-%d-%H-%M-%S.mp4", _time.localtime())
    out = os.path.join(out_dir, name)
    mjcf = _resolve_asset(cfg["asset"]["mujoco_file"])
    dt = cfg["control"]["decimation"] * cfg["sim"]["dt"]
    return render_states_to_video(mjcf, qpos_seq, out, fps=int(1.0 / dt))
