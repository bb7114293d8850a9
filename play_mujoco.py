"""Cross-sim evaluation of a trained policy in MuJoCo.

Reference entry point: play_mujoco.py (1150 lines of harness around the same
core).  This CLI drives booster_gym_tpu.eval.mujoco_eval:

  * --checkpoint: our JAX checkpoint (-1 = newest) OR a TorchScript .pt
  * headless by default: runs scripted commands, reports tracking metrics,
    optionally records states and renders video (if a GL backend exists);
  * --interactive: passive MuJoCo viewer with keyboard commands (requires a
    display).

Usage:
  python play_mujoco.py --task=T1 --checkpoint=-1 --seconds=10 --vx=0.4
  python play_mujoco.py --task=T1 --policy_pt=deploy/models/T1.pt
"""

import argparse

import numpy as np


def build_policy(args, cfg):
    if args.policy_pt:
        from booster_gym_tpu.eval.mujoco_eval import torchscript_policy

        return torchscript_policy(args.policy_pt)
    from booster_gym_tpu.algo import PPO
    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.eval.mujoco_eval import jax_policy
    from booster_gym_tpu.utils.recorder import load_checkpoint, resolve_checkpoint

    cfg_small = dict(cfg)
    cfg_small["env"] = dict(cfg["env"], num_envs=1)
    env = make_task(cfg_small)
    ppo = PPO(env, cfg_small)
    saved = load_checkpoint(resolve_checkpoint(args.checkpoint))
    return jax_policy(ppo, saved["params"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default="T1")
    parser.add_argument("--checkpoint", default="-1")
    parser.add_argument("--policy_pt", default=None,
                        help="TorchScript actor (.pt); overrides --checkpoint")
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--vx", type=float, default=0.4)
    parser.add_argument("--vy", type=float, default=0.0)
    parser.add_argument("--vyaw", type=float, default=0.0)
    parser.add_argument("--gait_frequency", type=float, default=1.5)
    parser.add_argument("--video", default=None, help="output mp4 path")
    parser.add_argument("--interactive", action="store_true")
    args = parser.parse_args()

    from booster_gym_tpu.eval.mujoco_eval import MujocoEval
    from booster_gym_tpu.utils.config import load_task_cfg

    cfg = load_task_cfg(args.task)
    policy = build_policy(args, cfg)
    ev = MujocoEval(cfg, policy)

    if args.interactive:
        import mujoco.viewer

        cmd = np.array([args.vx, args.vy, args.vyaw], np.float32)
        saved = {"snap": None}

        def on_key(keycode):
            # w/s: vx, a/d: vy, q/e: yaw, space: stop, z/x: save/load state,
            # r: reset (the reference's keyboard map, play_mujoco.py:139-278)
            c = chr(keycode).lower() if 0 <= keycode < 256 else ""
            if c == "w":
                cmd[0] += 0.1
            elif c == "s":
                cmd[0] -= 0.1
            elif c == "a":
                cmd[1] += 0.1
            elif c == "d":
                cmd[1] -= 0.1
            elif c == "q":
                cmd[2] += 0.1
            elif c == "e":
                cmd[2] -= 0.1
            elif c == " ":
                cmd[:] = 0.0
            elif c == "z":
                saved["snap"] = ev.save_state()
            elif c == "x" and saved["snap"] is not None:
                ev.restore_state(saved["snap"])
            elif c == "r":
                ev.reset()

        with mujoco.viewer.launch_passive(
                ev.model, ev.data, key_callback=on_key) as viewer:
            while viewer.is_running():
                ev.substep(cmd)
                viewer.cam.lookat[:] = ev.data.qpos[:3]
                viewer.sync()
        return

    traj = ev.run(args.seconds, commands=(args.vx, args.vy, args.vyaw),
                  gait_frequency=args.gait_frequency)
    qpos = traj["qpos"]
    h = qpos[:, 2]
    dt = ev.model.opt.timestep
    # achieved base velocity in the heading frame over the run
    disp = qpos[-1, :2] - qpos[0, :2]
    print(f"ran {args.seconds:.1f}s  height min/mean: {h.min():.3f}/{h.mean():.3f}")
    print(f"displacement: {np.linalg.norm(disp):.2f} m "
          f"(commanded vx={args.vx} -> ideal {abs(args.vx) * args.seconds:.2f} m)")
    fell = h.min() < 0.4
    print("FELL" if fell else "stayed upright")

    if args.video:
        from booster_gym_tpu.envs.t1 import _resolve_asset
        from booster_gym_tpu.eval.render import render_states_to_video

        path = render_states_to_video(
            _resolve_asset(cfg["asset"]["mujoco_file"]),
            qpos[:: max(1, int(1 / (50 * dt)))], args.video, fps=50)
        print(f"video written to {path}")


if __name__ == "__main__":
    main()
