"""Cross-sim evaluation in MuJoCo.

Re-implementation of the reference's play_mujoco.py runtime core
(reference: play_mujoco.py:717-764 step_simulation, :804-941
initialize_simulation): run a trained policy in a physics engine it never
trained in, as the de-facto integration test (SURVEY.md §4).  The obs
layout, PD law, ctrlrange clipping, and gait clock match the reference
exactly; MuJoCo remains the independent CPU oracle on purpose.

The policy is a plain callable obs[47] -> action[12]; adapters for JAX
params and TorchScript actors are provided, so both our checkpoints and the
reference's shipped deploy/models/T1.pt run through the same harness.
"""

import os
import re

import numpy as np

# mujoco binds its GL backend by MUJOCO_GL at import time; on a headless
# host the default (glfw/X11) hard-aborts at first offscreen render, so
# pick EGL (Mesa software EGL works in GL-less containers) before any
# `import mujoco` can run.  Interactive use on a real display is untouched.
if "MUJOCO_GL" not in os.environ and not os.environ.get("DISPLAY"):
    os.environ["MUJOCO_GL"] = "egl"


def load_mjcf(path):
    """mujoco.MjModel from an MJCF path, tolerating scene-less files.

    The reference's T1_serial.xml (reference: resources/T1/T1_serial.xml:211)
    references a `ground` plane geom in its <contact> pairs but never
    defines one — it expects to be composed into a scene file.  When the
    direct load fails on that missing geom, patch the XML in memory: make
    meshdir absolute (string loads resolve relative to the cwd) and insert
    a ground plane matching T1_locomotion.xml:36's (plane, condim=1).
    """
    import mujoco

    try:
        return mujoco.MjModel.from_xml_path(path)
    except ValueError:
        with open(path) as f:
            xml = f.read()
        base = os.path.dirname(os.path.abspath(path))
        xml = re.sub(
            r'meshdir="([^"]+)"',
            lambda m: f'meshdir="{os.path.join(base, m.group(1))}"',
            xml)
        xml = xml.replace(
            "<worldbody>",
            '<worldbody>\n    <geom name="ground" type="plane" '
            'pos="0 0 0" size="0 0 1" condim="1"/>',
            1)
        return mujoco.MjModel.from_xml_string(xml)


def quat_rotate_inverse_np(q_xyzw, v):
    """numpy world->body rotation with xyzw quats (the reference's deploy
    math, deploy/utils/rotate.py semantics)."""
    x, y, z, w = q_xyzw
    u = np.array([x, y, z])
    uv = np.cross(u, v)
    return v - 2.0 * (w * uv - np.cross(u, uv))


def jax_policy(ppo, params):
    import jax
    import jax.numpy as jnp

    act = jax.jit(lambda p, o: ppo.act(p, o)[0])

    def policy(obs):
        return np.asarray(act(params, jnp.asarray(obs[None], jnp.float32)))[0]

    return policy


def torchscript_policy(path):
    import torch

    module = torch.jit.load(path, map_location="cpu")
    module.eval()

    def policy(obs):
        with torch.no_grad():
            out = module(torch.from_numpy(obs.astype(np.float32)).unsqueeze(0))
        return out.squeeze(0).numpy()

    return policy


class MujocoEval:
    def __init__(self, cfg, policy):
        import mujoco

        from booster_gym_tpu.envs.t1 import _resolve_asset

        self.mujoco = mujoco
        self.cfg = cfg
        self.policy = policy
        self.model = mujoco.MjModel.from_xml_path(
            _resolve_asset(cfg["asset"]["mujoco_file"]))
        self.model.opt.timestep = cfg["sim"]["dt"]
        self.data = mujoco.MjData(self.model)
        self.decimation = cfg["control"]["decimation"]

        names = [
            mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_ACTUATOR, i)
            for i in range(self.model.nu)
        ]
        nd = len(names)
        self.default_dof_pos = np.zeros(nd, np.float32)
        self.kp = np.zeros(nd, np.float32)
        self.kd = np.zeros(nd, np.float32)
        angle_cfg = cfg["init_state"]["default_joint_angles"]
        for i, n in enumerate(names):
            found = False
            for key, val in angle_cfg.items():
                if key != "default" and key in n:
                    self.default_dof_pos[i] = val
                    found = True
            if not found:
                self.default_dof_pos[i] = angle_cfg["default"]
            for key in cfg["control"]["stiffness"]:
                if key in n:
                    self.kp[i] = cfg["control"]["stiffness"][key]
                    self.kd[i] = cfg["control"]["damping"][key]
        self.reset()

    def reset(self):
        cfg = self.cfg
        self.data.qpos[:3] = cfg["init_state"]["pos"]
        rot = cfg["init_state"]["rot"]  # xyzw in config
        self.data.qpos[3:7] = [rot[3], rot[0], rot[1], rot[2]]  # -> wxyz
        self.data.qpos[7:] = self.default_dof_pos
        self.data.qvel[:] = 0
        self.mujoco.mj_forward(self.model, self.data)
        self.actions = np.zeros(self.model.nu, np.float32)
        self.dof_targets = self.default_dof_pos.copy()
        self.gait_frequency = 1.5
        self.gait_process = 0.0
        self.iteration = 0

    def build_obs(self, commands):
        """47-dim obs from MuJoCo state + IMU sensors
        (play_mujoco.py:726-748)."""
        n = self.cfg["normalization"]
        dof_pos = self.data.qpos.astype(np.float32)[7:]
        dof_vel = self.data.qvel.astype(np.float32)[6:]
        quat_xyzw = self.data.sensor("orientation").data[[1, 2, 3, 0]].astype(np.float32)
        base_ang_vel = self.data.sensor("angular-velocity").data.astype(np.float32)
        projected_gravity = quat_rotate_inverse_np(quat_xyzw, np.array([0.0, 0.0, -1.0]))
        obs = np.zeros(self.cfg["env"]["num_observations"], np.float32)
        obs[0:3] = projected_gravity * n["gravity"]
        obs[3:6] = base_ang_vel * n["ang_vel"]
        obs[6] = commands[0] * n["lin_vel"]
        obs[7] = commands[1] * n["lin_vel"]
        obs[8] = commands[2] * n["ang_vel"]
        obs[9] = np.cos(2 * np.pi * self.gait_process) * (self.gait_frequency > 1.0e-8)
        obs[10] = np.sin(2 * np.pi * self.gait_process) * (self.gait_frequency > 1.0e-8)
        obs[11:23] = (dof_pos - self.default_dof_pos) * n["dof_pos"]
        obs[23:35] = dof_vel * n["dof_vel"]
        obs[35:47] = self.actions
        return obs

    def substep(self, commands):
        """One physics substep; policy runs every `decimation` substeps
        (play_mujoco.py:733-761)."""
        n = self.cfg["normalization"]
        dof_pos = self.data.qpos.astype(np.float32)[7:]
        dof_vel = self.data.qvel.astype(np.float32)[6:]
        if self.iteration % self.decimation == 0:
            obs = self.build_obs(commands)
            self.actions[:] = np.clip(
                self.policy(obs), -n["clip_actions"], n["clip_actions"])
            self.dof_targets[:] = (
                self.default_dof_pos
                + self.cfg["control"]["action_scale"] * self.actions)
        ctrl = np.clip(
            self.kp * (self.dof_targets - dof_pos) - self.kd * dof_vel,
            self.model.actuator_ctrlrange[:, 0],
            self.model.actuator_ctrlrange[:, 1],
        )
        self.data.ctrl[:] = ctrl
        self.mujoco.mj_step(self.model, self.data)
        self.gait_process = np.fmod(
            self.gait_process + self.model.opt.timestep * self.gait_frequency, 1.0)
        self.iteration += 1
        return ctrl

    def save_state(self):
        """Snapshot the full simulation state (play_mujoco.py:300-331)."""
        return {
            "qpos": self.data.qpos.copy(), "qvel": self.data.qvel.copy(),
            "actions": self.actions.copy(), "dof_targets": self.dof_targets.copy(),
            "gait_frequency": self.gait_frequency,
            "gait_process": self.gait_process, "iteration": self.iteration,
        }

    def restore_state(self, snap):
        self.data.qpos[:] = snap["qpos"]
        self.data.qvel[:] = snap["qvel"]
        self.mujoco.mj_forward(self.model, self.data)
        self.actions[:] = snap["actions"]
        self.dof_targets[:] = snap["dof_targets"]
        self.gait_frequency = snap["gait_frequency"]
        self.gait_process = snap["gait_process"]
        self.iteration = snap["iteration"]

    def run(self, seconds, commands=(0.0, 0.0, 0.0), gait_frequency=1.5):
        """Run closed-loop; returns a trajectory dict of stacked arrays."""
        self.gait_frequency = gait_frequency
        n_sub = int(seconds / self.model.opt.timestep)
        qpos, qvel, torques, actions = [], [], [], []
        for _ in range(n_sub):
            ctrl = self.substep(np.asarray(commands, np.float32))
            qpos.append(self.data.qpos.copy())
            qvel.append(self.data.qvel.copy())
            torques.append(ctrl.copy())
            actions.append(self.actions.copy())
        return {
            "qpos": np.asarray(qpos),
            "qvel": np.asarray(qvel),
            "torques": np.asarray(torques),
            "actions": np.asarray(actions),
        }
