"""Live viewer for the TPU-native engine.

The reference's interactive viewer is PhysX-side (reference:
envs/base_task.py:81-94); here the equivalent mirrors our engine's state
into a passive MuJoCo viewer each control step — the visualization is
MuJoCo, the physics is ours.

Usage: python tools/view.py --task=T1 [--checkpoint=-1 | --policy_pt=...]
       [--vx 0.4] (requires a display / GL backend)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default="T1")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--policy_pt", default=None)
    parser.add_argument("--vx", type=float, default=0.4)
    parser.add_argument("--vy", type=float, default=0.0)
    parser.add_argument("--vyaw", type=float, default=0.0)
    parser.add_argument("--env", type=int, default=0, help="env index to view")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import mujoco
    import mujoco.viewer

    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.envs.t1 import _resolve_asset
    from booster_gym_tpu.utils.config import load_task_cfg

    cfg = load_task_cfg(args.task)
    cfg["env"]["num_envs"] = 1
    cfg["terrain"]["type"] = "plane"
    env = make_task(cfg)
    params = jax.jit(env.init_params)(jax.random.PRNGKey(0))
    state, obs, _ = jax.jit(env.reset_all)(params, jax.random.PRNGKey(1))
    state = state.replace(
        commands=jnp.asarray([[args.vx, args.vy, args.vyaw]], jnp.float32),
        gait_frequency=jnp.full((1,), 1.5),
        cmd_resample_time=jnp.full((1,), 10 ** 9, jnp.int32))
    step = jax.jit(env.step)

    if args.policy_pt:
        from booster_gym_tpu.eval.mujoco_eval import torchscript_policy

        pol = torchscript_policy(args.policy_pt)
        policy = lambda o: jnp.asarray(pol(np.asarray(o[0]))[None])
    elif args.checkpoint:
        from booster_gym_tpu.algo import PPO
        from booster_gym_tpu.utils.recorder import load_checkpoint, resolve_checkpoint

        ppo = PPO(env, cfg)
        saved = load_checkpoint(resolve_checkpoint(args.checkpoint))
        act = jax.jit(lambda o: ppo.act(saved["params"], o)[0])
        policy = act
    else:
        policy = lambda o: jnp.zeros((1, 12))

    mj = mujoco.MjModel.from_xml_path(_resolve_asset(cfg["asset"]["mujoco_file"]))
    data = mujoco.MjData(mj)
    i = args.env
    with mujoco.viewer.launch_passive(mj, data) as viewer:
        while viewer.is_running():
            state, obs, rew, done, info = step(params, state, policy(obs))
            data.qpos[0:3] = np.asarray(state.sim.root_pos[i])
            data.qpos[3:7] = np.asarray(state.sim.root_quat[i])
            data.qpos[7:] = np.asarray(state.sim.q[i])
            mujoco.mj_forward(mj, data)
            viewer.cam.lookat[:] = data.qpos[:3]
            viewer.sync()


if __name__ == "__main__":
    main()
