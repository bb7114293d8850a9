"""Control experiment for the standup artifact: drive OUR engine with the
DEPLOY wrapper (TorchScript module + StandupPolicy's 50-frame stack and
mirror averaging) instead of the raw flax actor.

Separates failure causes for the MuJoCo cross-check: if the wrapper stands
the robot up HERE (where the raw actor does), the export + wrapper
pipeline is correct and the MuJoCo gap is physics transfer; if not, the
bug is in export/stacking/mirroring.

Usage: python tools/standup_wrapper_probe.py [--model models/T1_standup.pt]
           [--envs 8] [--seconds 8] [--no-mirror]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/T1_standup.pt")
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--no-mirror", action="store_true")
    args = ap.parse_args()

    from booster_gym_tpu.deploy.policy import StandupPolicy

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "booster_gym_tpu/deploy/configs/T1.yaml")) as f:
        dcfg = yaml.safe_load(f)

    cfg = load_task_cfg("T1Standup")
    cfg["env"]["num_envs"] = args.envs
    cfg["noise"] = {}
    env = make_task(cfg)
    ppo = PPO(env, cfg)   # builds the env; policy unused
    env_params, ts = ppo.init(jax.random.PRNGKey(0))
    state, obs, info = env.reset_all(env_params, jax.random.PRNGKey(1))
    step = jax.jit(env.step)

    pols = []
    for _ in range(args.envs):
        p = StandupPolicy(dcfg, policy_path=args.model)
        if args.no_mirror:
            p.mirror_average = False
        pols.append(p)

    idx = env.action_indices
    default_sub = np.asarray(env.default_subset)
    scale = cfg["control"]["action_scale"]
    n = int(args.seconds / env.dt)
    for i in range(n):
        q = np.asarray(state.sim.q)
        qd = np.asarray(state.sim.qd)
        gyro = np.asarray(state.base_ang_vel)
        pg = np.asarray(state.projected_gravity)
        acts = np.zeros((args.envs, 12), np.float32)
        for e in range(args.envs):
            targets = pols[e].inference(i * env.dt, q[e], qd[e], gyro[e],
                                        pg[e])
            # invert the env's action->target map (standup._apply_actions)
            acts[e] = (targets[idx] - default_sub) / scale
        state, obs, rew, done, info = step(env_params, state,
                                           jnp.asarray(acts))
        # a reset env restarts from a fresh pose: re-arm its wrapper like
        # the Controller does on a mode entry (stale 50-frame history from
        # the previous episode would poison the policy)
        for e in np.nonzero(np.asarray(done))[0]:
            pols[e].first_inference = True
            pols[e].actions[:] = 0.0
        if (i + 1) % int(1.0 / env.dt) == 0:
            h = np.asarray(state.sim.root_pos[:, 2])
            u = -np.asarray(state.projected_gravity[:, 2])
            print(f"t={(i+1)*env.dt:4.1f}s h: med={np.median(h):.3f} "
                  f"max={h.max():.3f} | up med={np.median(u):.2f}",
                  flush=True)
    h = np.asarray(state.sim.root_pos[:, 2])
    u = -np.asarray(state.projected_gravity[:, 2])
    standing = ((h > 0.55) & (u > 0.9)).mean()
    print(f"wrapper-in-engine standing at t={args.seconds}s: "
          f"{standing*100:.0f}% of {args.envs} envs "
          f"({'mirror-averaged' if pols[0].mirror_average else 'no-mirror'})",
          flush=True)


if __name__ == "__main__":
    main()
