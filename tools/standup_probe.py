"""Trajectory probe for a standup checkpoint: roll the deterministic
policy in the training env and print the height/uprightness envelope over
the episode — the fast diagnostic between training rounds (is the policy
rising-then-falling, or never trying?).

Usage: python tools/standup_probe.py [--ckpt -1] [--envs 64] [--seconds 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg
from booster_gym_tpu.utils.recorder import load_checkpoint, resolve_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="-1")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    cfg = load_task_cfg("T1Standup")
    cfg["env"]["num_envs"] = args.envs
    cfg["noise"] = {}
    env = make_task(cfg)
    ppo = PPO(env, cfg)
    env_params, ts = ppo.init(jax.random.PRNGKey(0))
    path = resolve_checkpoint(args.ckpt)
    print(f"loading {path}", flush=True)
    saved = load_checkpoint(path)
    params = saved["params"]

    state, obs, info = env.reset_all(env_params, jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    act_fn = jax.jit(ppo.act)
    n = int(args.seconds / env.dt)
    heights, upz = [], []
    for i in range(n):
        mu, _ = act_fn(params, obs)
        state, obs, rew, done, info = step(env_params, state, mu)
        if (i + 1) % int(1.0 / env.dt) == 0:
            h = np.asarray(state.sim.root_pos[:, 2])
            u = -np.asarray(state.projected_gravity[:, 2])
            heights.append(h)
            upz.append(u)
            print(f"t={(i+1)*env.dt:4.1f}s  h: p25={np.percentile(h,25):.3f} "
                  f"med={np.median(h):.3f} p75={np.percentile(h,75):.3f} "
                  f"max={h.max():.3f} | up: med={np.median(u):.2f} "
                  f"p90={np.percentile(u,90):.2f}", flush=True)
    h = heights[-1]
    u = upz[-1]
    standing = ((h > 0.55) & (u > 0.9)).mean()
    print(f"standing at t={args.seconds}s: {standing*100:.1f}% of {args.envs} "
          f"envs", flush=True)


if __name__ == "__main__":
    main()
