"""A/B the two remaining env-semantics divergences (envs/t1.py docstring).

Trains short flat-terrain runs for each arm and records reward trajectories:

  base       — shipped semantics (Bernoulli still, consistent curriculum)
  still      — reference-exact still selection (exact fraction of resampled)
  curriculum — reference curriculum transpose quirk (curriculum on)

Intended for one TPU chip (each 1k-iter arm is ~1 min at 4096 envs); also
runs on CPU at reduced scale.  Results append to
benchmarks/ab_divergence.jsonl for IMPLEMENTATION_NOTES.

Usage: python tools/ab_divergence.py [--iters 1000] [--num_envs 4096]
"""

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg


def run_arm(name, cfg, iters, seed):
    env = make_task(cfg)
    ppo = PPO(env, cfg)
    env_params, ts = ppo.init(jax.random.PRNGKey(seed))
    step = jax.jit(ppo.train_iteration, donate_argnums=(1,))
    t0 = time.time()
    rewards = []
    for i in range(iters):
        ts, m = step(env_params, ts)
        rewards.append(m["reward"])
        if (i + 1) % max(1, iters // 10) == 0:
            r = float(jax.device_get(m["reward"]))
            print(f"[{name}] it {i + 1}/{iters} reward={r:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    r = np.asarray(jax.device_get(rewards), np.float64)
    return {
        "arm": name, "seed": seed, "iters": iters,
        "reward_mean_last10pct": float(r[-max(1, iters // 10):].mean()),
        "reward_curve_every50": [round(float(v), 4) for v in r[::50]],
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--out", default="benchmarks/ab_divergence.jsonl")
    args = ap.parse_args()

    base = load_task_cfg("T1")
    base["env"]["num_envs"] = args.num_envs
    base["terrain"]["type"] = "plane"

    arms = {}
    arms["base"] = base
    still = copy.deepcopy(base)
    still["commands"]["still_mode"] = "exact_fraction"
    arms["still_exact"] = still
    curr_base = copy.deepcopy(base)
    curr_base["commands"]["curriculum"] = True
    arms["curriculum_base"] = curr_base
    curr_quirk = copy.deepcopy(curr_base)
    curr_quirk["commands"]["curriculum_transpose_quirk"] = True
    arms["curriculum_quirk"] = curr_quirk

    results = []
    for seed in args.seeds:
        for name, cfg in arms.items():
            res = run_arm(name, cfg, args.iters, seed)
            results.append(res)
            with open(args.out, "a") as f:
                f.write(json.dumps(res) + "\n")
            print(json.dumps(res), flush=True)

    print("\nsummary (reward mean over last 10% of iters):")
    for name in arms:
        vals = [r["reward_mean_last10pct"] for r in results if r["arm"] == name]
        print(f"  {name}: {np.mean(vals):.3f} +- {np.std(vals):.3f}")


if __name__ == "__main__":
    main()
