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


def _categorize(quat_wxyz):
    """prone / supine / side / upright from the initial base orientation
    (projected gravity in the base frame)."""
    from booster_gym_tpu.math.quat import quat_rotate_inverse

    g = np.asarray(quat_rotate_inverse(
        jnp.asarray(quat_wxyz), jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0]), (quat_wxyz.shape[0], 3))))
    cats = np.full(len(g), "side", dtype=object)
    cats[np.abs(g[:, 0]) >= np.abs(g[:, 1])] = "pitch"
    # pitched forward (face-down) has gravity along -x in the base frame
    cats[(cats == "pitch") & (g[:, 0] < 0)] = "prone"
    cats[cats == "pitch"] = "supine"
    cats[g[:, 2] < -0.7] = "upright"
    return cats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="-1",
                    help="checkpoint path, -1 for newest, or a comma-"
                         "separated list (probed in one process — TPU "
                         "eager init is minutes, amortize it)")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--bank-seed", type=int, default=None,
                    help="rebuild the init bank from a FRESH seed "
                         "(held-out drops, not the training bank)")
    ap.add_argument("--out", default=None,
                    help="write a JSON summary (per-category success)")
    args = ap.parse_args()

    cfg = load_task_cfg("T1Standup")
    cfg["env"]["num_envs"] = args.envs
    cfg["noise"] = {}
    env = make_task(cfg)
    ppo = PPO(env, cfg)
    if args.bank_seed is not None:
        # held-out evaluation: fresh drop/settle seeds AND fresh reset
        # draws — nothing shared with the training bank's PRNG stream
        env_params = env.init_params(jax.random.PRNGKey(args.bank_seed))
        reset_key = jax.random.PRNGKey(args.bank_seed + 1)
    else:
        env_params, _ = ppo.init(jax.random.PRNGKey(0))
        reset_key = jax.random.PRNGKey(1)
    state0, obs0, info = env.reset_all(env_params, reset_key)
    cats = _categorize(np.asarray(state0.sim.root_quat))
    step = jax.jit(env.step)
    act_fn = jax.jit(ppo.act)
    n = int(args.seconds / env.dt)

    summaries = []
    for ck in args.ckpt.split(","):
        path = resolve_checkpoint(ck)
        print(f"loading {path}", flush=True)
        saved = load_checkpoint(path)
        params = saved["params"]
        state, obs = state0, obs0
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
        ok = (h > 0.55) & (u > 0.9)
        print(f"[{path}] standing at t={args.seconds}s: "
              f"{ok.mean()*100:.1f}% of {args.envs} envs", flush=True)
        per_cat = {}
        for c in ("prone", "supine", "side", "upright"):
            sel = cats == c
            if sel.sum():
                per_cat[c] = {"n": int(sel.sum()),
                              "success": int(ok[sel].sum())}
                print(f"  {c:8s}: {ok[sel].sum()}/{sel.sum()} "
                      f"({ok[sel].mean()*100:.1f}%)", flush=True)
        summaries.append({
            "ckpt": path, "envs": args.envs,
            "seconds": args.seconds, "bank_seed": args.bank_seed,
            "standing_rate": float(ok.mean()),
            "per_category": per_cat,
        })
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(summaries[-1] if len(summaries) == 1
                      else {"probes": summaries}, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
