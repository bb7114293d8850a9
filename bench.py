"""Benchmark: end-to-end PPO training throughput on the T1 task.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_per_chip", "value": N, "unit": "env-steps/s",
   "vs_baseline": N}

The metric is full-pipeline env-steps/sec/chip at 4096 envs (BASELINE.md
north star): each PPO iteration = horizon(24) x 4096 env-steps, where one
env-step = 10 physics substeps + obs/reward + its share of the 20-mini-epoch
update.  vs_baseline is relative to 100k env-steps/s, the assumed Isaac Gym
A100 throughput for this task (the reference publishes no number —
BASELINE.md documents the assumption; >= 0.625 here corresponds to the
"10x A100 aggregate on a 16-chip v5p" target).

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import jax

A100_BASELINE_ENV_STEPS_PER_SEC = 100_000.0


def main():
    from booster_gym_tpu.algo import PPO
    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.utils.config import load_task_cfg

    num_envs = 4096
    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = num_envs
    cfg["terrain"]["type"] = "plane"

    print(f"devices: {jax.devices()}", file=sys.stderr)
    env = make_task(cfg)
    ppo = PPO(env, cfg)

    t0 = time.time()
    # un-jitted: init runs once; jitting it costs a ~17 min cold compile of
    # the full reset path for zero steady-state benefit (VERDICT r1 weak #1)
    env_params, ts = ppo.init(jax.random.PRNGKey(0))
    jax.block_until_ready(ts.obs)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    n_dev = len(jax.devices())
    if n_dev > 1 and num_envs % n_dev == 0:
        from booster_gym_tpu.parallel import make_mesh, shard_batch_pytree

        mesh = make_mesh()
        env.set_mesh(mesh)
        env_params = shard_batch_pytree(mesh, env_params, num_envs)
        ts = shard_batch_pytree(mesh, ts, num_envs)
        print(f"data-parallel over {n_dev} devices", file=sys.stderr)

    step = jax.jit(ppo.train_iteration, donate_argnums=(1,))
    t0 = time.time()
    ts, metrics = step(env_params, ts)
    jax.block_until_ready(metrics)
    print(f"compile+first iter: {time.time() - t0:.1f}s", file=sys.stderr)

    warmup, iters = 3, 20
    for _ in range(warmup):
        ts, metrics = step(env_params, ts)
    jax.block_until_ready(metrics)
    t0 = time.time()
    for _ in range(iters):
        ts, metrics = step(env_params, ts)
    jax.block_until_ready(metrics)
    dt = time.time() - t0

    env_steps = iters * cfg["runner"]["horizon_length"] * num_envs
    steps_per_sec = env_steps / dt
    n_chips = max(1, len(jax.devices()))
    per_chip = steps_per_sec / n_chips
    print(
        f"{iters} iters in {dt:.2f}s -> {steps_per_sec:,.0f} env-steps/s "
        f"({per_chip:,.0f}/chip), sim-steps/s {steps_per_sec * 10:,.0f}, "
        f"reward={float(metrics['reward']):.3f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(per_chip / A100_BASELINE_ENV_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
