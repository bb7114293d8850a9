"""Trace-based attribution of the round-4 update kernels (wall-clock
micro-timings lie on the axon tunnel — every number here comes from the
xplane device timeline).

Traces, each to its own dir under /tmp/tr_u2/: gae kernel, grads_stats
baseline, grads_stats with ELU=identity (VPU transcendental attribution),
grads_stats at tile 6144/8192, full train_iteration.

Usage: python tools/prof_update2.py [--skip-iter]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax
import jax.numpy as jnp

import booster_gym_tpu.algo.update_kernel as uk
from booster_gym_tpu.algo.networks import ActorCritic, normal_log_prob

T, B = 24, 4096
NO, NP, NA = 47, 14, 12
BASE = "/tmp/tr_u2"


def make_data(seed=0):
    net = ActorCritic(NA, NO, NP, compute_dtype="bf16")
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    params = net.init(ks[0], jnp.zeros((1, NO)), jnp.zeros((1, NP)))
    obs = jax.random.normal(ks[1], (T, B, NO))
    priv = jax.random.normal(ks[2], (T, B, NP))
    act = 0.1 * jax.random.normal(ks[3], (T, B, NA))
    adv = jax.random.normal(ks[4], (T, B))
    ret = jax.random.normal(ks[5], (T, B))
    rew = jax.random.normal(ks[6], (T, B))
    done = jax.random.bernoulli(ks[7], 0.05, (T, B))
    lastv = jax.random.normal(ks[8], (B,))
    mu0, std0 = net.apply(params, obs, method=ActorCritic.act)
    old_logp = normal_log_prob(mu0, std0, act)
    return (params, obs, priv, act, adv, ret, old_logp, mu0, rew,
            (1.0 - done.astype(jnp.float32)), jnp.zeros((T, B)), lastv)


def traced(name, fn, *args, n=8):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    tdir = f"{BASE}/{name}"
    with jax.profiler.trace(tdir):
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out))
    print(f"traced {name} -> {tdir} (/{n})", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    (params, obs, priv, act, adv, ret, old_logp, mu0, rew, nonterm,
     timeout_f, lastv) = make_data()
    jax.block_until_ready(old_logp)

    def fused(tile=4096):
        return uk.FusedUpdate(NO, NP, NA, clip_ratio=0.2, bound_coef=10.0,
                              compute_dtype="bf16", tile=tile)

    f = fused()
    traced("gae_v2", functools.partial(f.gae, gamma=0.995, lam=0.95),
           params, obs, priv, rew, nonterm, timeout_f, lastv)
    mean = jnp.float32(0.0)
    rstd = jnp.float32(1.0)
    traced("grads_stats", f.grads_stats,
           params, obs, priv, act, adv, ret, old_logp, mu0, mean, rstd)

    orig_elu, orig_eg = uk._elu, uk._elu_grad
    uk._elu = lambda z: z
    uk._elu_grad = lambda z: jnp.ones_like(z)
    traced("grads_elu_id", fused().grads_stats,
           params, obs, priv, act, adv, ret, old_logp, mu0, mean, rstd)
    uk._elu, uk._elu_grad = orig_elu, orig_eg

    for tile in (6144, 8192):
        try:
            traced(f"grads_t{tile}", fused(tile).grads_stats,
                   params, obs, priv, act, adv, ret, old_logp, mu0, mean,
                   rstd)
        except Exception as e:  # noqa: BLE001
            print(f"tile {tile} failed: {type(e).__name__}: {e}", flush=True)

    if "--skip-iter" not in sys.argv:
        from booster_gym_tpu.algo import PPO
        from booster_gym_tpu.envs import make_task
        from booster_gym_tpu.utils.config import load_task_cfg
        import time

        cfg = load_task_cfg("T1")
        cfg["env"]["num_envs"] = B
        cfg["terrain"]["type"] = "plane"
        env = make_task(cfg)
        ppo = PPO(env, cfg)
        env_params, ts = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration, donate_argnums=(1,))
        ts, m = it(env_params, ts)
        jax.block_until_ready(m["reward"])
        for _ in range(3):
            ts, m = it(env_params, ts)
        jax.block_until_ready(m["reward"])
        t0 = time.time()
        for _ in range(20):
            ts, m = it(env_params, ts)
        jax.block_until_ready(m["reward"])
        ms = (time.time() - t0) / 20 * 1000
        print(f"train_iteration: {ms:.2f} ms -> {24*B/ms*1000:,.0f} "
              f"env-steps/s reward={float(m['reward']):.3f}", flush=True)
        tdir = f"{BASE}/iter"
        with jax.profiler.trace(tdir):
            for _ in range(3):
                ts, m = it(env_params, ts)
            jax.block_until_ready(m["reward"])
        print(f"traced iter -> {tdir} (/3)", flush=True)


if __name__ == "__main__":
    main()
