"""On-chip attribution of the fused-update kernel cost (round-4 perf work).

Times the grads/values kernels standalone at the 4096x24 training shape and
re-times grads with the ELU patched to identity, which splits the measured
time into MXU dots vs VPU transcendentals (the f32 exp in _elu/_elu_grad is
the prime suspect for the gap between 1.05 ms measured and ~0.34 ms of
padded-MXU roofline).  Optionally traces the full train iteration.

Usage: python tools/prof_update.py [--trace /tmp/trace_dir]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

import booster_gym_tpu.algo.update_kernel as uk
from booster_gym_tpu.algo.networks import ActorCritic, normal_log_prob

T, B = 24, 4096
NO, NP, NA = 47, 14, 12


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:36s}: {dt:7.3f} ms", flush=True)
    return dt


def make_data(seed=0):
    net = ActorCritic(NA, NO, NP, compute_dtype="bf16")
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    params = net.init(ks[0], jnp.zeros((1, NO)), jnp.zeros((1, NP)))
    obs = jax.random.normal(ks[1], (T, B, NO))
    priv = jax.random.normal(ks[2], (T, B, NP))
    act = 0.1 * jax.random.normal(ks[3], (T, B, NA))
    adv = jax.random.normal(ks[4], (T, B))
    ret = jax.random.normal(ks[5], (T, B))
    mu0, std0 = net.apply(params, obs, method=ActorCritic.act)
    old_logp = normal_log_prob(mu0, std0, act)
    return params, obs, priv, act, adv, ret, old_logp


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    params, obs, priv, act, adv, ret, old_logp = make_data()
    jax.block_until_ready(old_logp)
    print(f"data ready {time.time()-t0:.0f}s", flush=True)

    fused = uk.FusedUpdate(NO, NP, NA, clip_ratio=0.2, bound_coef=10.0,
                           compute_dtype="bf16", tile=4096)
    g = jax.jit(fused.grads)
    v = jax.jit(fused.values)
    timeit("values (baseline)", v, params, obs, priv)
    timeit("grads (baseline)", g, params, obs, priv, act, adv, ret, old_logp)

    # --- ELU -> identity: attribute VPU transcendental cost
    orig_elu, orig_eg = uk._elu, uk._elu_grad
    uk._elu = lambda z: z
    uk._elu_grad = lambda z: jnp.ones_like(z)
    fused2 = uk.FusedUpdate(NO, NP, NA, clip_ratio=0.2, bound_coef=10.0,
                            compute_dtype="bf16", tile=4096)
    timeit("grads (ELU=identity)", jax.jit(fused2.grads),
           params, obs, priv, act, adv, ret, old_logp)
    timeit("values (ELU=identity)", jax.jit(fused2.values), params, obs, priv)
    uk._elu, uk._elu_grad = orig_elu, orig_eg

    # --- tile sweep (pipeline depth vs VMEM residency)
    for tile in (1024, 2048, 8192):
        f3 = uk.FusedUpdate(NO, NP, NA, clip_ratio=0.2, bound_coef=10.0,
                            compute_dtype="bf16", tile=tile)
        try:
            timeit(f"grads (tile={tile})", jax.jit(f3.grads),
                   params, obs, priv, act, adv, ret, old_logp)
        except Exception as e:
            print(f"grads (tile={tile}): FAILED {type(e).__name__}", flush=True)

    if "--trace" in sys.argv:
        tdir = sys.argv[sys.argv.index("--trace") + 1]
        gk = jax.jit(fused.grads)
        gk(params, obs, priv, act, adv, ret, old_logp)
        with jax.profiler.trace(tdir):
            for _ in range(5):
                out = gk(params, obs, priv, act, adv, ret, old_logp)
            jax.block_until_ready(jax.tree.leaves(out))
        print("trace written:", tdir, flush=True)


if __name__ == "__main__":
    main()
