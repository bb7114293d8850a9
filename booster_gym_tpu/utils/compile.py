"""CPU-safe compilation of the physics kernel programs.

XLA:CPU's fusion pass is pathological on the Pallas kernel body (a ~40k-op
straight-line program of [8, 128]-tile arithmetic with deep reuse —
FK -> CRBA -> Cholesky -> contact sweeps): producer duplication during
fusion makes compile time/memory explode (the T1-scale body OOMs a 125 GB
box) and the emitted fused kernel can effectively never finish executing.
With the fusion passes disabled the same program compiles in seconds
(toy) to minutes (T1) and executes in milliseconds — for CPU validation
runs (tests, the multi-chip dryrun) fusion buys nothing anyway.

``jit_nofusion`` is therefore the CPU-side entry point for compiling any
program that inlines the kernel body (interpret or emulated execution).
On TPU it is a plain ``jax.jit`` — Mosaic compiles the real kernel and
XLA:TPU fuses fine.
"""

import jax

_CPU_COMPILER_OPTIONS = {"xla_disable_hlo_passes": "cpu-fusion,fusion"}


def jit_nofusion(fn, static_argnums=()):
    """jax.jit(fn), but compiled with XLA:CPU's fusion passes disabled
    (per-shape compile cache, like jit).  No-op wrapper on TPU."""
    jfn = jax.jit(fn, static_argnums=static_argnums)
    if jax.default_backend() != "cpu":
        return jfn
    cache = {}

    def _leaf_key(x):
        # arrays key on shape/dtype; anything else (e.g. a value passed
        # through static_argnums) keys on its VALUE — two calls differing
        # only in a static int must not share a compiled executable
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return (tuple(x.shape), str(x.dtype))
        return repr(x)

    def call(*args):
        key = str(jax.tree.map(_leaf_key, args))
        if key not in cache:
            cache[key] = jfn.lower(*args).compile(
                compiler_options=_CPU_COMPILER_OPTIONS)
        return cache[key](*args)

    return call
