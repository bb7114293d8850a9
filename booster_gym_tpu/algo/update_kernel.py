"""Fused PPO update as Pallas TPU kernels.

The XLA formulation of the 20 full-batch mini-epochs (ppo.py `epoch`) is
HBM-bandwidth bound: every epoch round-trips ~0.5 GB of hidden activations
([T*B, 256]-shaped layers, stored by autodiff between forward and backward),
which profiling pins at ~35 ms of the 56 ms iteration at 4096 envs — 2x the
bandwidth floor and ~7x the FLOP cost.  These kernels keep all activations
in VMEM: the batch streams through in row tiles, each tile runs actor+critic
forward, the per-sample loss gradient, and the full backward pass in one
kernel body, and the (tiny, ~0.7 MB) weight gradients accumulate in VMEM
across the grid.  HBM traffic per epoch drops to one read of the rollout
buffers (~25 MB) — the update becomes MXU-bound.

The hot path (round 4) is TWO kernels per mini-epoch, both batch-on-lanes
(activations [features, batch] so per-sample scalars are [1, batch] and use
every VPU lane; the row-major orientation wasted ~320 us/epoch on 1-of-128-
lane ops):
  * `gae`: one reverse walk over the horizon — grid step = time step —
    computing critic values, the timeout bootstrap, the GAE recurrence
    (carried in VMEM scratch), returns, and masked advantage sums for the
    Bessel normalization (reference: utils/utils.py:33-44,
    utils/runner.py:135);
  * `grads_stats`: actor+critic forward (recomputed — remat is free, the
    FLOPs are cheap relative to the saved activation traffic), in-kernel
    advantage normalization, per-sample dL/dmu and dL/dvalue for the
    clipped-surrogate + value + bound losses (reference loss layout:
    utils/runner.py:131-164), backward through both MLPs, plus f32
    accumulators for the reference metric sums (value/actor/bound losses
    and the KL quadratic term) — ppo.py finishes the exact reference
    formulas from the sums.
The row-major `values`/`grads` kernels are kept as the interpret-mode
exactness anchors (tests compare the two orientations and jax.grad).

Gradient semantics matched to jax.grad of the XLA path:
  * jnp.maximum(surr, surr_clipped): 0.5/0.5 split at exact ties (the
    common in-clip case where both branches are equal is still correct:
    the subgradients coincide there);
  * jnp.clip(ratio, lo, hi) == min(max(x, lo), hi): gradient 1 strictly
    inside, 0.5 at either boundary, 0 outside;
  * bf16 compute mode mirrors flax Dense(dtype=bf16, param_dtype=f32):
    inputs/weights cast to bf16, MXU dot with f32 accumulation, result
    rounded to bf16 before the bias add; weight gradients accumulate f32.
  * the entropy bonus depends only on logstd: its closed-form gradient
    (entropy_coef per dim) is added by the caller, not the kernel.

Batch rows flatten [T, B, d] -> [T*B, d] and pad to the tile size; padded
rows are masked out of every gradient and both outputs are sliced back.
Under a device mesh the kernels run per-device inside shard_map (pallas is
not GSPMD-partitionable) with a psum over the weight gradients — the /N
loss-mean scaling uses the GLOBAL row count so the psum'd gradient equals
the single-device full-batch gradient exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2PI = float(np.log(2.0 * np.pi))


def _elu(z):
    # computed in f32 and rounded back: Mosaic has no expm1 lowering and
    # v5e has no native bf16 compare; one f32 exp + select costs ≤1 bf16
    # ulp vs flax's all-bf16 elu (covered by the bf16 test tolerance)
    zf = z.astype(jnp.float32)
    return jnp.where(zf > 0, zf, jnp.exp(zf) - 1.0).astype(z.dtype)


def _elu_grad(z):
    zf = z.astype(jnp.float32)
    return jnp.where(zf > 0, 1.0, jnp.exp(zf)).astype(z.dtype)


def _precision(dt):
    # the package forces jax_default_matmul_precision=highest globally (TPU
    # f32 correctness); Mosaic rejects fp32 contract precision on bf16
    # operands — bf16 MXU dots are single-pass by construction
    return (jax.lax.Precision.DEFAULT if dt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _mlp_fwd(x, Ws, bs, dt):
    """Forward through Dense+ELU stack in compute dtype `dt`; returns the
    pre-activations (for the backward's ELU derivative) and layer inputs."""
    xs, zs = [x], []
    for i, (W, b) in enumerate(zip(Ws, bs)):
        z = jax.lax.dot_general(
            x, W[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(dt)).astype(dt) + b[...]
        zs.append(z)
        if i < len(Ws) - 1:
            x = _elu(z)
            xs.append(x)
    return xs, zs


def _mlp_bwd(xs, zs, Ws, dz_last, dW_refs, db_refs, first):
    """Backward through the stack; accumulates f32 weight/bias grads into
    the output refs (zero-initialised on the first grid step).  No input
    gradient is formed — observations are constants."""
    dz = dz_last
    for i in range(len(Ws) - 1, -1, -1):
        dW = jax.lax.dot_general(
            xs[i], dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_precision(dz.dtype))
        db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(first)
        def _init():
            dW_refs[i][...] = jnp.zeros_like(dW_refs[i])
            db_refs[i][...] = jnp.zeros_like(db_refs[i])

        dW_refs[i][...] += dW
        db_refs[i][...] += db
        if i > 0:
            dh = jax.lax.dot_general(
                dz, Ws[i][...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision(dz.dtype)).astype(dz.dtype)
            dz = dh * _elu_grad(zs[i - 1])


def _values_kernel(obsc_ref, *wrefs, val_ref, n_layers, dt):
    Ws = wrefs[0:n_layers]
    bs = wrefs[n_layers:2 * n_layers]
    x = obsc_ref[...].astype(dt)
    _, zs = _mlp_fwd(x, Ws, bs, dt)
    val_ref[...] = zs[-1].astype(jnp.float32)


def _grads_kernel(scal_ref, obs_ref, obsc_ref, act_ref, logstd_ref, *refs,
                  nA, nC, tile, n_valid, n_total, clip_ratio, bound_coef, dt):
    """One row tile: fwd both MLPs, per-sample loss grads, bwd both MLPs."""
    aW = refs[0:nA]
    ab = refs[nA:2 * nA]
    cW = refs[2 * nA:2 * nA + nC]
    cb = refs[2 * nA + nC:2 * nA + 2 * nC]
    out = refs[2 * nA + 2 * nC:]
    daW = out[0:nA]
    dab = out[nA:2 * nA]
    dcW = out[2 * nA:2 * nA + nC]
    dcb = out[2 * nA + nC:2 * nA + 2 * nC]
    dlogstd_ref, mu_ref, val_ref = out[2 * nA + 2 * nC:]

    i = pl.program_id(0)
    first = i == 0
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + i * tile
    mask = (row < n_valid).astype(jnp.float32)

    # ---- forward (compute dtype mirrors flax Dense(dtype=dt))
    xa, za = _mlp_fwd(obs_ref[...].astype(dt), aW, ab, dt)
    mu = za[-1].astype(jnp.float32)                    # [tile, num_act]
    xc, zc = _mlp_fwd(obsc_ref[...].astype(dt), cW, cb, dt)
    val = zc[-1].astype(jnp.float32)                   # [tile, 1]
    # mu/val leave the kernel in the compute dtype: in bf16 mode the final
    # dense output is bf16-rounded anyway, so this is information-lossless
    # — and it keeps the result buffers below XLA's scoped-VMEM promotion
    # budget (f32 outputs at 98304 rows OOM'd the vmem stack)
    mu_ref[...] = mu.astype(dt)
    val_ref[...] = val.astype(dt)

    # ---- per-sample loss gradients (all f32 VPU math)
    adv = scal_ref[:, 0:1]
    ret = scal_ref[:, 1:2]
    old_logp = scal_ref[:, 2:3]
    act = act_ref[...]
    logstd = logstd_ref[...]                           # [1, num_act]
    var = jnp.exp(2.0 * logstd)

    diff = act - mu
    lp = -0.5 * diff * diff / var - logstd - 0.5 * _LOG2PI
    logp = jnp.sum(lp, axis=1, keepdims=True)
    ratio = jnp.exp(logp - old_logp)
    lo, hi = 1.0 - clip_ratio, 1.0 + clip_ratio
    ratio_c = jnp.clip(ratio, lo, hi)
    surr = -adv * ratio
    surr_c = -adv * ratio_c
    # d max(s, sc)/ds: 1 where s > sc, 0.5 at ties (jnp.maximum semantics)
    gs = jnp.where(surr > surr_c, 1.0, jnp.where(surr < surr_c, 0.0, 0.5))
    # d clip(r)/dr: min(max(r, lo), hi) — 0.5 at either exact boundary
    cg = (jnp.where(ratio > lo, 1.0, jnp.where(ratio == lo, 0.5, 0.0))
          * jnp.where(ratio < hi, 1.0, jnp.where(ratio == hi, 0.5, 0.0)))
    dratio = (gs + (1.0 - gs) * cg) * (-adv) * (mask / n_total)
    dlogp = dratio * ratio
    dmu = dlogp * diff / var
    dlogstd_rows = dlogp * (diff * diff / var - 1.0)
    # bound loss: mean over N*num_act of relu(mu-1)^2 + min(mu+1, 0)^2
    dmu += ((2.0 * jnp.maximum(mu - 1.0, 0.0) + 2.0 * jnp.minimum(mu + 1.0, 0.0))
            * (bound_coef / (n_total * mu.shape[1])) * mask)
    dval = 2.0 * (val - ret) * (mask / n_total)

    @pl.when(first)
    def _init():
        dlogstd_ref[...] = jnp.zeros_like(dlogstd_ref)

    dlogstd_ref[...] += jnp.sum(dlogstd_rows, axis=0, keepdims=True)

    # ---- backward through both MLPs, accumulating weight grads
    _mlp_bwd(xa, za, aW, dmu.astype(dt), daW, dab, first)
    _mlp_bwd(xc, zc, cW, dval.astype(dt), dcW, dcb, first)


def _row_spec(tile, d):
    return pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _fixed_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _gae_kernel(obsc_ref, rew_ref, nonterm_ref, timeout_ref,
                *wrefs_and_out, n_layers, T, Bp, n_valid_b, gamma, lam, dt,
                interp):
    """One grid step = one TIME step, walked in reverse over T+1 steps:
    step 0 is the BOOTSTRAP step (the last observation — the critic forward
    that was previously a separate per-epoch flax est_value in ppo.py, ~20
    extra XLA ops per iteration), steps 1..T are the rollout steps t = T-i.
    Critic forward for values_t, timeout bootstrap, and the GAE recurrence
    ride along in VMEM carries — values never touch HBM and the reverse
    scan costs a handful of VPU ops per step (reference recurrence:
    utils/utils.py:33-44; timeout bootstrap utils/runner.py:135; the
    bootstrap value is the CURRENT critic at the last obs,
    utils/runner.py:133-135 recomputes it each mini-epoch — so does this).

    The critic runs TRANSPOSED (batch on the lane axis): observations
    arrive as [dim, Bp] planes (T+1 of them, the last row = last obs) and
    every layer computes W_T @ x with [out, in] weights, so values are born
    [1, Bp] — the same orientation as the GAE planes.  The row-major
    variant paid a [Bp,1]->[1,Bp] relayout per step (~25 us x T on v5e)
    just to meet the recurrence.

    Outputs: raw advantages [T,1,Bp], returns [T,1,Bp], and the masked
    sums (sum_adv, sum_adv^2) as (1, 1) refs for the caller's Bessel
    normalization (the normalize itself happens inside the grads kernel)."""
    Ws = wrefs_and_out[0:n_layers]           # transposed: [out, in]
    bs = wrefs_and_out[n_layers:2 * n_layers]  # [out, 1]
    adv_ref, ret_ref, sa_ref, sa2_ref = (
        wrefs_and_out[2 * n_layers:2 * n_layers + 4])
    nextv_ref, carry_ref = wrefs_and_out[2 * n_layers + 4:]

    i = pl.program_id(0)
    first = i == 0            # the bootstrap step (obs_last)

    x = obsc_ref[0].astype(dt)               # [dim, Bp]
    for li in range(n_layers):
        z = _dot_T(Ws[li][...], x, ((1,), (0,)), dt,
                   interp).astype(dt) + bs[li][...]
        x = _elu(z) if li < n_layers - 1 else z
    values = x.astype(jnp.float32)            # [1, Bp]

    @pl.when(first)
    def _init():
        nextv_ref[...] = values               # bootstrap last_values
        carry_ref[...] = jnp.zeros_like(carry_ref)
        sa_ref[...] = jnp.zeros_like(sa_ref)
        sa2_ref[...] = jnp.zeros_like(sa2_ref)

    @pl.when(jnp.logical_not(first))
    def _gae_step():
        # the [T, B] per-step planes arrive as [T, 1, B] so Mosaic's block
        # constraint (trailing dims divisible by (8, 128) or whole) is met;
        # ref[0] yields the (1, Bp) plane.  Their index map parks step 0 on
        # row T-1 (a dummy read; nothing is written there until step 1
        # rewrites the same block).
        t_f = timeout_ref[0]                                  # {0,1} f32
        rwd = t_f * values + (1.0 - t_f) * rew_ref[0]
        nt = nonterm_ref[0]
        delta = rwd + gamma * nt * nextv_ref[...] - values
        adv = delta + gamma * lam * nt * carry_ref[...]
        carry_ref[...] = adv
        nextv_ref[...] = values
        adv_ref[0] = adv
        ret_ref[0] = values + adv

        mask = (jax.lax.broadcasted_iota(jnp.int32, (1, Bp), 1)
                < n_valid_b).astype(jnp.float32)
        am = adv * mask
        sa_ref[...] += jnp.sum(am).reshape(1, 1)
        sa2_ref[...] += jnp.sum(am * adv).reshape(1, 1)


def _dot_T(a, b, dims, dt, interp):
    """dot_general in the kernel compute dtype; in interpret mode (CPU
    validation) bf16 operands upcast to f32 first — XLA:CPU's DotThunk
    has no BF16xBF16=F32 kernel for these transposed shapes.  The result
    still rounds back to bf16, so interpret-mode numerics stay within the
    bf16 test tolerances."""
    if interp and dt == jnp.bfloat16:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=_precision(dt))


def _mlp_fwd_T(x, WTs, bs, dt, interp=False):
    """Transposed Dense+ELU stack: x [in, n], weights [out, in], biases
    [out, 1] -> activations [out, n].  Same math as _mlp_fwd with the
    batch on the LANE axis."""
    xs, zs = [x], []
    for i, (WT, b) in enumerate(zip(WTs, bs)):
        z = _dot_T(WT[...], x, ((1,), (0,)), dt, interp).astype(dt) + b[...]
        zs.append(z)
        if i < len(WTs) - 1:
            x = _elu(z)
            xs.append(x)
    return xs, zs


def _mlp_bwd_T(xs, zs, WTs, dz_last, dW_refs, db_refs, first, interp=False):
    """Transposed backward: activations/deltas are [dim, n]; WTs are the
    SAME transposed [out, in] weights the forward uses (the input-gradient
    product contracts both operands on their out axis — round-5 change: the
    original-orientation duplicates are gone, halving the weight staging);
    weight gradients come out [in, out] directly (contraction over the
    lane axis), so no transposes are needed anywhere.

    The dW dots contract BOTH operands on the lane axis — Mosaic's bf16
    lowering of that shape trips a verifier bug ('vector.broadcast' bf16 ->
    f32), so in bf16 mode the operands are cast to f32 and the dot runs at
    DEFAULT precision: on TPU that is a single bf16 MXU pass with f32
    accumulation, bit-identical to the bf16 dot (the values are already
    bf16-rounded; the casts are exact and cost ~3 us/grid-step of VPU)."""
    dz = dz_last                                   # [out, n]
    bf16 = dz_last.dtype == jnp.bfloat16
    dw_prec = (jax.lax.Precision.DEFAULT if bf16
               else jax.lax.Precision.HIGHEST)
    for i in range(len(WTs) - 1, -1, -1):
        dW = jax.lax.dot_general(
            xs[i].astype(jnp.float32), dz.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dw_prec)
        db = jnp.sum(dz.astype(jnp.float32), axis=1, keepdims=True)

        @pl.when(first)
        def _init():
            dW_refs[i][...] = jnp.zeros_like(dW_refs[i])
            db_refs[i][...] = jnp.zeros_like(db_refs[i])

        dW_refs[i][...] += dW
        db_refs[i][...] += db
        if i > 0:
            # dL/dx = W @ dz = sum_out WT[out, in] dz[out, n] -> [in, n]
            dh = _dot_T(WTs[i][...], dz, ((0,), (0,)), dz.dtype,
                        interp).astype(dz.dtype)
            dz = dh * _elu_grad(zs[i - 1])


def _policy_logp_kernel(obs_ref, act_ref, logstd_ref, *refs,
                        nA, dt, interp):
    """Actor forward + log-prob through the EXACT code path of
    _grads_stats_kernel's forward.  Run once per iteration at the rollout
    parameters, its outputs replace the rollout's flax-computed mu/old_logp
    in the update: in bf16 the two forward paths differ by ~1 ulp of mu,
    which inflates epoch-0 importance ratios by several percent and — via
    the (mu_new - mu_old)^2 term — puts a constant ~1e-3 floor under the
    KL estimate that biases the adaptive LR low.  Measured cost of that
    inconsistency: flat-terrain reward 54.6 vs 66.7 at 5k iterations."""
    aWT = refs[0:nA]
    ab = refs[nA:2 * nA]
    mu_ref, logp_ref = refs[2 * nA:]
    _, za = _mlp_fwd_T(obs_ref[...].astype(dt), aWT, ab, dt, interp)
    mu = za[-1].astype(jnp.float32)
    logstd = logstd_ref[...]
    var = jnp.exp(2.0 * logstd)
    diff = act_ref[...] - mu
    lp = -0.5 * diff * diff / var - logstd - 0.5 * _LOG2PI
    mu_ref[...] = mu
    logp_ref[...] = jnp.sum(lp, axis=0, keepdims=True)


def _grads_stats_kernel(scal_ref, norm_ref, muold_ref, obs_ref, obsc_ref,
                        act_ref, logstd_ref, *refs,
                        nA, nC, tile, n_valid, n_total, clip_ratio,
                        bound_coef, dt, interp):
    """The batch-on-lanes gradient+metric kernel.

    Everything here is TRANSPOSED relative to _grads_kernel: observations
    stream as [dim, tile] column blocks, activations are [features, tile],
    and per-sample scalars are [1, tile].  In the row-major orientation the
    per-sample loss chain ([tile, 1] shapes) used 1 of 128 lanes and the
    [tile, num_act] terms 12 of 128 — ~320 us/epoch of VPU time at 4096
    envs; lane-major the same math is dense (~25 us).  The advantage
    normalization happens in-kernel ((adv_raw - mean) * rstd, norm_ref
    [1, 2]) and the reference metric sums accumulate in f32 refs, finished
    by the exact reference formulas in the caller (utils/runner.py:131-164
    losses and statistics).

    Ref layout: per-layer weights arrive ONCE, transposed [out, in] —
    both the forward dots and the backward input-gradient dots contract
    on them directly (see _mlp_bwd_T)."""
    aWT = refs[0:nA]
    ab = refs[nA:2 * nA]
    cWT = refs[2 * nA:2 * nA + nC]
    cb = refs[2 * nA + nC:2 * nA + 2 * nC]
    out = refs[2 * nA + 2 * nC:]
    daW = out[0:nA]
    dab = out[nA:2 * nA]
    dcW = out[2 * nA:2 * nA + nC]
    dcb = out[2 * nA + nC:2 * nA + 2 * nC]
    (dlogstd_ref, vl_ref, al_ref, bhi_ref, blo_ref,
     klsq_ref, mu_ref, logp_ref) = out[2 * nA + 2 * nC:]

    i = pl.program_id(0)
    first = i == 0
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + i * tile
    mask = (col < n_valid).astype(jnp.float32)          # [1, tile]

    xa, za = _mlp_fwd_T(obs_ref[...].astype(dt), aWT, ab, dt, interp)
    mu = za[-1].astype(jnp.float32)                     # [num_act, tile]
    xc, zc = _mlp_fwd_T(obsc_ref[...].astype(dt), cWT, cb, dt, interp)
    val = zc[-1].astype(jnp.float32)                    # [1, tile]

    adv = (scal_ref[0:1, :] - norm_ref[0, 0]) * norm_ref[0, 1]
    ret = scal_ref[1:2, :]
    act = act_ref[...]                                  # [num_act, tile]
    logstd = logstd_ref[...]                            # [num_act, 1]
    var = jnp.exp(2.0 * logstd)

    diff = act - mu
    lp = -0.5 * diff * diff / var - logstd - 0.5 * _LOG2PI
    logp = jnp.sum(lp, axis=0, keepdims=True)           # [1, tile]
    # self_old (norm[0,2]=1, the first mini-epoch): the OLD policy's
    # logp/mu are THIS kernel's own forward at these (rollout) params —
    # exp(logp-logp)=1 and mu-mu=0 bitwise, at ANY geometry.  Two
    # separately compiled forwards (flax rollout, or even a dedicated
    # pre-pass kernel) can disagree by bf16 rounding, and when the
    # learned sigma is small that noise dominates the importance ratios
    # and the KL estimate (observed: kl 7.2 vs 0.15 on the standup task,
    # sigma~0.02, 420-dim obs).  The caller carries these outputs as the
    # old policy for the remaining mini-epochs.
    self_old = norm_ref[0, 2]
    old_logp = (self_old * logp
                + (1.0 - self_old) * scal_ref[2:3, :])
    muold = self_old * mu + (1.0 - self_old) * muold_ref[...]
    mu_ref[...] = mu
    logp_ref[...] = logp
    ratio = jnp.exp(logp - old_logp)
    lo, hi = 1.0 - clip_ratio, 1.0 + clip_ratio
    ratio_c = jnp.clip(ratio, lo, hi)
    surr = -adv * ratio
    surr_c = -adv * ratio_c
    gs = jnp.where(surr > surr_c, 1.0, jnp.where(surr < surr_c, 0.0, 0.5))
    cg = (jnp.where(ratio > lo, 1.0, jnp.where(ratio == lo, 0.5, 0.0))
          * jnp.where(ratio < hi, 1.0, jnp.where(ratio == hi, 0.5, 0.0)))
    dratio = (gs + (1.0 - gs) * cg) * (-adv) * (mask / n_total)
    dlogp = dratio * ratio                              # [1, tile]
    dmu = dlogp * diff / var                            # [num_act, tile]
    dlogstd_rows = dlogp * (diff * diff / var - 1.0)
    b_hi = jnp.maximum(mu - 1.0, 0.0)
    b_lo = jnp.minimum(mu + 1.0, 0.0)
    dmu += ((2.0 * b_hi + 2.0 * b_lo)
            * (bound_coef / (n_total * mu.shape[0])) * mask)
    dval = 2.0 * (val - ret) * (mask / n_total)         # [1, tile]

    @pl.when(first)
    def _init():
        dlogstd_ref[...] = jnp.zeros_like(dlogstd_ref)
        for r in (vl_ref, al_ref, bhi_ref, blo_ref, klsq_ref):
            r[...] = jnp.zeros_like(r)

    dlogstd_ref[...] += jnp.sum(dlogstd_rows, axis=1, keepdims=True)

    # metric sums (reference loss statistics, utils/runner.py:146-162):
    # value loss, clipped-surrogate actor loss, both bound-loss halves,
    # and the per-dim (mu_new - mu_old)^2 sums of the analytic KL
    vl_ref[...] += jnp.sum(jnp.square(val - ret) * mask).reshape(1, 1)
    al_ref[...] += jnp.sum(jnp.maximum(surr, surr_c) * mask).reshape(1, 1)
    bhi_ref[...] += jnp.sum(jnp.square(b_hi) * mask).reshape(1, 1)
    blo_ref[...] += jnp.sum(jnp.square(b_lo) * mask).reshape(1, 1)
    dmu_old = mu - muold
    klsq_ref[...] += jnp.sum(jnp.square(dmu_old) * mask, axis=1,
                             keepdims=True)

    _mlp_bwd_T(xa, za, aWT, dmu.astype(dt), daW, dab, first, interp)
    _mlp_bwd_T(xc, zc, cWT, dval.astype(dt), dcW, dcb, first, interp)


def _opt_stage_kernel(lr_ref, cnt_ref, *refs, n_leaves, stage, dt,
                      b1, b2, eps, max_norm, entropy_coef, logstd_idx):
    """Fused optimizer epoch step: clip-by-global-norm + Adam on every
    parameter leaf PLUS the bf16 weight staging (cast + transpose) for the
    next mini-epoch's forward kernels — one kernel replacing ~75 small XLA
    ops per mini-epoch (ravel/unravel slices, per-leaf casts, transposes,
    the optimizer arithmetic), measured at ~126 us/epoch of pure op-issue
    overhead on v5e (round-5 trace).

    Ref layout: inputs lr (SMEM), cnt (SMEM), then n_leaves gradient refs,
    n_leaves params, n_leaves mu, n_leaves nu — all f32, in the GRADIENT
    kernel's output orientation (weights [in, out], biases [out, 1],
    logstd [num_act, 1]).  Outputs: n_leaves p2, n_leaves m2, n_leaves v2
    (f32), then one staged compute-dtype array per entry of `stage`:
    ("T", i) = transposed [out, in] view of updated leaf i (weights —
    including the [128, 1] critic head, so kinds are explicit, not
    shape-sniffed), ("cast", i) = same-orientation cast (biases).

    The entropy bonus gradient (a constant per logstd dim) is added here,
    BEFORE the global-norm clip — same order as the XLA path.  Formulas
    replicate optax exactly (see PPO._flat_adam); the only numeric
    differences are f32 sum-reassociation in the global norm and the
    exp/log formulation of the bias-correction powers."""
    g_refs = refs[0:n_leaves]
    p_refs = refs[n_leaves:2 * n_leaves]
    m_refs = refs[2 * n_leaves:3 * n_leaves]
    v_refs = refs[3 * n_leaves:4 * n_leaves]
    out = refs[4 * n_leaves:]
    p2_refs = out[0:n_leaves]
    m2_refs = out[n_leaves:2 * n_leaves]
    v2_refs = out[2 * n_leaves:3 * n_leaves]
    staged_refs = out[3 * n_leaves:]

    lr = lr_ref[0, 0]
    cnt = cnt_ref[0, 0]

    def grad_of(i):
        g = g_refs[i][...]
        if i == logstd_idx:
            g = g + entropy_coef
        return g

    sq = jnp.zeros((), jnp.float32)
    for i in range(n_leaves):
        g = grad_of(i)
        sq += jnp.sum(g * g)
    g_norm = jnp.sqrt(sq)
    scale = jnp.where(g_norm < max_norm, 1.0, max_norm / g_norm)

    cnt2 = cnt + 1   # caller saturates (safe_increment) before passing back
    bc1 = 1.0 - jnp.exp(cnt2.astype(jnp.float32) * float(np.log(b1)))
    bc2 = 1.0 - jnp.exp(cnt2.astype(jnp.float32) * float(np.log(b2)))

    for i in range(n_leaves):
        g = grad_of(i) * scale
        m2 = b1 * m_refs[i][...] + (1.0 - b1) * g
        v2 = b2 * v_refs[i][...] + (1.0 - b2) * (g * g)
        upd = (-lr) * ((m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps))
        p2 = p_refs[i][...] + upd
        p2_refs[i][...] = p2
        m2_refs[i][...] = m2
        v2_refs[i][...] = v2

    for k, (kind, i) in enumerate(stage):
        w2 = p2_refs[i][...]
        if kind == "cast":             # bias [out, 1]: cast only
            staged_refs[k][...] = w2.astype(dt)
        else:                          # weight [in, out] -> [out, in]
            staged_refs[k][...] = w2.T.astype(dt)


class FusedUpdate:
    """Builds and calls the two kernels for a given ActorCritic geometry.

    Parameters are the live f32 pytree from flax; weights are cast to the
    compute dtype once per call (as flax does once per apply).  Under
    `mesh`, every call runs per-device inside shard_map over `axis_name`
    with the gradient psum inside — callers see replicated gradients and
    batch-sharded mu/values, exactly like jax.grad under GSPMD.
    """

    def __init__(self, num_obs, num_privileged_obs, num_act,
                 clip_ratio, bound_coef, compute_dtype="bf16",
                 tile=1024, interpret=False, mesh=None, axis_name="dp"):
        self.num_obs = num_obs
        self.num_priv = num_privileged_obs
        self.num_act = num_act
        self.clip_ratio = float(clip_ratio)
        self.bound_coef = float(bound_coef)
        self.dt = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
        self.tile = tile
        self.interpret = interpret
        self.mesh = mesh
        self.axis_name = axis_name

    # -- params plumbing ---------------------------------------------------
    def _layers(self, params, net):
        sub = params["params"][net]
        Ws, bs = [], []
        for i in range(len(sub)):
            Ws.append(sub[f"Dense_{i}"]["kernel"].astype(self.dt))
            bs.append(sub[f"Dense_{i}"]["bias"].reshape(1, -1).astype(self.dt))
        return Ws, bs

    # -- leaf plumbing for the fused optimizer epoch ------------------------
    # canonical leaf order: aW0..., ab0... [out,1], cW0..., cb0... [out,1],
    # logstd [num_act, 1] — the GRADIENT kernel's native output orientation,
    # shared by grads_stats(raw_leaves=True), opt_stage, and param_leaves
    def param_leaves(self, tree):
        """Params/mu/nu pytree -> leaf list in the canonical order."""
        sub = tree["params"]
        leaves = []
        for net in ("actor", "critic"):
            n = len(sub[net])
            leaves += [sub[net][f"Dense_{i}"]["kernel"] for i in range(n)]
            leaves += [sub[net][f"Dense_{i}"]["bias"].reshape(-1, 1)
                       for i in range(n)]
        leaves.append(sub["logstd"].reshape(-1, 1))
        return leaves

    def leaves_to_tree(self, leaves):
        """Inverse of param_leaves (bias leaves back to [out], logstd to
        [1, num_act])."""
        nA = self._n_layers("actor")
        nC = self._n_layers("critic")
        aW, ab = leaves[:nA], leaves[nA:2 * nA]
        cW, cb = (leaves[2 * nA:2 * nA + nC],
                  leaves[2 * nA + nC:2 * nA + 2 * nC])
        return {"params": {
            "actor": {f"Dense_{i}": {"kernel": aW[i],
                                     "bias": ab[i].reshape(-1)}
                      for i in range(nA)},
            "critic": {f"Dense_{i}": {"kernel": cW[i],
                                      "bias": cb[i].reshape(-1)}
                       for i in range(nC)},
            "logstd": leaves[-1].reshape(1, -1),
        }}

    def _n_layers(self, net):
        # actor: 3 hidden + out; critic: 3 hidden + out (networks.py)
        return 4

    def stage_leaves(self, leaves):
        """Compute-dtype staging of a param leaf list (the XLA-side twin of
        the opt_stage kernel's staged outputs; used for mini-epoch 0)."""
        nA = self._n_layers("actor")
        nC = self._n_layers("critic")
        return {
            "aWT": [leaves[i].T.astype(self.dt) for i in range(nA)],
            "abT": [leaves[nA + i].astype(self.dt) for i in range(nA)],
            "cWT": [leaves[2 * nA + i].T.astype(self.dt) for i in range(nC)],
            "cbT": [leaves[2 * nA + nC + i].astype(self.dt)
                    for i in range(nC)],
            "logstd": leaves[-1].astype(jnp.float32),
        }

    def stage(self, params):
        """Staged weight dict from a params pytree."""
        return self.stage_leaves(self.param_leaves(params))

    def _pad_rows(self, x, n_pad):
        return jnp.pad(x, ((0, n_pad), (0, 0)))

    # -- critic value pass ---------------------------------------------------
    def values(self, params, obs, priv):
        """critic(concat(obs, priv)) for any leading batch shape -> [...]."""
        lead = obs.shape[:-1]
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            spec = P(*([None] * (len(lead) - 1) + [self.axis_name]))
            fn = jax.shard_map(
                self._values_local, mesh=self.mesh,
                in_specs=(P(), spec, spec), out_specs=spec, check_vma=False)
            return fn(params, obs, priv)
        return self._values_local(params, obs, priv)

    def _values_local(self, params, obs, priv):
        lead = obs.shape[:-1]
        obsc = jnp.concatenate(
            [obs.reshape(-1, self.num_obs), priv.reshape(-1, self.num_priv)],
            axis=1).astype(self.dt)
        n = obsc.shape[0]
        tile = min(self.tile, -(-n // 8) * 8)  # don't pad tiny batches up
        grid = max(1, -(-n // tile))
        obsc = self._pad_rows(obsc, grid * tile - n)
        cW, cb = self._layers(params, "critic")
        kern = functools.partial(
            _values_kernel, n_layers=len(cW), dt=self.dt)

        def body(obsc_ref, *wrefs_and_out):
            kern(obsc_ref, *wrefs_and_out[:-1], val_ref=wrefs_and_out[-1])

        val = pl.pallas_call(
            body,
            grid=(grid,),
            in_specs=[_row_spec(tile, obsc.shape[1])]
            + [_fixed_spec(w.shape) for w in cW]
            + [_fixed_spec(b.shape) for b in cb],
            out_specs=_row_spec(tile, 1),
            out_shape=jax.ShapeDtypeStruct((grid * tile, 1), jnp.float32),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024),
        )(obsc, *cW, *cb)
        return val[:n, 0].reshape(lead)

    # -- fused values + GAE + advantage-stat pass ----------------------------
    def gae(self, params, obs, priv, obs_last, priv_last, rew, nonterm,
            timeout_f, gamma, lam, n_total=None):
        """Critic values (incl. the bootstrap value at the LAST observation,
        computed in-kernel) + timeout bootstrap + GAE recurrence + masked
        advantage sums, one kernel (one reverse walk over horizon+1 steps).
        rew/nonterm/timeout_f are [T, B] f32 (nonterm = 1 - (done|timeout),
        timeout_f in {0,1}); obs_last/priv_last [B, dim].  Returns
        (adv_raw [T, B], returns [T, B], sum_adv, sum_adv2) — sums psum'd
        under a mesh, so mean/std computed from them are the global batch
        statistics."""
        T, B = rew.shape
        obsc = jnp.concatenate(
            [obs.reshape(T, B, self.num_obs),
             priv.reshape(T, B, self.num_priv)],
            axis=-1).astype(self.dt)
        obsc_last = jnp.concatenate(
            [obs_last.reshape(1, B, self.num_obs),
             priv_last.reshape(1, B, self.num_priv)],
            axis=-1).astype(self.dt)
        obscG = jnp.concatenate([obsc, obsc_last], axis=0).transpose(0, 2, 1)
        return self.gae_prepared(params, obscG, rew, nonterm, timeout_f,
                                 gamma, lam, n_total=n_total)

    def gae_prepared(self, params, obscG, rew, nonterm, timeout_f,
                     gamma, lam, n_total=None):
        """gae() on a prepare()'d [T+1, dim, B] observation plane (row T =
        the last observation)."""
        return self.gae_prepared_staged(self.stage(params), obscG, rew,
                                        nonterm, timeout_f, gamma, lam,
                                        n_total=n_total)

    def gae_prepared_staged(self, staged, obscG, rew, nonterm, timeout_f,
                            gamma, lam, n_total=None):
        """gae() on a prepare()'d observation plane and stage()'d weights
        (the hot path: the opt_stage kernel of epoch e produces epoch
        e+1's staged weights; the concat+transpose of obscG is hoisted out
        of the mini-epoch scan)."""
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            b = P(None, self.axis_name)
            fn = jax.shard_map(
                functools.partial(self._gae_local, gamma=gamma, lam=lam,
                                  n_total=n_total, psum=True),
                mesh=self.mesh,
                in_specs=(P(), P(None, None, self.axis_name), b, b, b),
                out_specs=(b, b, P(), P()), check_vma=False)
            return fn(staged, obscG, rew, nonterm, timeout_f)
        return self._gae_local(staged, obscG, rew, nonterm, timeout_f,
                               gamma=gamma, lam=lam,
                               n_total=n_total, psum=False)

    def _gae_local(self, staged, obsc, rew, nonterm, timeout_f,
                   gamma, lam, n_total, psum):
        T, B = rew.shape
        # batch-on-lanes: [T+1, dim, B] observation planes and [out, in]
        # weights keep every in-kernel array lane-major (see _gae_kernel)
        Bp = -(-B // 128) * 128
        pad = Bp - B
        if pad:
            obsc = jnp.pad(obsc, ((0, 0), (0, 0), (0, pad)))
            rew, nonterm, timeout_f = (
                jnp.pad(x, ((0, 0), (0, pad)))
                for x in (rew, nonterm, timeout_f))
        cW = staged["cWT"]                     # [out, in] compute dtype
        cb = staged["cbT"]                     # [out, 1]
        kern = functools.partial(
            _gae_kernel, n_layers=len(cW), T=T, Bp=Bp, n_valid_b=B,
            gamma=float(gamma), lam=float(lam), dt=self.dt,
            interp=self.interpret)

        # grid = T+1 reverse walk: step 0 reads obs row T (the bootstrap /
        # last observation), step i >= 1 reads rollout row T-i
        rev_obs = lambda i: (T - i, 0, 0)         # noqa: E731
        # the GAE planes have only T rows; step 0 parks on row T-1 (dummy
        # read, no write — see the kernel docstring)
        rev3 = lambda i: (T - jnp.maximum(i, 1), 0, 0)   # noqa: E731
        # [T, B] planes ride as [T, 1, Bp]: Mosaic blocks must have their
        # trailing two dims (8,128)-divisible or whole — (1, 1, Bp) is
        row3 = pl.BlockSpec((1, 1, Bp), rev3, memory_space=pltpu.VMEM)
        f32 = jnp.float32
        adv, ret, sa, sa2 = pl.pallas_call(
            kern,
            grid=(T + 1,),
            in_specs=[pl.BlockSpec((1, obsc.shape[1], Bp), rev_obs,
                                   memory_space=pltpu.VMEM),
                      row3, row3, row3]
            + [_fixed_spec(w.shape) for w in cW]
            + [_fixed_spec(b2.shape) for b2 in cb],
            out_specs=(row3, row3, _fixed_spec((1, 1)), _fixed_spec((1, 1))),
            out_shape=(jax.ShapeDtypeStruct((T, 1, Bp), f32),
                       jax.ShapeDtypeStruct((T, 1, Bp), f32),
                       jax.ShapeDtypeStruct((1, 1), f32),
                       jax.ShapeDtypeStruct((1, 1), f32)),
            scratch_shapes=[pltpu.VMEM((1, Bp), f32),
                            pltpu.VMEM((1, Bp), f32)],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024),
        )(obsc, rew.reshape(T, 1, Bp), nonterm.reshape(T, 1, Bp),
          timeout_f.reshape(T, 1, Bp),
          *cW, *cb)
        adv = adv.reshape(T, Bp)
        ret = ret.reshape(T, Bp)
        if psum:
            sa, sa2 = jax.lax.psum((sa, sa2), self.axis_name)
        return adv[:, :B], ret[:, :B], sa[0, 0], sa2[0, 0]

    # -- gradient + metric pass ----------------------------------------------
    def prepare(self, obs, priv, act, mu_old, old_logp,
                obs_last=None, priv_last=None):
        """Transpose the epoch-invariant update inputs to the kernel's
        batch-on-lanes layout ONCE per iteration (they do not change across
        the 20 mini-epochs; transposing [N, dim] -> [dim, N] per epoch
        would cost ~150 us x 20).  Leaves keep their leading-batch axes
        ([dim, *lead]) so GSPMD shardings on the env axis survive; the
        local kernel wrapper flattens [dim, *lead] -> [dim, N] for free.

        With obs_last/priv_last ([B, dim], the post-rollout observation)
        the GAE plane obscG gets a T+1-th row so the GAE kernel computes
        the bootstrap value itself (utils/runner.py:133-135)."""
        obsc = jnp.concatenate([obs, priv], axis=-1).astype(self.dt)
        prep = {
            "obsT": jnp.moveaxis(obs.astype(self.dt), -1, 0),
            "obscT": jnp.moveaxis(obsc, -1, 0),
            "actT": jnp.moveaxis(act, -1, 0),
            "muoldT": jnp.moveaxis(mu_old, -1, 0),
            "old_logp": old_logp,
        }
        if obsc.ndim == 3 and obs_last is not None:
            # the GAE kernel walks time-major [T+1, dim, B] blocks — the
            # concat+transpose is hoisted here too (one per iteration,
            # not 20); row T is the bootstrap (last) observation
            obsc_last = jnp.concatenate(
                [obs_last, priv_last], axis=-1).astype(self.dt)
            prep["obscG"] = jnp.concatenate(
                [obsc, obsc_last[None]], axis=0).transpose(0, 2, 1)
        return prep

    def policy_old_logp(self, params, prep):
        """DIAGNOSTIC: (mu_oldT [na, *lead], old_logp [*lead]) through a
        standalone copy of the gradient kernel's forward.  The hot path no
        longer uses this — the gradient kernel SELF-captures its epoch-0
        forward as the old policy (see _grads_stats_kernel), because even
        this dedicated pre-pass can disagree with the gradient kernel by
        bf16 rounding across two Mosaic compilations (observed on the
        standup geometry).  Kept for numerics debugging and its test."""
        lead = prep["old_logp"].shape
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            lspec = P(*([None] * (len(lead) - 1) + [self.axis_name]))
            tspec = P(None, *([None] * (len(lead) - 1) + [self.axis_name]))
            fn = jax.shard_map(
                self._policy_old_logp_local, mesh=self.mesh,
                in_specs=(P(), {k: (lspec if k == "old_logp" else tspec)
                                for k in prep}),
                out_specs=(tspec, lspec), check_vma=False)
            return fn(params, prep)
        return self._policy_old_logp_local(params, prep)

    def _policy_old_logp_local(self, params, prep):
        lead = prep["old_logp"].shape
        obsT = prep["obsT"].reshape(self.num_obs, -1)
        actT = prep["actT"].reshape(self.num_act, -1)
        n = obsT.shape[1]
        tile = min(self.tile, -(-n // 128) * 128)
        grid = max(1, -(-n // tile))
        pad = grid * tile - n
        if pad:
            obsT, actT = (jnp.pad(x, ((0, 0), (0, pad)))
                          for x in (obsT, actT))
        aW, ab = self._layers(params, "actor")
        aWT = [w.T for w in aW]
        abT = [b.reshape(-1, 1) for b in ab]
        logstd = params["params"]["logstd"].astype(
            jnp.float32).reshape(-1, 1)
        kern = functools.partial(
            _policy_logp_kernel, nA=len(aW), dt=self.dt,
            interp=self.interpret)

        def col_spec(d):
            return pl.BlockSpec((d, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        f32 = jnp.float32
        mu, logp = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[col_spec(self.num_obs), col_spec(self.num_act),
                      _fixed_spec(logstd.shape)]
            + [_fixed_spec(w.shape) for w in aWT]
            + [_fixed_spec(b.shape) for b in abT],
            out_specs=(col_spec(self.num_act), col_spec(1)),
            out_shape=(jax.ShapeDtypeStruct((self.num_act, grid * tile), f32),
                       jax.ShapeDtypeStruct((1, grid * tile), f32)),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024),
        )(obsT, actT, logstd, *aWT, *abT)
        mu = mu[:, :n].reshape((self.num_act,) + lead)
        logp = logp[0, :n].reshape(lead)
        return mu, logp

    def grads_stats(self, params, obs, priv, act, adv_raw, returns,
                    old_logp, mu_old, adv_mean, adv_rstd, n_total=None):
        """grads() with the advantage normalization applied in-kernel
        ((adv_raw - adv_mean) * adv_rstd) and the reference metric sums
        accumulated in-kernel instead of recomputing them in XLA.  Returns
        (grads, stats) where stats = dict(vl, al, bhi, blo, klsq[num_act])
        are SUMS over the global batch (psum'd under a mesh); the caller
        finishes the reference formulas (mean by n_total, KL constants)."""
        prep = self.prepare(obs, priv, act, mu_old, old_logp)
        return self.grads_stats_prepared(
            params, prep, adv_raw, returns, adv_mean, adv_rstd,
            n_total=n_total)

    def grads_stats_prepared(self, params, prep, adv_raw, returns,
                             adv_mean, adv_rstd, self_old=0.0, n_total=None,
                             raw_leaves=False):
        """grads_stats on prepare()'d inputs; stages the params and calls
        the staged variant below."""
        return self.grads_stats_prepared_staged(
            self.stage(params), prep, adv_raw, returns, adv_mean, adv_rstd,
            self_old=self_old, n_total=n_total, raw_leaves=raw_leaves)

    def grads_stats_prepared_staged(self, staged, prep, adv_raw, returns,
                                    adv_mean, adv_rstd, self_old=0.0,
                                    n_total=None, raw_leaves=False):
        """grads_stats on prepare()'d inputs and stage()'d weights (the hot
        path: ppo.py calls prepare once per iteration; the opt_stage kernel
        hands staged weights from epoch to epoch).  self_old=1.0 marks the
        FIRST mini-epoch: the kernel substitutes its own forward for the
        old policy (bitwise ratio=1 / KL=0) and the caller carries the
        returned mu/logp as the old policy for later epochs — see the
        kernel docstring for why no separately compiled forward can be
        trusted here.  raw_leaves=True returns the gradients as the
        canonical leaf list (param_leaves order) instead of a pytree —
        the opt_stage kernel's input layout."""
        lead = prep["old_logp"].shape
        n_rows = int(np.prod(lead))
        if n_total is None:
            n_total = n_rows
        norm = jnp.stack([jnp.asarray(adv_mean, jnp.float32),
                          jnp.asarray(adv_rstd, jnp.float32),
                          jnp.asarray(self_old, jnp.float32),
                          jnp.float32(0.0)]).reshape(1, 4)
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            lspec = P(*([None] * (len(lead) - 1) + [self.axis_name]))
            tspec = P(None, *([None] * (len(lead) - 1) + [self.axis_name]))
            fn = jax.shard_map(
                functools.partial(self._grads_stats_local, n_total=n_total,
                                  psum=True, raw_leaves=raw_leaves),
                mesh=self.mesh,
                in_specs=(P(), {k: (lspec if k == "old_logp" else tspec)
                                for k in prep},
                          lspec, lspec, P()),
                out_specs=(P(), P(), tspec, lspec), check_vma=False)
            return fn(staged, prep, adv_raw, returns, norm)
        return self._grads_stats_local(
            staged, prep, adv_raw, returns, norm, n_total=n_total,
            psum=False, raw_leaves=raw_leaves)

    def _grads_stats_local(self, staged, prep, adv, returns, norm,
                           n_total, psum, raw_leaves=False):
        obsT = prep["obsT"].reshape(self.num_obs, -1)
        obscT = prep["obscT"].reshape(self.num_obs + self.num_priv, -1)
        actT = prep["actT"].reshape(self.num_act, -1)
        muoldT = prep["muoldT"].reshape(self.num_act, -1)
        # [4, N] stack: plain concatenation of contiguous vectors — unlike
        # the row-major [N, 4] layout this needs no relayout copy
        scal = jnp.stack([adv.reshape(-1), returns.reshape(-1),
                          prep["old_logp"].reshape(-1),
                          jnp.zeros(obsT.shape[1])], axis=0)
        n = obsT.shape[1]
        tile = min(self.tile, -(-n // 128) * 128)
        grid = max(1, -(-n // tile))
        pad = grid * tile - n
        if pad:
            obsT, obscT, actT, scal, muoldT = (
                jnp.pad(x, ((0, 0), (0, pad)))
                for x in (obsT, obscT, actT, scal, muoldT))

        aWT, abT = staged["aWT"], staged["abT"]
        cWT, cbT = staged["cWT"], staged["cbT"]
        logstd = staged["logstd"]               # [num_act, 1] f32
        # weight-gradient output shapes are the ORIGINAL [in, out]
        aW_shapes = [(w.shape[1], w.shape[0]) for w in aWT]
        cW_shapes = [(w.shape[1], w.shape[0]) for w in cWT]
        nA, nC = len(aWT), len(cWT)

        kern = functools.partial(
            _grads_stats_kernel, nA=nA, nC=nC, tile=tile, n_valid=n,
            n_total=float(n_total), clip_ratio=self.clip_ratio,
            bound_coef=self.bound_coef, dt=self.dt, interp=self.interpret)

        f32 = jnp.float32

        def col_spec(d):
            return pl.BlockSpec((d, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        out_shape = (
            [jax.ShapeDtypeStruct(s, f32) for s in aW_shapes]
            + [jax.ShapeDtypeStruct(b.shape, f32) for b in abT]
            + [jax.ShapeDtypeStruct(s, f32) for s in cW_shapes]
            + [jax.ShapeDtypeStruct(b.shape, f32) for b in cbT]
            + [jax.ShapeDtypeStruct(logstd.shape, f32)]
            + [jax.ShapeDtypeStruct((1, 1), f32)] * 4
            + [jax.ShapeDtypeStruct((self.num_act, 1), f32),
               jax.ShapeDtypeStruct((self.num_act, grid * tile), f32),
               jax.ShapeDtypeStruct((1, grid * tile), f32)])
        out_specs = (
            [_fixed_spec(s) for s in aW_shapes]
            + [_fixed_spec(b.shape) for b in abT]
            + [_fixed_spec(s) for s in cW_shapes]
            + [_fixed_spec(b.shape) for b in cbT]
            + [_fixed_spec(logstd.shape)]
            + [_fixed_spec((1, 1))] * 4
            + [_fixed_spec((self.num_act, 1)), col_spec(self.num_act),
               col_spec(1)])

        outs = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[col_spec(4),
                      _fixed_spec((1, 4)),
                      col_spec(self.num_act),
                      col_spec(self.num_obs),
                      col_spec(obscT.shape[0]),
                      col_spec(self.num_act),
                      _fixed_spec(logstd.shape)]
            + [_fixed_spec(w.shape) for w in aWT]
            + [_fixed_spec(b.shape) for b in abT]
            + [_fixed_spec(w.shape) for w in cWT]
            + [_fixed_spec(b.shape) for b in cbT],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024),
        )(scal, norm, muoldT, obsT, obscT, actT, logstd,
          *aWT, *abT, *cWT, *cbT)

        daW = outs[0:nA]
        dab = outs[nA:2 * nA]
        dcW = outs[2 * nA:2 * nA + nC]
        dcb = outs[2 * nA + nC:2 * nA + 2 * nC]
        (dlogstd, vl, al, bhi, blo, klsq, mu_out,
         logp_out) = outs[2 * nA + 2 * nC:]
        if psum:
            (daW, dab, dcW, dcb, dlogstd, vl, al, bhi, blo, klsq) = (
                jax.lax.psum(
                    (daW, dab, dcW, dcb, dlogstd, vl, al, bhi, blo, klsq),
                    self.axis_name))
        stats = {"vl": vl[0, 0], "al": al[0, 0], "bhi": bhi[0, 0],
                 "blo": blo[0, 0], "klsq": klsq[:, 0]}
        lead = prep["old_logp"].shape
        n = int(np.prod(lead))
        mu_out = mu_out[:, :n].reshape((self.num_act,) + lead)
        logp_out = logp_out[0, :n].reshape(lead)
        if raw_leaves:
            # canonical leaf order (param_leaves): the opt_stage kernel's
            # gradient inputs, no pytree re-assembly in the epoch scan
            leaves = list(daW) + list(dab) + list(dcW) + list(dcb) + [dlogstd]
            return leaves, stats, mu_out, logp_out
        grads = {"params": {
            "actor": {f"Dense_{i}": {"kernel": daW[i],
                                     "bias": dab[i].reshape(-1)}
                      for i in range(nA)},
            "critic": {f"Dense_{i}": {"kernel": dcW[i],
                                      "bias": dcb[i].reshape(-1)}
                       for i in range(nC)},
            "logstd": dlogstd.reshape(1, -1),
        }}
        return grads, stats, mu_out, logp_out

    # -- fused optimizer + staging pass ---------------------------------------
    def opt_stage(self, g_leaves, p_leaves, m_leaves, v_leaves, cnt, lr,
                  entropy_coef, b1, b2, eps, max_norm):
        """One mini-epoch of clip-by-global-norm + Adam over the canonical
        leaf list, PLUS the compute-dtype staging of the updated weights
        for the next epoch's forward kernels — one pallas_call replacing
        ~75 small per-epoch XLA ops (~126 us/epoch of op-issue overhead on
        v5e).  Returns (p2_leaves, m2_leaves, v2_leaves, staged dict).
        The entropy bonus gradient (entropy_coef per logstd dim) is added
        in-kernel before the clip, matching the XLA order.  Replicated
        math: under a mesh it runs identically on every device (gradients
        arrive psum'd)."""
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            fn = jax.shard_map(
                functools.partial(
                    self._opt_stage_local, entropy_coef=entropy_coef,
                    b1=b1, b2=b2, eps=eps, max_norm=max_norm),
                mesh=self.mesh,
                in_specs=(P(), P(), P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P()), check_vma=False)
            return fn(g_leaves, p_leaves, m_leaves, v_leaves, cnt, lr)
        return self._opt_stage_local(
            g_leaves, p_leaves, m_leaves, v_leaves, cnt, lr,
            entropy_coef=entropy_coef, b1=b1, b2=b2, eps=eps,
            max_norm=max_norm)

    def _opt_stage_local(self, g_leaves, p_leaves, m_leaves, v_leaves,
                         cnt, lr, entropy_coef, b1, b2, eps, max_norm):
        n_leaves = len(p_leaves)
        nA = self._n_layers("actor")
        nC = self._n_layers("critic")
        # staged output order: aWT, abT, cWT, cbT (stage_leaves layout)
        stage = ([("T", i) for i in range(nA)]
                 + [("cast", nA + i) for i in range(nA)]
                 + [("T", 2 * nA + i) for i in range(nC)]
                 + [("cast", 2 * nA + nC + i) for i in range(nC)])
        kern = functools.partial(
            _opt_stage_kernel, n_leaves=n_leaves, stage=tuple(stage),
            dt=self.dt, b1=float(b1), b2=float(b2), eps=float(eps),
            max_norm=float(max_norm), entropy_coef=float(entropy_coef),
            logstd_idx=n_leaves - 1)

        f32 = jnp.float32
        smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
        leaf_specs = [_fixed_spec(p.shape) for p in p_leaves]
        staged_shapes = [
            ((p_leaves[i].shape[1], p_leaves[i].shape[0])
             if kind == "T" else p_leaves[i].shape)
            for kind, i in stage]
        out_shape = (
            [jax.ShapeDtypeStruct(p.shape, f32) for p in p_leaves] * 3
            + [jax.ShapeDtypeStruct(s, self.dt) for s in staged_shapes])
        out_specs = leaf_specs * 3 + [_fixed_spec(s) for s in staged_shapes]

        outs = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[smem, smem] + leaf_specs * 4,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(jnp.asarray(lr, f32).reshape(1, 1),
          jnp.asarray(cnt, jnp.int32).reshape(1, 1),
          *g_leaves, *p_leaves, *m_leaves, *v_leaves)

        p2 = list(outs[0:n_leaves])
        m2 = list(outs[n_leaves:2 * n_leaves])
        v2 = list(outs[2 * n_leaves:3 * n_leaves])
        sg = outs[3 * n_leaves:]
        staged = {"aWT": list(sg[0:nA]), "abT": list(sg[nA:2 * nA]),
                  "cWT": list(sg[2 * nA:2 * nA + nC]),
                  "cbT": list(sg[2 * nA + nC:2 * nA + 2 * nC]),
                  "logstd": p2[-1]}
        return p2, m2, v2, staged

    # -- gradient pass -------------------------------------------------------
    def grads(self, params, obs, priv, act, adv, returns, old_logp,
              n_total=None):
        """Gradients of (value_loss + actor_loss + bound_coef*bound_loss)
        w.r.t. params, plus the forward mu and values for metric computation.
        adv/returns/old_logp are treated as constants (the XLA path computes
        them under stop_gradient).  `n_total` is the GLOBAL sample count the
        loss means divide by (defaults to the local row count)."""
        lead = obs.shape[:-1]
        n_rows = int(np.prod(lead))
        if n_total is None:
            n_total = n_rows
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            spec = P(*([None] * (len(lead) - 1) + [self.axis_name]))
            sspec = P(*([None] * (len(lead) - 1) + [self.axis_name]))
            fn = jax.shard_map(
                functools.partial(self._grads_local, n_total=n_total,
                                  psum=True),
                mesh=self.mesh,
                in_specs=(P(), spec, spec, spec, sspec, sspec, sspec),
                out_specs=(P(), spec, spec), check_vma=False)
            return fn(params, obs, priv, act, adv, returns, old_logp)
        return self._grads_local(params, obs, priv, act, adv, returns,
                                 old_logp, n_total=n_total, psum=False)

    def _grads_local(self, params, obs, priv, act, adv, returns, old_logp,
                     n_total, psum):
        lead = obs.shape[:-1]
        obs2 = obs.reshape(-1, self.num_obs)
        obsc = jnp.concatenate(
            [obs2, priv.reshape(-1, self.num_priv)], axis=1)
        # network inputs stream in the compute dtype (flax casts them before
        # its dots anyway) — halves the dominant HBM read in bf16 mode
        obs2 = obs2.astype(self.dt)
        obsc = obsc.astype(self.dt)
        act2 = act.reshape(-1, self.num_act)
        scal = jnp.stack([adv.reshape(-1), returns.reshape(-1),
                          old_logp.reshape(-1),
                          jnp.zeros_like(adv.reshape(-1))], axis=1)
        n = obs2.shape[0]
        tile = min(self.tile, -(-n // 8) * 8)  # don't pad tiny batches up
        grid = max(1, -(-n // tile))
        pad = grid * tile - n
        obs2, obsc, act2, scal = (self._pad_rows(x, pad)
                                  for x in (obs2, obsc, act2, scal))

        aW, ab = self._layers(params, "actor")
        cW, cb = self._layers(params, "critic")
        logstd = params["params"]["logstd"].astype(jnp.float32)
        nA, nC = len(aW), len(cW)

        kern = functools.partial(
            _grads_kernel, nA=nA, nC=nC, tile=tile, n_valid=n,
            n_total=float(n_total), clip_ratio=self.clip_ratio,
            bound_coef=self.bound_coef, dt=self.dt)

        f32 = jnp.float32
        out_shape = (
            [jax.ShapeDtypeStruct(w.shape, f32) for w in aW]
            + [jax.ShapeDtypeStruct(b.shape, f32) for b in ab]
            + [jax.ShapeDtypeStruct(w.shape, f32) for w in cW]
            + [jax.ShapeDtypeStruct(b.shape, f32) for b in cb]
            + [jax.ShapeDtypeStruct(logstd.shape, f32),
               jax.ShapeDtypeStruct((grid * tile, self.num_act), self.dt),
               jax.ShapeDtypeStruct((grid * tile, 1), self.dt)])
        out_specs = (
            [_fixed_spec(w.shape) for w in aW]
            + [_fixed_spec(b.shape) for b in ab]
            + [_fixed_spec(w.shape) for w in cW]
            + [_fixed_spec(b.shape) for b in cb]
            + [_fixed_spec(logstd.shape),
               _row_spec(tile, self.num_act),
               _row_spec(tile, 1)])

        outs = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[_row_spec(tile, 4),
                      _row_spec(tile, self.num_obs),
                      _row_spec(tile, obsc.shape[1]),
                      _row_spec(tile, self.num_act),
                      _fixed_spec(logstd.shape)]
            + [_fixed_spec(w.shape) for w in aW]
            + [_fixed_spec(b.shape) for b in ab]
            + [_fixed_spec(w.shape) for w in cW]
            + [_fixed_spec(b.shape) for b in cb],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024),
        )(scal, obs2, obsc, act2, logstd, *aW, *ab, *cW, *cb)

        daW = outs[0:nA]
        dab = outs[nA:2 * nA]
        dcW = outs[2 * nA:2 * nA + nC]
        dcb = outs[2 * nA + nC:2 * nA + 2 * nC]
        dlogstd, mu, val = outs[2 * nA + 2 * nC:]
        mu = mu.astype(jnp.float32)
        val = val.astype(jnp.float32)
        if psum:
            (daW, dab, dcW, dcb, dlogstd) = jax.lax.psum(
                (daW, dab, dcW, dcb, dlogstd), self.axis_name)
        grads = {"params": {
            "actor": {f"Dense_{i}": {"kernel": daW[i],
                                     "bias": dab[i].reshape(-1)}
                      for i in range(nA)},
            "critic": {f"Dense_{i}": {"kernel": dcW[i],
                                      "bias": dcb[i].reshape(-1)}
                       for i in range(nC)},
            "logstd": dlogstd,
        }}
        return (grads, mu[:n].reshape(lead + (self.num_act,)),
                val[:n, 0].reshape(lead))
