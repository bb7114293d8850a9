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

Two kernels:
  * `values`: critic forward only — GAE needs all values before advantages
    exist, so the value pass cannot fuse with the gradient pass;
  * `grads`:  actor+critic forward (recomputed — remat is free here, the
    FLOPs are cheap relative to the saved traffic), per-sample dL/dmu and
    dL/dvalue for the clipped-surrogate + value + bound losses (reference
    loss layout: utils/runner.py:131-164), backward through both MLPs.
    `mu` and `values` are also written out so ppo.py computes every metric
    (value/actor/bound loss, KL) with the exact reference formulas in XLA —
    the kernel hand-derives only gradients, never statistics.

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
