"""TPU terrain sampling without gathers: DMA patch staging + one-hot bilinear.

XLA's TPU gather executes at ~10 ns/element (profiler-verified on v5e), so
querying terrain height+normal for every collision point of a rough-terrain
batch (8192 envs x 81 points x 4 corners) costs ~25 ms per control step —
the dominant cost of rough-terrain training.  Sliced gathers are worse (a
sequential dynamic-slice loop).  This module replaces them with TPU-native
primitives:

  1. a pre-sheared heightfield table: ~25 copies of the field, each
     shifted 8 columns, so every env's 17-cell y-window sits at a STATIC
     lane offset inside some copy (DMA regions must span whole 128-lane
     tiles; the shear moves the dynamic offset into the copy index);
  2. a Pallas staging kernel: one strided async DMA per env fetches its
     [24, 128] patch (rows 8-aligned for the f32 sublane tiling, copy index
     and row start scalar-prefetched) — 8192 DMA descriptors instead of
     2.4M scalar gathers;
  3. a Pallas compute kernel: one-hot bilinear over the staged patches,
     transposed so the env axis rides the 128 lanes ([PX, PYW, EB] tiles —
     every vector op spans all 128 envs of the grid step).  The 4-term
     bilinear stencil is encoded in 2-nonzero weight vectors, so heights
     and both slope components come out of dense VPU multiply-reduces
     with no indexing at all.

Exact (f32 bilinear) for points within ~0.7 m of their env's root — the
full collision-point envelope of a standing or fallen T1; farther points
clamp to the patch border (reachable only mid-fall, where the env layer
already overrides terrain values with the root fallback on reset).

Reference anchor: replaces the height-query role of utils/terrain.py:
101-121 for the training hot path (the reference queries a CPU NumPy array
per call, SURVEY.md's flagged anti-pattern).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PX = 24     # patch rows: 16-cell x-window + up to 7 rows of 8-alignment
PY = 128    # stored patch cols (DMA regions must span full 128-lane tiles)
PYW = 24    # cols consumed by the bilinear (oy%8 + 17 <= 24)
EB = 128    # envs per staging grid step


def build_shift_table(height_field):
    """[S, R, PY] pre-sheared copies: table[s, r, c] = hf[r, 8*s + c].

    Built once at terrain construction (NumPy); the table is what training
    passes around at runtime (~11 MB for the T1 terrain).

    Padding (row round-up to 8, and the last copies' column windows that
    extend past the field edge) is filled with the EDGE value, not zero, so
    queries near the map border read the clamped border height — the same
    semantics as heightfield.heights()'s index clamp.  This holds even if
    a future terrain drops the flat zero border the T1 config builds."""
    hf = np.asarray(height_field, np.float32)
    R, C = hf.shape
    Rp = -(-R // 8) * 8
    S = max(1, (max(0, C - 17) // 8) + 1)
    rows = np.minimum(np.arange(Rp), R - 1)
    table = np.empty((S, Rp, PY), np.float32)
    for s in range(S):
        cols = np.minimum(np.arange(8 * s, 8 * s + PY), C - 1)
        table[s] = hf[np.ix_(rows, cols)]
    return jnp.asarray(table)


def make_terrain_sampler(terrain, num_points, interpret=False):
    """Build sample(table, root_xy, pts_xy) -> (h, n).

    table:   build_shift_table(terrain.height_field)
    root_xy: [B, 2] world xy of each env's patch anchor (the root)
    pts_xy:  [B, num_points, 2] world xy of the query points
    returns  h [B, num_points], n [B, num_points, 3] (unit normals)
    """
    hs = terrain.horizontal_scale
    bp = terrain.border_pixels
    N = num_points
    NP = -(-N // 8) * 8   # pad points to sublane multiples

    def stage_kernel(sidx_ref, ox_ref, table_ref, bands_ref, sem):
        s = pl.program_id(0)
        for e in range(EB):
            i = s * EB + e
            pltpu.make_async_copy(
                table_ref.at[sidx_ref[i],
                             pl.ds(pl.multiple_of(ox_ref[i], 8), PX), :],
                bands_ref.at[e], sem.at[e],
            ).start()
        for e in range(EB):
            i = s * EB + e
            pltpu.make_async_copy(
                table_ref.at[sidx_ref[i],
                             pl.ds(pl.multiple_of(ox_ref[i], 8), PX), :],
                bands_ref.at[e], sem.at[e],
            ).wait()

    def sample(table, root_xy, pts_xy):
        B = root_xy.shape[0]
        Bp = -(-B // EB) * EB
        S, Rp, _ = table.shape

        rx = bp + root_xy[..., 0] / hs
        ry = bp + root_xy[..., 1] / hs
        ox = jnp.clip(jnp.floor(rx).astype(jnp.int32) - 7, 0, Rp - PX)
        ox = (ox // 8) * 8                       # 8-aligned rows for the DMA
        oy = jnp.clip(jnp.floor(ry).astype(jnp.int32) - 7, 0, 8 * (S - 1))
        sidx = oy // 8                           # copy whose window is static

        gx = bp + pts_xy[..., 0] / hs            # [B, N] grid coords
        gy = bp + pts_xy[..., 1] / hs
        px = jnp.clip(gx - ox[:, None].astype(jnp.float32), 0.0, PX - 1.001)
        py = jnp.clip(gy - (8.0 * sidx[:, None].astype(jnp.float32)),
                      0.0, PYW - 1.001)

        if Bp != B:
            pad = Bp - B
            sidx = jnp.concatenate([sidx, jnp.zeros(pad, jnp.int32)])
            ox = jnp.concatenate([ox, jnp.zeros(pad, jnp.int32)])

        bands = pl.pallas_call(
            stage_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(Bp // EB,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (EB, PX, PY), lambda s, *_: (s, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((EB,))],
            ),
            out_shape=jax.ShapeDtypeStruct((Bp, PX, PY), jnp.float32),
            interpret=interpret,
        )(sidx, ox, table)

        # env axis onto the 128 lanes for the compute kernel
        patch_t = jnp.transpose(bands[:, :, :PYW], (1, 2, 0))  # [PX, PYW, Bp]
        if Bp != B:
            px = jnp.concatenate([px, jnp.zeros((Bp - B, N))], axis=0)
            py = jnp.concatenate([py, jnp.zeros((Bp - B, N))], axis=0)
        if NP != N:
            px = jnp.concatenate([px, jnp.zeros((Bp, NP - N))], axis=1)
            py = jnp.concatenate([py, jnp.zeros((Bp, NP - N))], axis=1)
        px_t = px.T                                            # [NP, Bp]
        py_t = py.T

        pt_blk = lambda: pl.BlockSpec((NP, EB), lambda s: (0, s),
                                      memory_space=pltpu.VMEM)
        h, dhdx, dhdy = pl.pallas_call(
            _make_compute_kernel(N, hs),
            grid=(Bp // EB,),
            in_specs=[
                pl.BlockSpec((PX, PYW, EB), lambda s: (0, 0, s),
                             memory_space=pltpu.VMEM),
                pt_blk(), pt_blk(),
            ],
            out_specs=[pt_blk(), pt_blk(), pt_blk()],
            out_shape=[jax.ShapeDtypeStruct((NP, Bp), jnp.float32)] * 3,
            interpret=interpret,
        )(patch_t, px_t, py_t)

        h = h.T[:B, :N]
        dhdx = dhdx.T[:B, :N]
        dhdy = dhdy.T[:B, :N]
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n

    return sample


def _make_compute_kernel(N, hs):
    """One-hot bilinear over [PX, PYW, EB] patches: for each of the N
    points (unrolled), height and both slope components are 2-nonzero-
    weight reductions over the patch plane — pure VPU work spanning all
    EB envs per vector op."""
    hs_inv = 1.0 / hs

    def kernel(patch_ref, px_ref, py_ref, h_ref, dx_ref, dy_ref):
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (PX, PYW, 1), 0).astype(jnp.float32)
        jj = jax.lax.broadcasted_iota(
            jnp.int32, (PX, PYW, 1), 1).astype(jnp.float32)
        pf = patch_ref[:]                        # [PX, PYW, EB]
        for p in range(N):
            x = px_ref[p, :].reshape(1, 1, EB)
            y = py_ref[p, :].reshape(1, 1, EB)
            x1 = jnp.floor(x)
            y1 = jnp.floor(y)
            fx, fy = x - x1, y - y1
            ex1 = (ii == x1).astype(jnp.float32)
            ex2 = (ii == x1 + 1.0).astype(jnp.float32)
            ey1 = (jj == y1).astype(jnp.float32)
            ey2 = (jj == y1 + 1.0).astype(jnp.float32)
            wx = (1.0 - fx) * ex1 + fx * ex2
            wy = (1.0 - fy) * ey1 + fy * ey2
            h_ref[p, :] = jnp.sum(
                wx * wy * pf, axis=(0, 1), keepdims=True).reshape(EB)
            dx_ref[p, :] = (jnp.sum((ex2 - ex1) * wy * pf, axis=(0, 1),
                                    keepdims=True).reshape(EB) * hs_inv)
            dy_ref[p, :] = (jnp.sum(wx * (ey2 - ey1) * pf, axis=(0, 1),
                                    keepdims=True).reshape(EB) * hs_inv)

    return kernel
