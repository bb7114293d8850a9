"""Batched small-matrix linear algebra, TPU-shaped.

XLA's TPU Cholesky is a custom call tuned for large matrices; on the
[B, 18, 18] batched-tiny systems of articulated dynamics it costs ~8 ms per
substep at B=4096 (profiled).  This module replaces it with a fully unrolled
Cholesky inverse expressed as elementwise ops over the batch dimension —
the batch rides the VPU lanes, the 18x18 recurrence unrolls at trace time,
and XLA fuses the chain into a few vector kernels.
"""

import jax
import jax.numpy as jnp


def spd_inverse(M):
    """Inverse of a batched SPD matrix M [..., n, n] via unrolled Cholesky.

    n is static and small (<= ~24).  Returns M^{-1} with the same shape.
    All indexing is on the trailing matrix dims so the batch stays vectorized.
    """
    n = M.shape[-1]
    # batch-last view: entry slices M[i, j] are then contiguous over the
    # batch (slicing [..., i, j] out of a batch-first array is a strided
    # gather that fragments into slow slice fusions on TPU)
    Mb = jnp.moveaxis(M, (-2, -1), (0, 1))
    # Cholesky: M = L L^T, storing entries of L as batch-shaped vectors
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for i in range(n):
        s = Mb[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        d = jax.lax.rsqrt(s)
        inv_diag[i] = d
        L[i][i] = s * d  # = sqrt(s)
        for j in range(i + 1, n):
            t = Mb[j, i]
            for k in range(i):
                t = t - L[j][k] * L[i][k]
            L[j][i] = t * d

    # forward substitution: columns of L^{-1} (lower triangular)
    Linv = [[None] * n for _ in range(n)]
    for i in range(n):
        Linv[i][i] = inv_diag[i]
        for j in range(i + 1, n):
            t = L[j][i] * Linv[i][i]
            for k in range(i + 1, j):
                t = t + L[j][k] * Linv[k][i]
            Linv[j][i] = -t * inv_diag[j]

    # M^{-1} = L^{-T} L^{-1}; exploit lower-triangularity of L^{-1}
    rows = []
    zero = jnp.zeros_like(Mb[0, 0])
    for i in range(n):
        row = []
        for j in range(n):
            # (i,j) entry = sum_k Linv[k][i] * Linv[k][j], k >= max(i,j)
            t = zero
            for k in range(max(i, j), n):
                t = t + Linv[k][i] * Linv[k][j]
            row.append(t)
        rows.append(jnp.stack(row, axis=0))
    out = jnp.stack(rows, axis=0)          # [n, n, *batch]
    return jnp.moveaxis(out, (0, 1), (-2, -1))
