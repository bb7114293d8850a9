"""Pallas TPU substep kernel — the articulated-dynamics core as ONE kernel.

The XLA-op formulation of the substep (engine.py) compiles to ~1000 small
kernels (unrolled FK/CRBA/Cholesky fragments + layout copies) and runs at
~14 ms / 4096 envs on v5e.  This kernel runs the entire substep — FK,
CRBA mass matrix, RNEA bias, unrolled Cholesky inverse, the projected
per-point contact solve, and integration — as one Pallas program:

  * batch is the only array axis: every per-env scalar is an [8, 128] tile
    (1024 envs per grid step), so all small-matrix algebra unrolls at trace
    time into pure VPU arithmetic with zero layout traffic;
  * the kinematic tree, joint frames, collision points, and ancestor sets
    are Python-level constants baked into the instruction stream;
  * terrain enters as per-collision-point heights/normals (`ph`, `pn`
    inputs of `packed_call`, packed like every other component): flat
    ground passes constants; heightfield terrain samples them ONCE per
    control step (terrain/sample_kernel.py DMA sampler, driven from
    envs/t1.py) and holds them fixed across the 10 substeps — one-substep-
    stale terrain in exchange for a gather-free kernel body.  The general
    contact projection uses the per-point normal, not a hardcoded z-up.

Layout convention: host arrays are packed component-first, batch-last:
[comp, G, 8, 128] with G = B / 1024 grid steps.

This is the "Pallas batched articulated rigid-body dynamics core" of the
project north star (BASELINE.md); physical semantics are identical to
engine.py (validated by tests/test_pallas.py equivalence tests).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from booster_gym_tpu.physics.types import SimState

BT = 1024  # envs per grid step (8 sublanes x 128 lanes)


# ---------------------------------------------------------------------------
# small tuple-algebra helpers: Vec3 = (x, y, z), Mat33 = row-major 9-tuple.
# Elements are [8,128] jnp arrays (or python floats for static constants).

def v_add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def v_sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def v_scale(a, s):
    return tuple(x * s for x in a)


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def m_vec(M, v):
    """Mat33 @ Vec3."""
    return (
        M[0] * v[0] + M[1] * v[1] + M[2] * v[2],
        M[3] * v[0] + M[4] * v[1] + M[5] * v[2],
        M[6] * v[0] + M[7] * v[1] + M[8] * v[2],
    )


def mT_vec(M, v):
    """Mat33^T @ Vec3."""
    return (
        M[0] * v[0] + M[3] * v[1] + M[6] * v[2],
        M[1] * v[0] + M[4] * v[1] + M[7] * v[2],
        M[2] * v[0] + M[5] * v[1] + M[8] * v[2],
    )


def m_mul(A, B):
    """Mat33 @ Mat33."""
    return tuple(
        A[3 * i + 0] * B[0 + j] + A[3 * i + 1] * B[3 + j] + A[3 * i + 2] * B[6 + j]
        for i in range(3) for j in range(3)
    )


def m_mul_const(A, Bc):
    """Mat33 @ constant numpy 3x3 (entries fold into immediates)."""
    out = []
    for i in range(3):
        for j in range(3):
            acc = None
            for k in range(3):
                c = float(Bc[k, j])
                if c == 0.0:
                    continue
                term = A[3 * i + k] * c if c != 1.0 else A[3 * i + k]
                acc = term if acc is None else acc + term
            out.append(acc if acc is not None else jnp.zeros_like(A[0]))
    return tuple(out)


def rodrigues_const_axis(axis, q):
    """Rotation about a constant unit axis by per-env angle q -> Mat33."""
    ax, ay, az = (float(a) for a in axis)
    K = np.array([[0, -az, ay], [az, 0, -ax], [-ay, ax, 0]])
    K2 = K @ K
    s, c1 = jnp.sin(q), 1.0 - jnp.cos(q)
    out = []
    for i in range(3):
        for j in range(3):
            e = None
            if i == j:
                e = jnp.ones_like(q)
            k, k2 = float(K[i, j]), float(K2[i, j])
            if k != 0.0:
                t = s * k
                e = t if e is None else e + t
            if k2 != 0.0:
                t = c1 * k2
                e = t if e is None else e + t
            out.append(e if e is not None else jnp.zeros_like(q))
    return tuple(out)


def quat_to_mat(q):
    w, x, y, z = q
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


# --- dense n x n symmetric algebra on dicts {(i, j): tile}, i <= j ---------

def sym_get(M, i, j):
    return M[(i, j)] if i <= j else M[(j, i)]


def chol_inverse(M, n):
    """Unrolled Cholesky inverse of a symmetric positive-definite dict
    matrix; returns dense dict {(i, j): tile} for all i, j (symmetric)."""
    L = {}
    inv_diag = {}
    for i in range(n):
        s = sym_get(M, i, i)
        for k in range(i):
            s = s - L[(i, k)] * L[(i, k)]
        d = jax.lax.rsqrt(s)
        inv_diag[i] = d
        for j in range(i + 1, n):
            t = sym_get(M, j, i)
            for k in range(i):
                t = t - L[(j, k)] * L[(i, k)]
            L[(j, i)] = t * d
    Linv = {}
    for i in range(n):
        Linv[(i, i)] = inv_diag[i]
        for j in range(i + 1, n):
            t = L[(j, i)] * Linv[(i, i)]
            for k in range(i + 1, j):
                t = t + L[(j, k)] * Linv[(k, i)]
            Linv[(j, i)] = -t * inv_diag[j]
    G = {}
    for i in range(n):
        for j in range(i, n):
            t = None
            for k in range(j, n):  # k >= max(i, j) = j
                term = Linv[(k, i)] * Linv[(k, j)]
                t = term if t is None else t + term
            G[(i, j)] = t
    return G


def _swap6(i):
    """Base-column relabeling: u = [v0, w0] vs spatial [w; v]."""
    return i + 3 if i < 3 else i - 3


class _EmuInRef:
    """Read-only stand-in for a VMEM block ref in emulated execution."""

    def __init__(self, arr):
        self._arr = arr

    def __getitem__(self, idx):
        return self._arr[idx]


class _EmuOutRef:
    """Write-only stand-in for an output block ref; collects the per-row
    writes the kernel performs and reassembles the block."""

    def __init__(self, shape, dtype):
        self.shape = shape
        self.dtype = dtype
        self._rows = {}

    def __setitem__(self, idx, val):
        self._rows[idx] = val

    def assemble(self):
        rows = [self._rows[(k, 0)] for k in range(self.shape[0])]
        return jnp.stack(rows).astype(self.dtype)[:, None]


def make_substep_pallas(model, cfg, feet_indices=None, interpret=False,
                        plane=False):
    """Plane-terrain Pallas substep with the same semantics/signature as
    engine.make_substep(model, cfg, plane_terrain).

    interpret=True runs the kernel through the Pallas interpreter (exact
    pallas_call coverage, but the ~40k-op T1 kernel takes >30 min to
    compile that way on CPU — fine for the toy model in
    tests/test_pallas_small.py, marked slow for T1).  interpret="emulate"
    executes the *same kernel body* as ordinary traced JAX ops with an
    emulated grid (one iteration per grid step, block refs shimmed), which
    XLA compiles like the engine.py path — the program the TPU kernel runs,
    validated cheaply on CPU (used by __graft_entry__.dryrun_multichip for
    the sharded 512-envs/device check).

    plane=True bakes h=0, n=(0,0,1) into the kernel instead of taking
    per-point terrain height/normal INPUTS and emitting the contact-point-
    xy OUTPUT: numerically identical to the general kernel fed plane
    constants (tests/test_pallas_small.py asserts exact equality), but it
    drops ~5.5 MB of per-substep DMA at 4096 envs (ph/pn in, ptxy out)
    and the per-point normal-projection VPU work — the flat-terrain
    production configuration (round-5 flat bench: physics 10.95 ms/iter of
    a 37.4 ms iteration before this specialization)."""
    nb, nd = model.num_bodies, model.num_dofs
    if feet_indices is None:
        feet_indices = [i for i, n in enumerate(model.body_names) if "foot" in n]
    feet_indices = list(feet_indices)
    nf = len(feet_indices)
    nv = 6 + nd
    npt = model.num_points
    parent = [int(p) for p in model.parent]
    children = [[] for _ in range(nb)]
    for b in range(1, nb):
        children[parent[b]].append(b)
    anc_dofs = [[] for _ in range(nb)]  # dof indices moving body b
    for b in range(1, nb):
        a = b
        while a > 0:
            anc_dofs[b].append(a - 1)
            a = parent[a]
    body_points = [[] for _ in range(nb)]
    for p in range(npt):
        body_points[int(model.point_body[p])].append(p)
    point_shape = [int(s) for s in model.point_shape]
    point_local = model.point_pos
    point_radius = model.point_radius
    dt = cfg.dt
    gvec = cfg.gravity_arr

    def kernel(*refs):
        if plane:
            (rp_ref, rq_ref, v0_ref, w0_ref, q_ref, qd_ref,
             mass_ref, com_ref, in6_ref, fric_ref, rest_ref,
             tau_ref, ext_ref,
             o_rp, o_rq, o_v0, o_w0, o_q, o_qd, o_f, o_feet) = refs
            h_ref = n_ref = o_ptxy = None
        else:
            (rp_ref, rq_ref, v0_ref, w0_ref, q_ref, qd_ref,
             mass_ref, com_ref, in6_ref, fric_ref, rest_ref,
             tau_ref, ext_ref, h_ref, n_ref,
             o_rp, o_rq, o_v0, o_w0, o_q, o_qd, o_f, o_feet,
             o_ptxy) = refs
        read = lambda ref, k: ref[k, 0]
        p0 = tuple(read(rp_ref, k) for k in range(3))
        quat = tuple(read(rq_ref, k) for k in range(4))
        v0 = tuple(read(v0_ref, k) for k in range(3))
        w0 = tuple(read(w0_ref, k) for k in range(3))
        q = [read(q_ref, j) for j in range(nd)]
        qd = [read(qd_ref, j) for j in range(nd)]
        tau = [read(tau_ref, j) for j in range(nd)]
        ext = [read(ext_ref, k) for k in range(6)]  # [force(3), torque(3)]

        # ---------------- FK ----------------
        R = [quat_to_mat(quat)]
        pos = [p0]
        phi = [None] * nd  # (w-part Vec3, v-part Vec3)
        for b in range(1, nb):
            pr, pp = R[parent[b]], pos[parent[b]]
            jR = m_mul_const(pr, model.joint_rot[b])
            jp = model.joint_pos[b]
            # position: pp + pr @ const jp
            px = pp[0] + pr[0] * float(jp[0]) + pr[1] * float(jp[1]) + pr[2] * float(jp[2])
            py = pp[1] + pr[3] * float(jp[0]) + pr[4] * float(jp[1]) + pr[5] * float(jp[2])
            pz = pp[2] + pr[6] * float(jp[0]) + pr[7] * float(jp[1]) + pr[8] * float(jp[2])
            pb = (px, py, pz)
            Rb = m_mul(jR, rodrigues_const_axis(model.joint_axis[b], q[b - 1]))
            R.append(Rb)
            pos.append(pb)
            ax = tuple(float(a) for a in model.joint_axis[b])
            a_w = m_vec(jR, ax)
            c = v_sub(pb, p0)
            phi[b - 1] = (a_w, v_cross(c, a_w))

        # ---------------- per-body spatial inertia (s, h, A) --------------
        # I_sp = [[A, skew(h)], [skew(h)^T, s I]] at the base origin
        s_b, h_b, A_b = [], [], []
        for b in range(nb):
            m = read(mass_ref, b)
            cl = tuple(read(com_ref, 3 * b + k) for k in range(3))
            c_w = v_add(v_sub(pos[b], p0), m_vec(R[b], cl))
            # world rotational inertia about com: R Il R^T from 6 unique entries
            Il = tuple(read(in6_ref, 6 * b + k) for k in range(6))  # xx,yy,zz,xy,xz,yz
            Im = (Il[0], Il[3], Il[4], Il[3], Il[1], Il[5], Il[4], Il[5], Il[2])
            T = m_mul(R[b], Im)
            # Iw = T @ R^T (6 unique)
            def trow(i):
                return (T[3 * i], T[3 * i + 1], T[3 * i + 2])
            r0, r1, r2 = (R[b][0], R[b][1], R[b][2]), (R[b][3], R[b][4], R[b][5]), (R[b][6], R[b][7], R[b][8])
            Iw = {
                (0, 0): v_dot(trow(0), r0), (0, 1): v_dot(trow(0), r1), (0, 2): v_dot(trow(0), r2),
                (1, 1): v_dot(trow(1), r1), (1, 2): v_dot(trow(1), r2), (2, 2): v_dot(trow(2), r2),
            }
            c2 = v_dot(c_w, c_w)
            A = {
                (0, 0): Iw[(0, 0)] + m * (c2 - c_w[0] * c_w[0]),
                (1, 1): Iw[(1, 1)] + m * (c2 - c_w[1] * c_w[1]),
                (2, 2): Iw[(2, 2)] + m * (c2 - c_w[2] * c_w[2]),
                (0, 1): Iw[(0, 1)] - m * c_w[0] * c_w[1],
                (0, 2): Iw[(0, 2)] - m * c_w[0] * c_w[2],
                (1, 2): Iw[(1, 2)] - m * c_w[1] * c_w[2],
            }
            s_b.append(m)
            h_b.append(v_scale(c_w, m))
            A_b.append(A)

        def I_apply(s, h, A, w, v):
            """[A w + h x v ; -h x w + s v]  (I_sp @ [w; v])."""
            top = (
                A[(0, 0)] * w[0] + A[(0, 1)] * w[1] + A[(0, 2)] * w[2],
                A[(0, 1)] * w[0] + A[(1, 1)] * w[1] + A[(1, 2)] * w[2],
                A[(0, 2)] * w[0] + A[(1, 2)] * w[1] + A[(2, 2)] * w[2],
            )
            hxv = v_cross(h, v)
            top = v_add(top, hxv)
            bot = v_add(v_scale(v_cross(h, w), -1.0), v_scale(v, s))
            return top, bot

        # ---------------- CRBA mass matrix --------------------------------
        sc = list(s_b)
        hc = list(h_b)
        Ac = [dict(A) for A in A_b]
        for b in range(nb - 1, 0, -1):
            p = parent[b]
            sc[p] = sc[p] + sc[b]
            hc[p] = v_add(hc[p], hc[b])
            for k in Ac[p]:
                Ac[p][k] = Ac[p][k] + Ac[b][k]

        M = {}
        # base-base block in u = [v, w] order:
        #   M[v_i, v_j] = s * delta_ij
        #   M[v_i, w_j] = -skew(h)[i, j]
        #   M[w_i, w_j] = A[i, j]
        z = jnp.zeros_like(s_b[0])
        for i in range(3):
            for j in range(i, 3):
                M[(i, j)] = sc[0] if i == j else z
        h0 = hc[0]
        skew_h = ((z, -h0[2], h0[1]), (h0[2], z, -h0[0]), (-h0[1], h0[0], z))
        for i in range(3):
            for j in range(3):
                M[(i, 3 + j)] = -skew_h[i][j]
        for i in range(3):
            for j in range(i, 3):
                M[(3 + i, 3 + j)] = sym_get(Ac[0], i, j)
        # dof columns
        F = []
        for j in range(nd):
            b = j + 1
            w, v = phi[j]
            Ft, Fb = I_apply(sc[b], hc[b], Ac[b], w, v)
            F.append((Ft, Fb))
            # base rows: M[u_base_i, 6+j] = (B6^T F)_i = swapped F
            for i in range(3):
                M[(i, 6 + j)] = Fb[i]          # v rows take linear part
                M[(3 + i, 6 + j)] = Ft[i]      # w rows take angular part
        for j in range(nd):
            for k in anc_dofs[j + 1]:  # k is an ancestor dof of body j+1 (k <= j)
                wk, vk = phi[k]
                val = v_dot(F[j][0], wk) + v_dot(F[j][1], vk)
                M[(min(6 + k, 6 + j), max(6 + k, 6 + j))] = val
        # uncoupled dof pairs (different branches) are exactly zero
        for i in range(nv):
            for j in range(i, nv):
                if (i, j) not in M:
                    M[(i, j)] = z
        # regularize diagonal
        for i in range(nv):
            M[(i, i)] = M[(i, i)] + cfg.mass_matrix_reg

        G = chol_inverse(M, nv)  # dense symmetric inverse dict

        def G_get(i, j):
            return G[(i, j)] if i <= j else G[(j, i)]

        def minv_vec(x):
            return [
                functools.reduce(
                    lambda a, t: a + t, [G_get(i, k) * x[k] for k in range(nv)])
                for i in range(nv)
            ]

        # ---------------- RNEA bias + free velocity ------------------------
        vs = [(tuple(w0), tuple(v0))]  # spatial [w; v_o]; at base origin v_o = v0
        for b in range(1, nb):
            w_p, v_p = vs[parent[b]]
            pw, pv = phi[b - 1]
            vs.append((v_add(w_p, v_scale(pw, qd[b - 1])),
                       v_add(v_p, v_scale(pv, qd[b - 1]))))
        a0 = ((z, z, z), (z - float(gvec[0]), z - float(gvec[1]), z - float(gvec[2])))
        avp = [a0]
        for b in range(1, nb):
            ap_w, ap_v = avp[parent[b]]
            w_b, v_b = vs[b]
            pw, pv = phi[b - 1]
            mw = v_scale(pw, qd[b - 1])
            mv = v_scale(pv, qd[b - 1])
            # crm(v) m = [w x mw ; vo x mw + w x mv]
            avp.append((v_add(ap_w, v_cross(w_b, mw)),
                        v_add(ap_v, v_add(v_cross(v_b, mw), v_cross(w_b, mv)))))
        f = []
        for b in range(nb):
            w_b, v_b = vs[b]
            Ia_t, Ia_b = I_apply(s_b[b], h_b[b], A_b[b], avp[b][0], avp[b][1])
            Iv_t, Iv_b = I_apply(s_b[b], h_b[b], A_b[b], w_b, v_b)
            # crf(v) F = [w x n + vo x f ; w x f]
            crf_t = v_add(v_cross(w_b, Iv_t), v_cross(v_b, Iv_b))
            crf_b = v_cross(w_b, Iv_b)
            f.append((v_add(Ia_t, crf_t), v_add(Ia_b, crf_b)))
        # C = J^T f via reverse accumulation
        facc = list(f)
        for b in range(nb - 1, 0, -1):
            p = parent[b]
            facc[p] = (v_add(facc[p][0], facc[b][0]), v_add(facc[p][1], facc[b][1]))
        C = [facc[0][1][0], facc[0][1][1], facc[0][1][2],
             facc[0][0][0], facc[0][0][1], facc[0][0][2]]
        for j in range(nd):
            pw, pv = phi[j]
            C.append(v_dot(pw, facc[j + 1][0]) + v_dot(pv, facc[j + 1][1]))

        rhs = [ext[0] - C[0], ext[1] - C[1], ext[2] - C[2],
               ext[3] - C[3], ext[4] - C[4], ext[5] - C[5]]
        for j in range(nd):
            rhs.append(tau[j] - C[6 + j])
        udot = minv_vec(rhs)
        u = [v0[0], v0[1], v0[2], w0[0], w0[1], w0[2]] + qd
        u_free = [u[i] + dt * udot[i] for i in range(nv)]

        # ---------------- contact: plane terrain ---------------------------
        # X_b = J_b G (6 x nv), recursively
        X = [None] * nb
        X[0] = [[G_get(_swap6(r), c) for c in range(nv)] for r in range(6)]
        for b in range(1, nb):
            j = b - 1
            pw, pv = phi[j]
            ph6 = [pw[0], pw[1], pw[2], pv[0], pv[1], pv[2]]
            Xp = X[parent[b]]
            X[b] = [[Xp[r][c] + ph6[r] * G_get(6 + j, c) for c in range(nv)]
                    for r in range(6)]
        # Lam_b = X_b J_b^T (6x6, symmetric; compute upper triangle)
        Lam = []
        for b in range(nb):
            Xb = X[b]
            Lb = {}
            for rr in range(6):
                for ss in range(rr, 6):
                    val = Xb[rr][_swap6(ss)]
                    for j in anc_dofs[b]:
                        pw, pv = phi[j]
                        ph6 = [pw[0], pw[1], pw[2], pv[0], pv[1], pv[2]]
                        val = val + Xb[rr][6 + j] * ph6[ss]
                    Lb[(rr, ss)] = val
            Lam.append(Lb)

        # per-point data; terrain height + normal per point arrive as inputs
        # (plane: h = 0, n = z; trimesh: gathered by the env between substeps,
        # one substep stale — sub-mm at walking speeds)
        pt_pos = []
        pt_r = []
        pt_depth = []
        pt_active = []
        pt_n = []
        for p in range(npt):
            b = int(model.point_body[p])
            lp = tuple(float(x) for x in point_local[p])
            wp = v_add(pos[b], m_vec(R[b], lp))
            pt_pos.append(wp)
            pt_r.append(v_sub(wp, p0))
            # plane mode: h = 0 and n = z baked in (no ph/pn inputs)
            d = (float(point_radius[p]) - wp[2] if plane
                 else read(h_ref, p) + float(point_radius[p]) - wp[2])
            pt_depth.append(d)
            pt_active.append((d > -cfg.contact_margin).astype(jnp.float32))
            pt_n.append(None if plane
                        else tuple(read(n_ref, 3 * p + k) for k in range(3)))

        counts = []
        for b in range(nb):
            cb = None
            for p in body_points[b]:
                cb = pt_active[p] if cb is None else cb + pt_active[p]
            counts.append(cb)
        # D blocks + inverse (normal = z)
        Dinv = []
        mu = []
        rest = []
        vt_z = []
        v_free_bodies = None

        def J_fwd(uvec):
            """forward recursion: body spatial velocities from gen vector."""
            out = [((uvec[3], uvec[4], uvec[5]), (uvec[0], uvec[1], uvec[2]))]
            for b2 in range(1, nb):
                w_p, v_p = out[parent[b2]]
                pw2, pv2 = phi[b2 - 1]
                out.append((v_add(w_p, v_scale(pw2, uvec[6 + b2 - 1])),
                            v_add(v_p, v_scale(pv2, uvec[6 + b2 - 1]))))
            return out

        v_free_bodies = J_fwd(u_free)

        def point_vel(vbodies, p):
            b2 = int(model.point_body[p])
            w_b, v_b = vbodies[b2]
            return v_add(v_b, v_cross(w_b, pt_r[p]))

        for p in range(npt):
            b = int(model.point_body[p])
            L = Lam[b]

            def Lg(i, j):
                return L[(i, j)] if i <= j else L[(j, i)]
            r = pt_r[p]
            # D = Lvv - rx Lww rx - rx Lwv + Lvw rx   (3x3, symmetric)
            # expand with explicit skew multiplications
            def sk_left(Arows):  # skew(r) @ A, A given as rows function
                return [
                    [r[1] * Arows[2][j] - r[2] * Arows[1][j] for j in range(3)],
                    [r[2] * Arows[0][j] - r[0] * Arows[2][j] for j in range(3)],
                    [r[0] * Arows[1][j] - r[1] * Arows[0][j] for j in range(3)],
                ]

            def sk_right(Arows):  # A @ skew(r)
                return [
                    [Arows[i][1] * r[2] - Arows[i][2] * r[1],
                     Arows[i][2] * r[0] - Arows[i][0] * r[2],
                     Arows[i][0] * r[1] - Arows[i][1] * r[0]]
                    for i in range(3)
                ]
            Lww = [[Lg(i, j) for j in range(3)] for i in range(3)]
            Lwv = [[Lg(i, 3 + j) for j in range(3)] for i in range(3)]
            Lvw = [[Lg(3 + i, j) for j in range(3)] for i in range(3)]
            Lvv = [[Lg(3 + i, 3 + j) for j in range(3)] for i in range(3)]
            t1 = sk_right(sk_left(Lww))
            t2 = sk_left(Lwv)
            t3 = sk_right(Lvw)
            split = jnp.maximum(counts[b], 1.0)
            D = [[(Lvv[i][j] - t1[i][j] - t2[i][j] + t3[i][j]) * split
                  for j in range(3)] for i in range(3)]
            for i in range(3):
                D[i][i] = D[i][i] + 1e-8
            # closed-form 3x3 inverse
            a, b_, c = D[0]
            d_, e, f_ = D[1]
            g, h, i_ = D[2]
            co_a = e * i_ - f_ * h
            co_b = c * h - b_ * i_
            co_c = b_ * f_ - c * e
            det = a * co_a + d_ * co_b + g * co_c
            idet = 1.0 / det
            Dinv.append([
                [co_a * idet, co_b * idet, co_c * idet],
                [(f_ * g - d_ * i_) * idet, (a * i_ - c * g) * idet, (c * d_ - a * f_) * idet],
                [(d_ * h - e * g) * idet, (b_ * g - a * h) * idet, (a * e - b_ * d_) * idet],
            ])
            sh = point_shape[p]
            mu.append(0.5 * (read(fric_ref, sh) + cfg.terrain_friction))
            rest.append(0.5 * (read(rest_ref, sh) + cfg.terrain_restitution))
            nrm = pt_n[p]
            vn_pre = (point_vel(v_free_bodies, p)[2] if plane
                      else v_dot(point_vel(v_free_bodies, p), nrm))
            pushout = jnp.minimum(
                cfg.baumgarte * jnp.maximum(pt_depth[p] - cfg.contact_slop, 0.0) / dt,
                cfg.max_pushout_vel)
            bounce = jnp.where(vn_pre < -cfg.bounce_threshold, -rest[p] * vn_pre, 0.0)
            s_n = jnp.maximum(pushout, bounce)
            # plane mode: the target velocity is purely vertical — keep the
            # scalar; general mode keeps the full vector along the normal
            vt_z.append(s_n if plane else v_scale(nrm, s_n))

        lam = [(z, z, z) for _ in range(npt)]

        def wrench_and_du(lam_list):
            wr = []
            for b in range(nb):
                tq = (z, z, z)
                fc = (z, z, z)
                for p in body_points[b]:
                    tq = v_add(tq, v_cross(pt_r[p], lam_list[p]))
                    fc = v_add(fc, lam_list[p])
                wr.append((tq, fc))
            acc = list(wr)
            for b in range(nb - 1, 0, -1):
                pidx = parent[b]
                acc[pidx] = (v_add(acc[pidx][0], acc[b][0]), v_add(acc[pidx][1], acc[b][1]))
            s_vec = [acc[0][1][0], acc[0][1][1], acc[0][1][2],
                     acc[0][0][0], acc[0][0][1], acc[0][0][2]]
            for j in range(nd):
                pw, pv = phi[j]
                s_vec.append(v_dot(pw, acc[j + 1][0]) + v_dot(pv, acc[j + 1][1]))
            return wr, minv_vec(s_vec)

        for _ in range(cfg.solver_iterations):
            _, du = wrench_and_du(lam)
            vb = J_fwd([u_free[i] + du[i] for i in range(nv)])
            new_lam = []
            for p in range(npt):
                vp = point_vel(vb, p)
                if plane:
                    dv = (-vp[0], -vp[1], vt_z[p] - vp[2])
                else:
                    vt = vt_z[p]
                    dv = (vt[0] - vp[0], vt[1] - vp[1], vt[2] - vp[2])
                Di = Dinv[p]
                dl = tuple(
                    Di[i][0] * dv[0] + Di[i][1] * dv[1] + Di[i][2] * dv[2]
                    for i in range(3))
                l_new = tuple(lam[p][k] + cfg.relaxation * dl[k] for k in range(3))
                a_p = pt_active[p]
                if plane:
                    # friction-cone projection about z (normal baked in)
                    ln = jnp.maximum(l_new[2], 0.0)
                    lt = jnp.sqrt(l_new[0] ** 2 + l_new[1] ** 2 + 1e-18)
                    scale = jnp.minimum(1.0, mu[p] * ln / lt)
                    new_lam.append((l_new[0] * scale * a_p,
                                    l_new[1] * scale * a_p,
                                    ln * a_p))
                    continue
                # friction-cone projection about the terrain normal
                nrm = pt_n[p]
                ldn = v_dot(l_new, nrm)
                ln = jnp.maximum(ldn, 0.0)
                lt_vec = v_sub(l_new, v_scale(nrm, ldn))
                lt = jnp.sqrt(lt_vec[0] ** 2 + lt_vec[1] ** 2 + lt_vec[2] ** 2 + 1e-18)
                scale = jnp.minimum(1.0, mu[p] * ln / lt)
                new_lam.append(tuple(
                    (nrm[k] * ln + lt_vec[k] * scale) * a_p for k in range(3)))
            lam = new_lam

        wr, du = wrench_and_du(lam)
        u_new = [u_free[i] + du[i] for i in range(nv)]

        # ---------------- integrate ----------------------------------------
        wxv = v_cross(w0, v0)
        v_new = (u_new[0] + dt * wxv[0], u_new[1] + dt * wxv[1], u_new[2] + dt * wxv[2])
        w_new = (u_new[3], u_new[4], u_new[5])
        for k in range(3):
            o_v0[k, 0] = v_new[k]
            o_w0[k, 0] = w_new[k]
            o_rp[k, 0] = p0[k] + dt * v_new[k]
        # quat exponential update
        ang = jnp.sqrt(w_new[0] ** 2 + w_new[1] ** 2 + w_new[2] ** 2 + 1e-18)
        half = 0.5 * dt * ang
        sc_ = jnp.sin(half) / ang
        dw = jnp.cos(half)
        dx, dy, dz = w_new[0] * sc_, w_new[1] * sc_, w_new[2] * sc_
        qw, qx, qy, qz = quat
        nqw = dw * qw - dx * qx - dy * qy - dz * qz
        nqx = dw * qx + dx * qw + dy * qz - dz * qy
        nqy = dw * qy - dx * qz + dy * qw + dz * qx
        nqz = dw * qz + dx * qy - dy * qx + dz * qw
        norm = jax.lax.rsqrt(nqw * nqw + nqx * nqx + nqy * nqy + nqz * nqz)
        o_rq[0, 0] = nqw * norm
        o_rq[1, 0] = nqx * norm
        o_rq[2, 0] = nqy * norm
        o_rq[3, 0] = nqz * norm
        for j in range(nd):
            qdn = u_new[6 + j]
            qn = q[j] + dt * qdn
            lo, hi = float(model.dof_lower[j]), float(model.dof_upper[j])
            at_lo = qn < lo
            at_hi = qn > hi
            qn = jnp.clip(qn, lo, hi)
            qdn = jnp.where(at_lo, jnp.maximum(qdn, 0.0), qdn)
            qdn = jnp.where(at_hi, jnp.minimum(qdn, 0.0), qdn)
            o_q[j, 0] = qn
            o_qd[j, 0] = qdn
        for b in range(nb):
            for k in range(3):
                o_f[3 * b + k, 0] = wr[b][1][k] / dt
        # feet poses for the env layer (start-of-substep FK; one substep
        # stale relative to the integrated state, <1 mm at walking speeds)
        for fi, b in enumerate(feet_indices):
            for k in range(3):
                o_feet[12 * fi + k, 0] = pos[b][k]
            for k in range(9):
                o_feet[12 * fi + 3 + k, 0] = R[b][k]
        # contact-point xy for the env's terrain gather feeding the next
        # substep's h/n inputs (general mode only; plane needs no gather)
        if not plane:
            for p in range(npt):
                o_ptxy[2 * p, 0] = pt_pos[p][0]
                o_ptxy[2 * p + 1, 0] = pt_pos[p][1]

    # ------------------------------------------------------------------
    def pack(x, comp):
        """[B, comp] -> [comp, G, 8, 128].

        Batches that are not a multiple of BT are padded up by replicating
        the last env (a valid state, so the padded lanes compute finite
        garbage that unpack() discards).  This lifts the round-1
        num_envs % 1024 restriction so per-device shards of any size run
        through the kernel (e.g. 512 envs/device under an 8-way dp mesh)."""
        B = x.shape[0]
        pad = (-B) % BT
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0)
        return x.T.reshape(comp, (B + pad) // BT, 8, 128)

    def unpack(x, batch=None):
        """[comp, G, 8, 128] -> [B, comp]; batch slices off pack()'s pad."""
        comp = x.shape[0]
        out = x.reshape(comp, -1).T
        return out if batch is None else out[:batch]

    def pack_sim(state: SimState):
        """SimState -> tuple of packed arrays (kernel layout)."""
        return (pack(state.root_pos, 3), pack(state.root_quat, 4),
                pack(state.root_lin_vel, 3), pack(state.root_ang_vel, 3),
                pack(state.q, nd), pack(state.qd, nd))

    def unpack_sim(psim, batch=None):
        return SimState(
            root_pos=unpack(psim[0], batch), root_quat=unpack(psim[1], batch),
            root_lin_vel=unpack(psim[2], batch), root_ang_vel=unpack(psim[3], batch),
            q=unpack(psim[4], batch), qd=unpack(psim[5], batch))

    def pack_dyn(dyn):
        """DynParams -> tuple of packed arrays (invariant across substeps;
        pack once per control step, not per substep)."""
        B = dyn.body_mass.shape[0]
        in6 = jnp.stack([
            dyn.body_inertia[..., 0, 0], dyn.body_inertia[..., 1, 1],
            dyn.body_inertia[..., 2, 2], dyn.body_inertia[..., 0, 1],
            dyn.body_inertia[..., 0, 2], dyn.body_inertia[..., 1, 2],
        ], axis=-1)
        return (pack(dyn.body_mass, nb),
                pack(dyn.body_com.reshape(B, nb * 3), nb * 3),
                pack(in6.reshape(B, nb * 6), nb * 6),
                pack(dyn.shape_friction, dyn.shape_friction.shape[1]),
                pack(dyn.shape_restitution, dyn.shape_restitution.shape[1]))

    def packed_call(psim, pdyn, ptau, pext, ph=None, pn=None):
        """Fully packed kernel invocation: everything in [comp, G, 8, 128].
        Returns (psim', pforces, pfeet, pptxy) still packed — the fast inner
        loop keeps state packed across all substeps.  In plane mode ph/pn
        must be omitted and pptxy comes back as None (no terrain DMA)."""
        G = psim[0].shape[1]
        args = list(psim) + list(pdyn) + [ptau, pext]
        if not plane:
            args += [ph, pn]
        out_shapes = [
            jax.ShapeDtypeStruct((3, G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((4, G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nd, G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nd, G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb * 3, G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nf * 12, G, 8, 128), jnp.float32),
        ]
        if not plane:
            out_shapes.append(
                jax.ShapeDtypeStruct((npt * 2, G, 8, 128), jnp.float32))

        def spec(comp):
            return pl.BlockSpec((comp, 1, 8, 128), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)

        if interpret == "emulate":
            blocks = []
            for i in range(G):
                in_refs = [_EmuInRef(a[:, i:i + 1]) for a in args]
                out_refs = [_EmuOutRef((s.shape[0], 1, 8, 128), s.dtype)
                            for s in out_shapes]
                kernel(*in_refs, *out_refs)
                blocks.append([r.assemble() for r in out_refs])
            outs = [jnp.concatenate([b[j] for b in blocks], axis=1)
                    for j in range(len(out_shapes))]
        else:
            in_specs = [spec(a.shape[0]) for a in args]
            out_specs = [spec(s.shape[0]) for s in out_shapes]
            outs = pl.pallas_call(
                kernel,
                grid=(G,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=bool(interpret),
                # the default 16 MB scoped-VMEM cap fits the 12-DoF body;
                # the 23-DoF serial tree (121 points, 24 bodies) needs
                # ~21 MB of scheduling headroom
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(*args)
        return (tuple(outs[:6]), outs[6], outs[7],
                None if plane else outs[8])

    def step_terrain(state: SimState, dyn, tau, ext_force, ext_torque,
                     point_heights, point_normals):
        """General form: per-point terrain heights [B, npt] and normals
        [B, npt, 3] as inputs; also returns the contact-point xy [B, npt, 2]
        for the caller's terrain gather feeding the next substep.  Not
        available when the kernel was specialized with plane=True."""
        if plane:
            raise ValueError(
                "terrain_form is unavailable on a plane-specialized kernel; "
                "build make_substep_pallas(..., plane=False) for trimesh")
        B = state.q.shape[0]
        psim, pforces, pfeet, pptxy = packed_call(
            pack_sim(state), pack_dyn(dyn), pack(tau, nd),
            pack(jnp.concatenate([ext_force, ext_torque], axis=-1), 6),
            pack(point_heights, npt),
            pack(point_normals.reshape(B, npt * 3), npt * 3))
        new_state = unpack_sim(psim, B)
        forces = unpack(pforces, B).reshape(B, nb, 3)
        feet = unpack(pfeet, B).reshape(B, nf, 12)
        feet_pos = feet[:, :, 0:3]
        feet_R = feet[:, :, 3:12].reshape(B, nf, 3, 3)
        pt_xy = unpack(pptxy, B).reshape(B, npt, 2)
        return new_state, forces, feet_pos, feet_R, pt_xy

    def step(state: SimState, dyn, tau, ext_force, ext_torque):
        """Plane-terrain form matching engine.make_substep's signature."""
        B = state.q.shape[0]
        if plane:
            psim, pforces, pfeet, _ = packed_call(
                pack_sim(state), pack_dyn(dyn), pack(tau, nd),
                pack(jnp.concatenate([ext_force, ext_torque], axis=-1), 6))
            new_state = unpack_sim(psim, B)
            forces = unpack(pforces, B).reshape(B, nb, 3)
            feet = unpack(pfeet, B).reshape(B, nf, 12)
            return (new_state, forces, feet[:, :, 0:3],
                    feet[:, :, 3:12].reshape(B, nf, 3, 3))
        h = jnp.zeros((B, npt))
        n = jnp.zeros((B, npt, 3)).at[:, :, 2].set(1.0)
        out = step_terrain(state, dyn, tau, ext_force, ext_torque, h, n)
        return out[0], out[1], out[2], out[3]

    step.plane = plane
    step.terrain_form = step_terrain
    step.packed_call = packed_call
    step.pack_sim = pack_sim
    step.unpack_sim = unpack_sim
    step.pack_dyn = pack_dyn
    step.pack = pack
    step.unpack = unpack
    return step
