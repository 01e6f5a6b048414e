"""Fully-fused beam FEA kernel: assembly + BCs + scaling + solve + forces.

The split pipeline (XLA assembly -> Pallas solve) materializes the
(B, nelem, 6, 6) element-stiffness table in HBM every optimizer iteration
(~118 MB at B=8192) plus the banded system itself.  This kernel takes only
the raw scenario arrays — I, element lengths, constraint masks, nodal loads,
UDL — and performs the entire linear-static analysis in VMEM:

  element stiffness coefficients -> block-tridiagonal assembly ->
  constraint masking -> Jacobi scaling -> block-Thomas solve
  [-> compensated-residual refinement] -> displacement unscaling ->
  element end-force recovery (shear V, moment M).

Everything is (sublane, lane) element-wise VPU work with the scenario batch
across lanes, like ops/block_tridiag.py.  Outputs: u (B, n, 3), V and M
(B, nelem) — exactly the fields the optimizer loss and the dataset schema
consume (OpenPyStruct_BeamOpt.py:128-144).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpystruct_tpu.ops.block_tridiag import (
    LANES,
    SUB,
    TILE,
    _inv3_slabs,
    _mm,
    _mv,
    _sub_m,
    _sub_v,
    _t,
)

_SPLIT = 4097.0  # Dekker split constant for float32


def _two_prod(a, b):
    p = a * b
    ca = _SPLIT * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = _SPLIT * b
    bhi = cb - (cb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _beam_kernel(
    refine,  # static (functools.partial)
    I_ref,     # (1, nelem, S, L)
    Le_ref,    # (1, nelem, S, L)
    free_ref,  # (1, n, 3, S, L) float 0/1 mask of free DOFs
    load_ref,  # (1, n, S, L) nodal Fy
    udl_ref,   # (1, 1, S, L)
    ea_ref,    # (1, 1, S, L)  E*A broadcast
    e_ref,     # (1, 1, S, L)  E broadcast
    u_out,     # (1, n, 3, S, L)
    V_out,     # (1, nelem, S, L)
    M_out,     # (1, nelem, S, L)
    piv_out,   # (1, 1, S, L) min |det S| over the factorization sweep
    ks_scr,    # (nelem, 5, S, L): ea/Le, 12EI/Le^3, 6EI/Le^2, 4EI/Le, 2EI/Le
    diag_scr,  # (n, 3, 3, S, L)
    upper_scr,  # (n, 3, 3, S, L) (last block zero)
    f_scr,     # (n, 3, S, L)
    s_scr,     # (n, 3, S, L) Jacobi scales
    c_scr,     # (n, 3, 3, S, L)
    y_scr,     # (n, 3, S, L)
    r_scr,     # (n, 3, S, L) refinement work vector (keeps f_scr intact)
):
    nelem = I_ref.shape[1]
    n = nelem + 1
    E = e_ref[0, 0]
    EA = ea_ref[0, 0]
    w = udl_ref[0, 0]
    zero = jnp.zeros_like(E)

    # --- element stiffness coefficients ---------------------------------
    def ks_body(j, _):
        Le = Le_ref[0, j]
        I = I_ref[0, j]
        inv_le = 1.0 / Le
        eil = E * I * inv_le
        eil2 = eil * inv_le
        eil3 = eil2 * inv_le
        ks_scr[j, 0] = EA * inv_le
        ks_scr[j, 1] = 12.0 * eil3
        ks_scr[j, 2] = 6.0 * eil2
        ks_scr[j, 3] = 4.0 * eil
        ks_scr[j, 4] = 2.0 * eil
        return 0

    jax.lax.fori_loop(0, nelem, ks_body, 0)

    # --- assembly + consistent loads + constraints + Jacobi scaling -----
    def asm_body(i, _):
        has_prev = i > 0
        has_next = i < nelem

        def ks_of(j, active):
            # masked read: inactive -> zeros
            jj = jnp.clip(j, 0, nelem - 1)
            m = jnp.where(active, 1.0, 0.0).astype(I_ref.dtype)
            return [ks_scr[jj, k] * m for k in range(5)]

        ea_p, k11_p, k12_p, k13_p, _k2p = ks_of(i - 1, has_prev)
        ea_n, k11_n, k12_n, k13_n, k2_n = ks_of(i, has_next)

        # diag block: lower-right of elem i-1 + upper-left of elem i
        d00 = ea_p + ea_n
        d11 = k11_p + k11_n
        d12 = -k12_p + k12_n
        d22 = k13_p + k13_n

        # consistent UDL loads
        Le_p = jnp.where(has_prev, Le_ref[0, jnp.clip(i - 1, 0, nelem - 1)],
                         zero)
        Le_n = jnp.where(has_next, Le_ref[0, jnp.clip(i, 0, nelem - 1)],
                         zero)
        fy = load_ref[0, i] + w * (Le_p + Le_n) * 0.5
        fm = w * (Le_n * Le_n - Le_p * Le_p) / 12.0

        free = [free_ref[0, i, a] for a in range(3)]
        con = [1.0 - fa for fa in free]

        # masked diag: zero rows/cols of constrained DOFs, original
        # diagonal entry back on the diagonal
        diag_scr[i, 0, 0] = d00 * free[0] * free[0] + con[0] * d00
        diag_scr[i, 0, 1] = zero
        diag_scr[i, 0, 2] = zero
        diag_scr[i, 1, 0] = zero
        diag_scr[i, 1, 1] = d11 * free[1] * free[1] + con[1] * d11
        diag_scr[i, 1, 2] = d12 * free[1] * free[2]
        diag_scr[i, 2, 0] = zero
        diag_scr[i, 2, 1] = d12 * free[2] * free[1]
        diag_scr[i, 2, 2] = d22 * free[2] * free[2] + con[2] * d22

        # upper block couples node i to i+1 (element i); zero at the end
        free_n = [free_ref[0, jnp.clip(i + 1, 0, n - 1), a] for a in range(3)]
        u00 = -ea_n
        u11 = -k11_n
        u12 = k12_n
        u21 = -k12_n
        u22 = k2_n
        upper_scr[i, 0, 0] = u00 * free[0] * free_n[0]
        upper_scr[i, 0, 1] = zero
        upper_scr[i, 0, 2] = zero
        upper_scr[i, 1, 0] = zero
        upper_scr[i, 1, 1] = u11 * free[1] * free_n[1]
        upper_scr[i, 1, 2] = u12 * free[1] * free_n[2]
        upper_scr[i, 2, 0] = zero
        upper_scr[i, 2, 1] = u21 * free[2] * free_n[1]
        upper_scr[i, 2, 2] = u22 * free[2] * free_n[2]

        f_scr[i, 0] = zero
        f_scr[i, 1] = fy * free[1]
        f_scr[i, 2] = fm * free[2]
        return 0

    jax.lax.fori_loop(0, n, asm_body, 0)

    # Jacobi scaling s = rsqrt(diag entries); scale diag/upper/f in place
    def scale_body(i, _):
        for a in range(3):
            s_scr[i, a] = jax.lax.rsqrt(diag_scr[i, a, a])
        for a in range(3):
            for b in range(3):
                diag_scr[i, a, b] = (
                    diag_scr[i, a, b] * s_scr[i, a] * s_scr[i, b]
                )
        f_scr[i, 0] = f_scr[i, 0] * s_scr[i, 0]
        f_scr[i, 1] = f_scr[i, 1] * s_scr[i, 1]
        f_scr[i, 2] = f_scr[i, 2] * s_scr[i, 2]
        return 0

    jax.lax.fori_loop(0, n, scale_body, 0)

    def scale_upper_body(i, _):
        for a in range(3):
            for b in range(3):
                upper_scr[i, a, b] = (
                    upper_scr[i, a, b] * s_scr[i, a] * s_scr[i + 1, b]
                )
        return 0

    jax.lax.fori_loop(0, n - 1, scale_upper_body, 0)

    # --- block-Thomas factor + solve ------------------------------------
    def read_mat(ref, i):
        return [[ref[i, a, b] for b in range(3)] for a in range(3)]

    def read_vec(ref, i):
        return [ref[i, a] for a in range(3)]

    def _det3(m):
        a, b, c = m[0]
        d, e, f = m[1]
        g, h, i_ = m[2]
        return (a * (e * i_ - f * h) - b * (d * i_ - f * g)
                + c * (d * h - e * g))

    d0 = read_mat(diag_scr, 0)
    sinv0 = _inv3_slabs(d0)
    c0 = _mm(sinv0, read_mat(upper_scr, 0))
    y0 = _mv(sinv0, read_vec(f_scr, 0))
    for a in range(3):
        for b in range(3):
            c_scr[0, a, b] = c0[a][b]
        y_scr[0, a] = y0[a]

    def fwd(min_det, i):
        lm = _t(read_mat(upper_scr, i - 1))
        c_prev = read_mat(c_scr, i - 1)
        s = _sub_m(read_mat(diag_scr, i), _mm(lm, c_prev))
        sinv = _inv3_slabs(s)
        cc = _mm(sinv, read_mat(upper_scr, i))
        y = _mv(sinv, _sub_v(read_vec(f_scr, i),
                             _mv(lm, read_vec(y_scr, i - 1))))
        for a in range(3):
            for b in range(3):
                c_scr[i, a, b] = cc[a][b]
            y_scr[i, a] = y[a]
        return jnp.minimum(min_det, jnp.abs(_det3(s)))

    min_det = jax.lax.fori_loop(
        1, n, lambda i, md: fwd(md, i), jnp.abs(_det3(d0))
    )
    piv_out[0, 0] = min_det

    # back substitution: x overwrites y_scr
    def bwd(k, _):
        i = n - 2 - k
        x = _sub_v(read_vec(y_scr, i),
                   _mv(read_mat(c_scr, i), read_vec(y_scr, i + 1)))
        for a in range(3):
            y_scr[i, a] = x[a]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)

    # --- compensated-residual refinement (static unroll) ----------------
    for _ in range(refine):
        # Pass 1: r = f - K x via error-free transformations, band reads
        # masked at the boundaries (no predication needed); r is staged in
        # u_out (same (n, 3) shape) before the correction solve.
        def resid_body(i, _):
            one = jnp.ones_like(f_scr[0, 0])
            m_prev = jnp.where(i > 0, one, 0.0 * one)
            m_next = jnp.where(i < n - 1, one, 0.0 * one)
            ip = jnp.maximum(i - 1, 0)
            iq = jnp.minimum(i, n - 2)
            inx = jnp.minimum(i + 1, n - 1)
            x_i = read_vec(y_scr, i)
            x_p = [y_scr[ip, b] * m_prev for b in range(3)]
            x_n = [y_scr[inx, b] * m_next for b in range(3)]
            m_d = read_mat(diag_scr, i)
            lm = _t(read_mat(upper_scr, ip))       # masked via x_p
            um = read_mat(upper_scr, iq)           # masked via x_n
            for a in range(3):
                acc_s = f_scr[i, a]
                acc_c = jnp.zeros_like(acc_s)
                for b in range(3):
                    for mat, vec in ((m_d, x_i), (lm, x_p), (um, x_n)):
                        p, e = _two_prod(-mat[a][b], vec[b])
                        acc_s, e2 = _two_sum(acc_s, p)
                        acc_c = acc_c + e2 + e
                u_out[0, i, a] = acc_s + acc_c
            return 0

        jax.lax.fori_loop(0, n, resid_body, 0)

        # Pass 2: solve K dx = r with the saved factors (c_scr holds C,
        # and we refactor Sinv on the fly is NOT saved — redo substitution
        # using diag/upper requires Sinv; instead store dx via a fresh
        # forward/backward using c_scr and recomputed Sinv would double
        # work.  Simpler: rerun the full Thomas on r (still VMEM-resident).
        sinv0 = _inv3_slabs(read_mat(diag_scr, 0))
        c0 = _mm(sinv0, read_mat(upper_scr, 0))
        r0 = [u_out[0, 0, a] for a in range(3)]
        y0 = _mv(sinv0, r0)
        for a in range(3):
            for b in range(3):
                c_scr[0, a, b] = c0[a][b]
            r_scr[0, a] = y0[a]

        def fwd2(i, _):
            lm = _t(read_mat(upper_scr, i - 1))
            c_prev = read_mat(c_scr, i - 1)
            s = _sub_m(read_mat(diag_scr, i), _mm(lm, c_prev))
            sinv = _inv3_slabs(s)
            cc = _mm(sinv, read_mat(upper_scr, i))
            r_i = [u_out[0, i, a] for a in range(3)]
            yv = _mv(sinv, _sub_v(r_i, _mv(lm, read_vec(r_scr, i - 1))))
            for a in range(3):
                for b in range(3):
                    c_scr[i, a, b] = cc[a][b]
                r_scr[i, a] = yv[a]
            return 0

        jax.lax.fori_loop(1, n, fwd2, 0)

        def bwd2(k, _):
            i = n - 2 - k
            dx = _sub_v(read_vec(r_scr, i),
                        _mv(read_mat(c_scr, i), read_vec(r_scr, i + 1)))
            for a in range(3):
                r_scr[i, a] = dx[a]
            return 0

        jax.lax.fori_loop(0, n - 1, bwd2, 0)

        def addcorr(i, _):
            for a in range(3):
                y_scr[i, a] = y_scr[i, a] + r_scr[i, a]
            return 0

        jax.lax.fori_loop(0, n, addcorr, 0)

    # --- unscale displacements + write u --------------------------------
    def unscale_body(i, _):
        for a in range(3):
            u_out[0, i, a] = y_scr[i, a] * s_scr[i, a]
        return 0

    jax.lax.fori_loop(0, n, unscale_body, 0)

    # --- element end-force recovery (V, M at the start node) -----------
    # local p = k_e @ [u_i; u_j] - f_eq;  V = p[1], M = p[2]
    def force_body(j, _):
        k11 = ks_scr[j, 1]
        k12 = ks_scr[j, 2]
        k13 = ks_scr[j, 3]
        k2 = ks_scr[j, 4]
        Le = Le_ref[0, j]
        uy_i = u_out[0, j, 1]
        th_i = u_out[0, j, 2]
        uy_j = u_out[0, j + 1, 1]
        th_j = u_out[0, j + 1, 2]
        V = (
            k11 * uy_i + k12 * th_i - k11 * uy_j + k12 * th_j
            - w * Le * 0.5
        )
        M = (
            k12 * uy_i + k13 * th_i - k12 * uy_j + k2 * th_j
            - w * Le * Le / 12.0
        )
        V_out[0, j] = V
        M_out[0, j] = M
        return 0

    jax.lax.fori_loop(0, nelem, force_body, 0)


def _to_slab(x, tail_dims):
    """(B, d1, ..., dk) -> (T, d1, ..., dk, SUB, LANES)."""
    B = x.shape[0]
    T = max((B + TILE - 1) // TILE, 1)
    pad = T * TILE - B
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    x = x.reshape((T, SUB, LANES) + x.shape[1:])
    perm = (0,) + tuple(range(3, 3 + tail_dims)) + (1, 2)
    return x.transpose(perm), B, T


def _from_slab(x, B):
    nd = x.ndim
    perm = (0, nd - 2, nd - 1) + tuple(range(1, nd - 2))
    x = x.transpose(perm)
    return x.reshape((-1,) + x.shape[3:])[:B]


@functools.partial(
    jax.jit, static_argnames=("E", "A", "refine", "interpret")
)
def pallas_beam_analysis(I, Le, free_mask, point_loads, udl,
                         E: float, A: float, refine: int = 1,
                         interpret: bool = False):
    """Fused batched beam FEA.

    Args:
      I: (B, nelem) moments of inertia.
      Le: (B, nelem) element lengths.
      free_mask: (B, n, 3) float 0/1 — 1 where the DOF is free.
      point_loads: (B, n) nodal Fy.
      udl: (B,) uniform load per scenario.
      E, A: material constants (static).
      refine: compensated-refinement sweeps (static unroll).

    Returns (u (B, n, 3), V (B, nelem), M (B, nelem), pivot (B,)) where
    ``pivot`` is the minimum Schur-pivot determinant of the Jacobi-scaled
    factorization — the singularity diagnostic of
    ``fem.solve.block_tridiag_min_pivot``, captured for free during the
    forward sweep (so datagen needs no separate factorization pass).
    """
    B, nelem = I.shape
    n = nelem + 1
    dtype = I.dtype

    I_s, B0, T = _to_slab(I, 1)
    Le_s, _, _ = _to_slab(Le, 1)
    free_s, _, _ = _to_slab(free_mask.astype(dtype), 2)
    load_s, _, _ = _to_slab(point_loads, 1)
    udl_s, _, _ = _to_slab(udl[:, None], 1)
    if T * TILE > B0:
        # padded lanes: free everything and set I=1, Le=1 -> well-posed
        lane_ids = jnp.arange(T * TILE).reshape(T, SUB, LANES)
        padm = (lane_ids >= B0)
        I_s = jnp.where(padm[:, None], 1.0, I_s)
        Le_s = jnp.where(padm[:, None], 1.0, Le_s)
        free_s = jnp.where(padm[:, None, None], 0.0, free_s)

    ea = jnp.full((T, 1, SUB, LANES), E * A, dtype)
    ee = jnp.full((T, 1, SUB, LANES), E, dtype)

    def spec(*block):
        nd = len(block)
        return pl.BlockSpec(
            (1,) + tuple(block),
            lambda t, nd=nd: (t,) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            spec(nelem, SUB, LANES),      # I
            spec(nelem, SUB, LANES),      # Le
            spec(n, 3, SUB, LANES),       # free
            spec(n, SUB, LANES),          # loads
            spec(1, SUB, LANES),          # udl
            spec(1, SUB, LANES),          # EA
            spec(1, SUB, LANES),          # E
        ],
        out_specs=[
            spec(n, 3, SUB, LANES),       # u
            spec(nelem, SUB, LANES),      # V
            spec(nelem, SUB, LANES),      # M
            spec(1, SUB, LANES),          # pivot
        ],
        scratch_shapes=[
            pltpu.VMEM((nelem, 5, SUB, LANES), dtype),   # ks
            pltpu.VMEM((n, 3, 3, SUB, LANES), dtype),    # diag
            pltpu.VMEM((n, 3, 3, SUB, LANES), dtype),    # upper
            pltpu.VMEM((n, 3, SUB, LANES), dtype),       # f
            pltpu.VMEM((n, 3, SUB, LANES), dtype),       # s
            pltpu.VMEM((n, 3, 3, SUB, LANES), dtype),    # c
            pltpu.VMEM((n, 3, SUB, LANES), dtype),       # y
            pltpu.VMEM((n, 3, SUB, LANES), dtype),       # r
        ],
    )
    u_s, V_s, M_s, piv_s = pl.pallas_call(
        functools.partial(_beam_kernel, refine),
        out_shape=[
            jax.ShapeDtypeStruct((T, n, 3, SUB, LANES), dtype),
            jax.ShapeDtypeStruct((T, nelem, SUB, LANES), dtype),
            jax.ShapeDtypeStruct((T, nelem, SUB, LANES), dtype),
            jax.ShapeDtypeStruct((T, 1, SUB, LANES), dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(I_s, Le_s, free_s, load_s, udl_s, ea, ee)
    return (
        _from_slab(u_s, B0),
        _from_slab(V_s, B0),
        _from_slab(M_s, B0),
        _from_slab(piv_s, B0)[:, 0],
    )
