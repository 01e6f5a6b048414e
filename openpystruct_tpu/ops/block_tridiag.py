"""Batched block-tridiagonal (3x3 blocks) Thomas solver as a Pallas kernel.

This is the FE hot loop of the whole framework (SURVEY.md section 7 step 1):
every beam FEA solve in the optimizer/datagen is one symmetric
block-tridiagonal system.  The ``lax.scan`` reference implementation in
``fem.solve`` round-trips HBM on every one of the ~101 recurrence steps; this
kernel keeps the entire factorization state in VMEM and lays the scenario
batch across the vector lanes, so each Thomas step is pure (sublane, lane)
element-wise VPU work:

  layout: (grid tile, n, 3, 3, SUB, 128) — a (SUB, 128) slab per matrix
  component, one scenario per lane; all 3x3 algebra is unrolled Python over
  static component indices.

The kernel assumes the symmetric case (lower = upper^T), which is what the
beam stiffness produces (OpenSees BandSPD, OpenPyStruct_BeamOpt.py:122).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 4       # sublanes per slab (4 keeps total VMEM under the 16MB core
              # limit: scratch + double-buffered inputs ~ 10.5MB at n=101)
LANES = 128   # lanes per slab
TILE = SUB * LANES  # scenarios per grid program

# Empirical VMEM ceiling for the n-proportional slab working set (v5e).
# Counted as floats-per-node x n x sub x LANES x 4B; the fused analysis
# kernel (~61 floats/node) compiles at n=151/sub=4 (~19 MB by this count)
# and fails at n=201/sub=4 (~25 MB), so 20 MB splits the regimes.
_VMEM_BUDGET = 20 * 2**20


def pick_sub(n_nodes: int, floats_per_node: int):
    """Largest slab depth (sublanes/slab) whose n-proportional VMEM
    footprint fits; None when even sub=1 cannot fit (callers fall back to
    the XLA scan path).  Halving sub halves VMEM per grid step and doubles
    the grid, trading a little per-step efficiency for 2x the mesh size."""
    for s in (SUB, 2, 1):
        if floats_per_node * n_nodes * s * LANES * 4 <= _VMEM_BUDGET:
            return s
    return None


def _inv3_det(m):
    """Cofactor inverse of a 3x3 block plus its determinant.

    Precision-polymorphic: entries may be plain (SUB, 128) slabs or DD
    values (ops/dd.py) — one implementation serves the f32 and dd
    kernels (the det feeds the dd min-Schur-pivot diagnostic).
    m: list[3][3]; returns (inverse in the same structure, det)."""
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i = m[2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    inv = [
        [A * inv_det, D * inv_det, G * inv_det],
        [B * inv_det, E * inv_det, H * inv_det],
        [C * inv_det, F * inv_det, I * inv_det],
    ]
    return inv, det


def _inv3_slabs(m):
    """Cofactor inverse of a 3x3 block whose components are (SUB, 128)
    slabs.  m: list[3][3]; returns the same structure."""
    return _inv3_det(m)[0]


def _inv2_sym(m0, m1, m2):
    """Inverse + det of a symmetric 2x2 [[m0, m1], [m1, m2]].

    Precision-polymorphic like ``_inv3_det`` (plain slabs or DD values);
    this is the pivot block of the bending-only beam factorization shared
    by the f32 (ops/beam_kernel.py) and dd (ops/beam_kernel_dd.py)
    fused kernels."""
    det = m0 * m2 - m1 * m1
    inv_det = 1.0 / det
    return m2 * inv_det, -(m1 * inv_det), m0 * inv_det, det


def _mm(m1, m2):
    return [
        [sum(m1[a][k] * m2[k][b] for k in range(3)) for b in range(3)]
        for a in range(3)
    ]


def _mv(m, v):
    return [sum(m[a][k] * v[k] for k in range(3)) for a in range(3)]


def _sub_m(m1, m2):
    return [[m1[a][b] - m2[a][b] for b in range(3)] for a in range(3)]


def _sub_v(v1, v2):
    return [v1[a] - v2[a] for a in range(3)]


def _t(m):
    return [[m[b][a] for b in range(3)] for a in range(3)]


def _read_mat(ref, i):
    return [[ref[0, i, a, b] for b in range(3)] for a in range(3)]


def _read_vec(ref, i):
    return [ref[0, i, a] for a in range(3)]


def _write_mat(ref, i, m):
    for a in range(3):
        for b in range(3):
            ref[i, a, b] = m[a][b]


def _write_vec(ref, i, v, lead=None):
    for a in range(3):
        if lead is None:
            ref[i, a] = v[a]
        else:
            ref[lead, i, a] = v[a]


def _thomas_kernel(diag_ref, upper_ref, b_ref, x_ref, c_scr, y_scr):
    """One grid program solves TILE scenarios end-to-end in VMEM.

    diag_ref: (1, n, 3, 3, SUB, LANES); upper_ref: same, zero-padded at the
    last block; b_ref/x_ref: (1, n, 3, SUB, LANES);
    c_scr: (n, 3, 3, SUB, LANES); y_scr: (n, 3, SUB, LANES).
    """
    n = diag_ref.shape[1]

    sinv0 = _inv3_slabs(_read_mat(diag_ref, 0))
    _write_mat(c_scr, 0, _mm(sinv0, _read_mat(upper_ref, 0)))
    for a in range(3):
        y_scr[0, a] = _mv(sinv0, _read_vec(b_ref, 0))[a]

    def fwd(i, _):
        lm = _t(_read_mat(upper_ref, i - 1))
        c_prev = [[c_scr[i - 1, a, b] for b in range(3)] for a in range(3)]
        s = _sub_m(_read_mat(diag_ref, i), _mm(lm, c_prev))
        sinv = _inv3_slabs(s)
        _write_mat(c_scr, i, _mm(sinv, _read_mat(upper_ref, i)))
        y_prev = [y_scr[i - 1, a] for a in range(3)]
        y = _mv(sinv, _sub_v(_read_vec(b_ref, i), _mv(lm, y_prev)))
        for a in range(3):
            y_scr[i, a] = y[a]
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)

    for a in range(3):
        x_ref[0, n - 1, a] = y_scr[n - 1, a]

    def bwd(k, _):
        i = n - 2 - k
        c_i = [[c_scr[i, a, b] for b in range(3)] for a in range(3)]
        x_next = [x_ref[0, i + 1, a] for a in range(3)]
        x = _sub_v([y_scr[i, a] for a in range(3)], _mv(c_i, x_next))
        for a in range(3):
            x_ref[0, i, a] = x[a]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


def _thomas_kernel_bidi(diag_ref, upper_ref, b_ref, x_ref, c_scr, y_scr,
                        sinv_scr):
    """Bidirectional block Thomas: eliminate from BOTH ends toward the
    middle, meet at one pivot row, back-substitute outward.

    Hypothesis tested: the standard sweep is one serial dependency chain
    of ~40 VPU ops per node, so two INDEPENDENT chains should interleave
    in the pipeline and give ~2x if the kernel were latency-bound.
    MEASURED RESULT (v5e, B=8192/n=101): 5.61M vs 6.34M solves/s — no
    win; the marginal per-tile cost (~40 us per 512-lane tile once the
    ~1 ms dispatch is excluded) shows the production kernel is already
    VPU-THROUGHPUT-bound, and the bidi variant just pays the extra
    meeting-row work.  Kept behind ``bidi=True`` as a documented
    experiment (the balance could flip on hardware with deeper pipelines
    or slower VPU issue).

    Left chain (i rising):  S_i = D_i - U_{i-1}^T Sinv_{i-1} U_{i-1},
      y_i = Sinv_i (b_i - U_{i-1}^T y_{i-1}),  C_i = Sinv_i U_i.
    Right chain (k falling): S'_k = D_k - U_k S'inv_{k+1} U_k^T,
      y'_k = S'inv_k (b_k - U_k y'_{k+1}),  C'_k = S'inv_k U_{k-1}^T.
    Meeting row m: S_m = D_m - U_{m-1}^T Sinv_{m-1} U_{m-1}
                       - U_m S'inv_{m+1} U_m^T,
      x_m = Sinv_m (b_m - U_{m-1}^T y_{m-1} - U_m y'_{m+1}).
    Back-sub: x_i = y_i - C_i x_{i+1} (left, falling);
              x_k = y'_k - C'_k x_{k-1} (right, rising).

    Scratch ranges are disjoint per chain (left uses [0, m), right
    (m, n)), so the buffers are shared.  Requires n >= 3.
    """
    n = diag_ref.shape[1]
    m = n // 2

    def put_mat(scr, i, mat):
        for a in range(3):
            for b in range(3):
                scr[i, a, b] = mat[a][b]

    def put_vec(scr, i, v):
        for a in range(3):
            scr[i, a] = v[a]

    # chain heads
    sinv0 = _inv3_slabs(_read_mat(diag_ref, 0))
    put_mat(sinv_scr, 0, sinv0)
    put_mat(c_scr, 0, _mm(sinv0, _read_mat(upper_ref, 0)))
    put_vec(y_scr, 0, _mv(sinv0, _read_vec(b_ref, 0)))

    sinvN = _inv3_slabs(_read_mat(diag_ref, n - 1))
    put_mat(sinv_scr, n - 1, sinvN)
    put_mat(c_scr, n - 1, _mm(sinvN, _t(_read_mat(upper_ref, n - 2))))
    put_vec(y_scr, n - 1, _mv(sinvN, _read_vec(b_ref, n - 1)))

    def fwd(j, _):
        # left step i = j (runs while j < m)
        i = jnp.minimum(j, m - 1)          # clamp: idle once past m-1
        li = j <= m - 1
        u_prev = _t(_read_mat(upper_ref, i - 1))
        c_prev = [[c_scr[i - 1, a, b] for b in range(3)] for a in range(3)]
        s = _sub_m(_read_mat(diag_ref, i), _mm(u_prev, c_prev))
        sinv = _inv3_slabs(s)
        y = _mv(sinv, _sub_v(_read_vec(b_ref, i),
                             _mv(u_prev, [y_scr[i - 1, a]
                                          for a in range(3)])))
        c = _mm(sinv, _read_mat(upper_ref, i))

        # right step k = n-1-j (runs while k > m)
        k = jnp.maximum(n - 1 - j, m + 1)
        # carry reads clamped to n-1: when the right chain is idle
        # (k pinned at m+1) k+1 can index past the (n, ...) scratch for
        # small n (n=4: reads row 4) — the store is masked but the read
        # itself must stay in bounds (ADVICE r3)
        kp = jnp.minimum(k + 1, n - 1)
        u_k = _read_mat(upper_ref, jnp.minimum(k, n - 2))
        cp_next = [[c_scr[kp, a, b] for b in range(3)]
                   for a in range(3)]
        sp = _sub_m(_read_mat(diag_ref, k), _mm(u_k, cp_next))
        spinv = _inv3_slabs(sp)
        yp = _mv(spinv, _sub_v(_read_vec(b_ref, k),
                               _mv(u_k, [y_scr[kp, a]
                                         for a in range(3)])))
        cp = _mm(spinv, _t(_read_mat(upper_ref, k - 1)))

        # masked stores (jnp.where, NOT arithmetic blends: the untouched
        # slot may hold NaN garbage and 0*NaN would poison the store):
        # once a chain reaches the middle its clamped index would
        # otherwise overwrite live data
        ri = n - 1 - j >= m + 1
        for a in range(3):
            y_scr[i, a] = jnp.where(li, y[a], y_scr[i, a])
            y_scr[k, a] = jnp.where(ri, yp[a], y_scr[k, a])
            for b in range(3):
                sinv_scr[i, a, b] = jnp.where(li, sinv[a][b],
                                              sinv_scr[i, a, b])
                c_scr[i, a, b] = jnp.where(li, c[a][b], c_scr[i, a, b])
                sinv_scr[k, a, b] = jnp.where(ri, spinv[a][b],
                                              sinv_scr[k, a, b])
                c_scr[k, a, b] = jnp.where(ri, cp[a][b], c_scr[k, a, b])
        return 0

    jax.lax.fori_loop(1, 1 + max(m - 1, n - 2 - m), fwd, 0)

    # meeting row m: both neighbor chains are complete
    u_lm = _t(_read_mat(upper_ref, m - 1))     # couples m-1 -> m
    u_rm = _read_mat(upper_ref, m)             # couples m -> m+1
    c_lm = [[c_scr[m - 1, a, b] for b in range(3)] for a in range(3)]
    spinv_r = [[sinv_scr[m + 1, a, b] for b in range(3)] for a in range(3)]
    s_m = _sub_m(
        _sub_m(_read_mat(diag_ref, m), _mm(u_lm, c_lm)),
        _mm(_mm(u_rm, spinv_r), _t(u_rm)),
    )
    rhs_m = _sub_v(
        _sub_v(_read_vec(b_ref, m),
               _mv(u_lm, [y_scr[m - 1, a] for a in range(3)])),
        _mv(u_rm, [y_scr[m + 1, a] for a in range(3)]),
    )
    x_m = _mv(_inv3_slabs(s_m), rhs_m)
    for a in range(3):
        x_ref[0, m, a] = x_m[a]

    def bwd(j, _):
        i = jnp.maximum(m - j, 0)                  # left: falling from m-1
        li = m - j >= 0
        k = jnp.minimum(m + j, n - 1)              # right: rising from m+1
        ri = m + j <= n - 1
        cx_l = _mv([[c_scr[i, a, b] for b in range(3)] for a in range(3)],
                   [x_ref[0, i + 1, a] for a in range(3)])
        x_l = _sub_v([y_scr[i, a] for a in range(3)], cx_l)
        cx_r = _mv([[c_scr[k, a, b] for b in range(3)] for a in range(3)],
                   [x_ref[0, k - 1, a] for a in range(3)])
        x_r = _sub_v([y_scr[k, a] for a in range(3)], cx_r)
        for a in range(3):
            x_ref[0, i, a] = jnp.where(li, x_l[a], x_ref[0, i, a])
            x_ref[0, k, a] = jnp.where(ri, x_r[a], x_ref[0, k, a])
        return 0

    jax.lax.fori_loop(1, max(m, n - 1 - m) + 1, bwd, 0)


def _to_slabs(x, n_tail, sub=SUB):
    """(B, n, *tail) -> (T, n, *tail, sub, LANES) with B padded to the
    tile (sub * LANES)."""
    B = x.shape[0]
    tile = sub * LANES
    T = max((B + tile - 1) // tile, 1)
    pad = T * tile - B
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    # (T, sub, LANES, n, *tail) -> (T, n, *tail, sub, LANES)
    x = x.reshape((T, sub, LANES) + x.shape[1:])
    perm = (0,) + tuple(range(3, 3 + 1 + n_tail)) + (1, 2)
    return x.transpose(perm), B, T


def _from_slabs(x, B):
    """(T, n, 3, SUB, LANES) -> (B, n, 3)."""
    x = x.transpose(0, 3, 4, 1, 2)  # (T, SUB, LANES, n, 3)
    return x.reshape((-1,) + x.shape[3:])[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_solve_sym(diag, upper, b, refine=0, interpret=False):
    """Differentiable batched symmetric solve with optional compensated
    iterative refinement (same semantics as ``fem.solve.block_tridiag_solve``
    but running the Pallas kernel).  The adjoint is one extra batched solve
    (K symmetric), making this a drop-in for the datagen/optimizer hot loop.
    """
    return _pallas_refined(diag, upper, b, refine, interpret)


def _pallas_refined(diag, upper, b, refine, interpret):
    from openpystruct_tpu.fem.solve import (
        block_tridiag_residual_compensated,
    )

    x = pallas_block_tridiag_solve(diag, upper, b, interpret=interpret)
    for _ in range(refine):
        r = jax.vmap(block_tridiag_residual_compensated)(diag, upper, b, x)
        x = x + pallas_block_tridiag_solve(diag, upper, r,
                                           interpret=interpret)
    return x


def _pallas_solve_fwd(diag, upper, b, refine, interpret):
    x = _pallas_refined(diag, upper, b, refine, interpret)
    return x, (diag, upper, x)


def _pallas_solve_bwd(refine, interpret, res, g):
    diag, upper, x = res
    lam = _pallas_refined(diag, upper, g, refine, interpret)
    diag_bar = -lam[..., :, None] * x[..., None, :]
    # stored upper feeds K twice (upper band + transposed lower band):
    # upper_bar[i] = -lam_i x_{i+1}^T - x_i lam_{i+1}^T
    upper_bar = (
        -lam[..., :-1, :, None] * x[..., 1:, None, :]
        - x[..., :-1, :, None] * lam[..., 1:, None, :]
    )
    return diag_bar, upper_bar, lam


pallas_solve_sym.defvjp(_pallas_solve_fwd, _pallas_solve_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "sub", "bidi"))
def pallas_block_tridiag_solve(diag, upper, b, interpret=False, sub=None,
                               bidi=False):
    """Solve K x = b for a batch of symmetric block-tridiagonal systems.

    Args:
      diag: (B, n, 3, 3) diagonal blocks.
      upper: (B, n-1, 3, 3) super-diagonal blocks (lower = upper^T).
      b: (B, n, 3) right-hand sides.
      interpret: run the kernel in interpreter mode (CPU testing).
      sub: slab depth; defaults to the largest that fits VMEM at this n
        (``pick_sub``).  Meshes exceeding VMEM even at sub=1
        auto-dispatch to the HBM-streaming kernel
        (ops/block_stream.py) — the third size regime.

    Returns (B, n, 3) solutions.  Systems are padded to the lane tile with
    identity blocks, so padding never divides by zero.
    """
    Bsz, n = diag.shape[0], diag.shape[1]
    dtype = diag.dtype
    if sub is None:
        sub = pick_sub(n, 36)
        if sub is not None and sub < SUB and not bidi:
            # measured on v5e: once the resident kernel's slab depth
            # drops below the full 4 sublanes, the streamed kernel wins
            # (2.2x at n=301/sub=2, 1.6x at n=501, 4.8x vs sub=1) —
            # shallow slabs leave most of each vreg masked, which costs
            # more than the streamed path's HBM traffic for the
            # materialized C/y factors.  (bidi: the streamed kernel has
            # no bidirectional variant — keep the resident kernel so the
            # experiment measures what it claims to.)
            sub = None
    if sub is None:
        if bidi:
            raise ValueError(
                f"bidi=True requires the VMEM-resident kernel, but a mesh "
                f"of {n} nodes exceeds it even at sub=1 — the streamed "
                "fallback has no bidirectional variant"
            )
        from openpystruct_tpu.ops.block_stream import (
            pallas_block_tridiag_solve_streamed,
        )

        return pallas_block_tridiag_solve_streamed(
            diag, upper, b, interpret=interpret
        )
    tile = sub * LANES

    # zero-pad upper to n blocks; identity-fill the batch padding
    upper_p = jnp.concatenate(
        [upper, jnp.zeros((Bsz, 1, 3, 3), dtype)], axis=1
    )
    diag_s, B0, T = _to_slabs(diag, 2, sub)
    upper_s, _, _ = _to_slabs(upper_p, 2, sub)
    b_s, _, _ = _to_slabs(b, 1, sub)
    if T * tile > B0:
        # make padded diagonals identity so the factorization stays finite
        eye = jnp.eye(3, dtype=dtype)[None, None, :, :, None, None]
        # mask of padded lanes, in slab coordinates
        lane_ids = jnp.arange(T * tile).reshape(T, sub, LANES)
        padmask = jnp.broadcast_to(
            (lane_ids >= B0)[:, None, None, None, :, :], diag_s.shape
        )
        diag_s = jnp.where(padmask, eye, diag_s)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, n, 3, 3, sub, LANES), lambda t: (t, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 3, 3, sub, LANES), lambda t: (t, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 3, sub, LANES), lambda t: (t, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, 3, sub, LANES), lambda t: (t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((n, 3, 3, sub, LANES), dtype),
            pltpu.VMEM((n, 3, sub, LANES), dtype),
        ] + ([pltpu.VMEM((n, 3, 3, sub, LANES), dtype)] if bidi else []),
    )
    from openpystruct_tpu.ops.beam_kernel import _kernel_trace_scope

    with _kernel_trace_scope(dtype):
        x_s = pl.pallas_call(
            _thomas_kernel_bidi if bidi else _thomas_kernel,
            out_shape=jax.ShapeDtypeStruct((T, n, 3, sub, LANES), dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(diag_s, upper_s, b_s)
    return _from_slabs(x_s, B0)
