"""HBM-streaming double-double solver: dd accuracy past the VMEM ceiling.

The resident dd kernels (ops/beam_kernel_dd.py) hold hi/lo pairs of the
whole factorization in VMEM, which caps them near ~430 nodes; beyond that
round 3's accuracy autopilot (fem/accuracy.py) had to detour flagged lanes
through a host float64 scan solve — correct (it is the reference's own
arithmetic, OpenPyStruct_BeamOpt.py:122-126) but off-chip.  This module
combines the two round-3 mechanisms so the dd path has no mesh ceiling
either: the chunked HBM-streaming structure of ops/block_stream.py with
every solve-space quantity carried as an unevaluated float32 sum hi + lo
(ops/dd.py), entirely on the float32 VPU datapath.

Split of labor:

- Assembly + BC masking + Jacobi scaling run as ordinary XLA over the
  batched arrays — the ``DD`` operator-overloading layer works on whole
  (B, n, ...) arrays just as it does on kernel slabs, so this is the same
  numerics as the resident kernel's ``_stage_assemble``/``_stage_scale``
  (ops/beam_kernel.py:135-234) with the hi/lo components materialized in
  HBM (which is exactly the memory regime streaming targets).
- The two streamed sweeps mirror ops/block_stream.py's kernels with
  ``RefPair`` hi/lo block refs and DD recurrence carries in persistent
  scratch; the forward kernel additionally tracks min |det S_i| (the
  Schur-pivot singularity diagnostic of ``_stage_factor``) so callers get
  the same f64-grade validity signal the resident dd kernel reports.

The back-substitution carry stays dd (the recurrence x_i = y_i - C_i
x_{i+1} compounds rounding through the chain) while the emitted solution
collapses to float32 — the caller-visible contract matches the resident
dd kernels (float32 out, ~48-bit internals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openpystruct_tpu.ops.block_stream import (
    _read_carry_mat,
    _read_mat,
    _write_carry_mat,
)
from openpystruct_tpu.ops.block_tridiag import (
    LANES,
    SUB,
    _from_slabs,
    _inv3_det,
    _mm,
    _mv,
    _sub_m,
    _sub_v,
    _t,
    _to_slabs,
)
from openpystruct_tpu.ops.dd import (
    DD,
    RefPair,
    absval,
    collapse,
    dd_rsqrt,
    dd_where,
)

# Nodes per streamed chunk.  dd doubles every streamed buffer (hi + lo):
# fwd sees 42 floats/node in + 24 out = 66 per chunk row, so chunk=32 at
# sub=4 is ~4.3 MB resident / ~8.6 MB double-buffered — comfortably under
# the 16 MB scoped-VMEM core limit.
CHUNK_DD = 32


def _fwd_kernel_dd(chunk, dh, dl, uh, ul, bh, bl,
                   ch_out, cl_out, yh_out, yl_out, piv_out,
                   cph, cpl, yph, ypl, uph, upl, piv_scr):
    """dd forward factorization + substitution over one (tile, chunk) cell.

    Structure mirrors ``block_stream._fwd_kernel``; all refs/carries are
    hi/lo pairs and the recurrence algebra runs in dd via the shared 3x3
    helpers.  ``piv_scr`` accumulates min |det S_i| across chunks and the
    running value lands in ``piv_out`` (same block every grid step — the
    final write persists).
    """
    c = pl.program_id(1)
    diag_ref = RefPair(dh, dl)
    upper_ref = RefPair(uh, ul)
    b_ref = RefPair(bh, bl)
    c_out = RefPair(ch_out, cl_out)
    y_out = RefPair(yh_out, yl_out)
    cprev = RefPair(cph, cpl)
    yprev = RefPair(yph, ypl)
    uprev = RefPair(uph, upl)

    @pl.when(c == 0)
    def _reset():
        z = jnp.zeros_like(cph[0, 0])
        for a in range(3):
            yprev[a] = DD(z, z)
            for b in range(3):
                cprev[a, b] = DD(z, z)
                uprev[a, b] = DD(z, z)
        piv_scr[...] = jnp.full(piv_scr.shape, jnp.inf, piv_scr.dtype)

    def row(j, _):
        u_prev = _read_carry_mat(uprev)
        c_prev = _read_carry_mat(cprev)
        y_prev = [yprev[a] for a in range(3)]
        s = _sub_m(_read_mat(diag_ref, j), _mm(_t(u_prev), c_prev))
        sinv, det = _inv3_det(s)
        piv_scr[...] = jnp.minimum(piv_scr[...], absval(det))
        u_i = _read_mat(upper_ref, j)
        c_i = _mm(sinv, u_i)
        y_i = _mv(sinv, _sub_v(
            [b_ref[0, j, a] for a in range(3)], _mv(_t(u_prev), y_prev)
        ))
        for a in range(3):
            y_out[0, j, a] = y_i[a]
            yprev[a] = y_i[a]
            for b in range(3):
                c_out[0, j, a, b] = c_i[a][b]
        _write_carry_mat(cprev, c_i)
        _write_carry_mat(uprev, u_i)
        return 0

    jax.lax.fori_loop(0, chunk, row, 0)
    piv_out[0, 0] = piv_scr[...]


def _bwd_kernel_dd(chunk, ch, cl, yh, yl, x_out, xnh, xnl):
    """dd backward substitution, chunks in reverse; the x carry stays dd
    (the recurrence compounds rounding) while the emitted solution
    collapses to float32."""
    c = pl.program_id(1)
    c_ref = RefPair(ch, cl)
    y_ref = RefPair(yh, yl)
    xnext = RefPair(xnh, xnl)

    @pl.when(c == 0)
    def _reset():
        z = jnp.zeros_like(xnh[0])
        for a in range(3):
            xnext[a] = DD(z, z)

    def row(k, _):
        j = chunk - 1 - k
        x_next = [xnext[a] for a in range(3)]
        cx = _mv(_read_mat(c_ref, j), x_next)
        x = _sub_v([y_ref[0, j, a] for a in range(3)], cx)
        for a in range(3):
            x_out[0, j, a] = collapse(x[a])
            xnext[a] = x[a]
        return 0

    jax.lax.fori_loop(0, chunk, row, 0)


def _pad_elem(v: DD, left: bool) -> DD:
    """(B, nelem) element quantity -> (B, n) nodal contribution (exact
    zero padding on the hi and lo components separately)."""
    pad = ((0, 0), (1, 0)) if left else ((0, 0), (0, 1))
    return DD(jnp.pad(v.hi, pad), jnp.pad(v.lo, pad))


def assemble_beam_system_dd(I, Le, free, point_loads, udl, E: float,
                            A: float):
    """Batched dd assembly + BC masking + Jacobi scaling as plain XLA.

    Numerically the same pipeline as the resident dd kernel's
    ``_stage_stiffness``/``_stage_assemble``/``_stage_scale``
    (ops/beam_kernel.py:115-234 driven through DD values), with the hi/lo
    components materialized as (B, n, 3, 3) HBM arrays for the streamed
    solve.  ``free`` is the (B, n, 3) 0/1 float free-DOF mask; the Jacobi
    scale ``s`` is plain float32 (consistency, not precision — any fixed
    S yields an exactly equivalent scaled system; ops/dd.py CollapseRef
    rationale).

    Returns ``(diag, upper, f, s)`` with the first three as DD pytrees of
    shapes (B, n, 3, 3) / (B, n-1, 3, 3) / (B, n, 3).
    """
    dtype = I.dtype
    Edd = DD.lift(jnp.asarray(E, dtype))
    EAdd = DD.lift(jnp.asarray(E * A, dtype))
    I_dd, Le_dd = DD.lift(I), DD.lift(Le)
    w_dd = DD.lift(udl[:, None])

    inv_le = 1.0 / Le_dd
    ea = EAdd * inv_le
    eil = Edd * I_dd * inv_le
    eil2 = eil * inv_le
    eil3 = eil2 * inv_le
    k11 = 12.0 * eil3
    k12 = 6.0 * eil2
    k13 = 4.0 * eil
    k2 = 2.0 * eil

    zn = DD.lift(jnp.zeros(I.shape[:1] + (I.shape[1] + 1,), dtype))
    ze = DD.lift(jnp.zeros_like(I))

    # unmasked diagonal entries per node (left element + right element)
    d00 = _pad_elem(ea, True) + _pad_elem(ea, False)
    d11 = _pad_elem(k11, True) + _pad_elem(k11, False)
    d12 = _pad_elem(-k12, True) + _pad_elem(k12, False)
    d22 = _pad_elem(k13, True) + _pad_elem(k13, False)

    fr = [free[:, :, a] for a in range(3)]
    diag_e = [[None] * 3 for _ in range(3)]
    for a, d_aa in zip(range(3), (d00, d11, d22)):
        # masked rows/cols, original diagonal entry back on the diagonal
        diag_e[a][a] = d_aa * fr[a] * fr[a] + d_aa * (1.0 - fr[a])
    diag_e[1][2] = d12 * fr[1] * fr[2]
    diag_e[2][1] = d12 * fr[2] * fr[1]
    for a, b in ((0, 1), (0, 2), (1, 0), (2, 0)):
        diag_e[a][b] = zn

    frn = [free[:, :-1, a] for a in range(3)]   # node i of element i
    frx = [free[:, 1:, a] for a in range(3)]    # node i+1
    upper_e = [[ze] * 3 for _ in range(3)]
    upper_e[0][0] = -ea * frn[0] * frx[0]
    upper_e[1][1] = -k11 * frn[1] * frx[1]
    upper_e[1][2] = k12 * frn[1] * frx[2]
    upper_e[2][1] = -k12 * frn[2] * frx[1]
    upper_e[2][2] = k2 * frn[2] * frx[2]

    half = w_dd * Le_dd * 0.5
    fm_e = w_dd * Le_dd * Le_dd / 12.0
    fy = _pad_elem(half, True) + _pad_elem(half, False) \
        + DD.lift(point_loads.astype(dtype))
    fm = _pad_elem(fm_e, False) - _pad_elem(fm_e, True)
    f_e = [zn, fy * fr[1], fm * fr[2]]

    # Jacobi scale: dd rsqrt collapsed to plain f32, re-lifted exactly at
    # use sites (the scaled entries must be EXACT dd products s_a K s_b —
    # a pre-rounded f32 product s_a*s_b would put an eps32 entry-wise
    # perturbation on the scaled matrix, which conditioning amplifies)
    s = jnp.stack(
        [collapse(dd_rsqrt(diag_e[a][a])) for a in range(3)], axis=-1
    )
    s_l = [DD.lift(s[:, :, a]) for a in range(3)]
    for a in range(3):
        for b in range(3):
            diag_e[a][b] = diag_e[a][b] * s_l[a] * s_l[b]
            upper_e[a][b] = upper_e[a][b] \
                * DD.lift(s[:, :-1, a]) * DD.lift(s[:, 1:, b])
        f_e[a] = f_e[a] * s_l[a]

    def stack_33(entries):
        hi = jnp.stack(
            [jnp.stack([entries[a][b].hi for b in range(3)], axis=-1)
             for a in range(3)], axis=-2
        )
        lo = jnp.stack(
            [jnp.stack([entries[a][b].lo for b in range(3)], axis=-1)
             for a in range(3)], axis=-2
        )
        return DD(hi, lo)

    diag = stack_33(diag_e)
    upper = stack_33(upper_e)
    f = DD(
        jnp.stack([f_e[a].hi for a in range(3)], axis=-1),
        jnp.stack([f_e[a].lo for a in range(3)], axis=-1),
    )
    return diag, upper, f, s


@functools.partial(
    jax.jit, static_argnames=("interpret", "sub", "chunk")
)
def pallas_solve_dd_streamed(diag: DD, upper: DD, b: DD,
                             interpret: bool = False, sub=None,
                             chunk: int = CHUNK_DD):
    """Solve K x = b in dd arithmetic for a batch of symmetric
    block-tridiagonal systems of ANY length.

    Contract parallels ``block_stream.pallas_block_tridiag_solve_streamed``
    with dd operands: ``diag``/``upper``/``b`` are DD pytrees of shapes
    (B, n, 3, 3) / (B, n-1, 3, 3) / (B, n, 3).  Returns ``(x, pivot)``
    where ``x`` (B, n, 3) is the float32-collapsed solution and ``pivot``
    (B,) is min |det S_i| computed in dd — trustworthy to ~1e-13 where the
    float32 kernels bottom out at ~1e-10 noise.
    """
    Bsz, n = diag.hi.shape[0], diag.hi.shape[1]
    dtype = diag.hi.dtype
    if sub is None:
        sub = SUB
    tile = sub * LANES

    nc = max((n + chunk - 1) // chunk, 1)
    n_pad = nc * chunk

    def pad_n(x, rows, fill_eye=False):
        zpad = jnp.zeros((Bsz, rows) + x.shape[2:], x.dtype)
        if fill_eye:
            zpad = zpad + jnp.eye(3, dtype=x.dtype)
        return jnp.concatenate([x, zpad], axis=1)

    diag_hi = pad_n(diag.hi, n_pad - n, fill_eye=True)
    diag_lo = pad_n(diag.lo, n_pad - n)
    upper_hi = pad_n(upper.hi, n_pad - n + 1)
    upper_lo = pad_n(upper.lo, n_pad - n + 1)
    b_hi = pad_n(b.hi, n_pad - n)
    b_lo = pad_n(b.lo, n_pad - n)

    diag_hi_s, B0, T = _to_slabs(diag_hi, 2, sub)
    diag_lo_s, _, _ = _to_slabs(diag_lo, 2, sub)
    upper_hi_s, _, _ = _to_slabs(upper_hi, 2, sub)
    upper_lo_s, _, _ = _to_slabs(upper_lo, 2, sub)
    b_hi_s, _, _ = _to_slabs(b_hi, 1, sub)
    b_lo_s, _, _ = _to_slabs(b_lo, 1, sub)
    if T * tile > B0:
        # identity systems in the lane padding (hi = eye, lo = 0)
        eye_s = jnp.eye(3, dtype=dtype)[None, None, :, :, None, None]
        lane_ids = jnp.arange(T * tile).reshape(T, sub, LANES)
        padmask = jnp.broadcast_to(
            (lane_ids >= B0)[:, None, None, None, :, :], diag_hi_s.shape
        )
        diag_hi_s = jnp.where(padmask, eye_s, diag_hi_s)
        diag_lo_s = jnp.where(padmask, 0.0, diag_lo_s)

    mat_spec = pl.BlockSpec(
        (1, chunk, 3, 3, sub, LANES),
        lambda t, c: (t, c, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vec_spec = pl.BlockSpec(
        (1, chunk, 3, sub, LANES),
        lambda t, c: (t, c, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    piv_spec = pl.BlockSpec(
        (1, 1, sub, LANES),
        lambda t, c: (t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    from openpystruct_tpu.ops.beam_kernel import _kernel_trace_scope

    mat_shape = jax.ShapeDtypeStruct((T, n_pad, 3, 3, sub, LANES), dtype)
    vec_shape = jax.ShapeDtypeStruct((T, n_pad, 3, sub, LANES), dtype)
    carry_m = pltpu.VMEM((3, 3, sub, LANES), dtype)
    carry_v = pltpu.VMEM((3, sub, LANES), dtype)

    with _kernel_trace_scope(dtype):
        ch_s, cl_s, yh_s, yl_s, piv_s = pl.pallas_call(
            functools.partial(_fwd_kernel_dd, chunk),
            grid=(T, nc),
            in_specs=[mat_spec, mat_spec, mat_spec, mat_spec,
                      vec_spec, vec_spec],
            out_specs=[mat_spec, mat_spec, vec_spec, vec_spec, piv_spec],
            out_shape=[mat_shape, mat_shape, vec_shape, vec_shape,
                       jax.ShapeDtypeStruct((T, 1, sub, LANES), dtype)],
            scratch_shapes=[
                carry_m, carry_m,      # C carry hi/lo
                carry_v, carry_v,      # y carry hi/lo
                carry_m, carry_m,      # U carry hi/lo
                pltpu.VMEM((sub, LANES), dtype),   # running min pivot
            ],
            interpret=interpret,
        )(diag_hi_s, diag_lo_s, upper_hi_s, upper_lo_s, b_hi_s, b_lo_s)

        rev_mat = pl.BlockSpec(
            (1, chunk, 3, 3, sub, LANES),
            lambda t, c, nc=nc: (t, nc - 1 - c, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        rev_vec = pl.BlockSpec(
            (1, chunk, 3, sub, LANES),
            lambda t, c, nc=nc: (t, nc - 1 - c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        x_s = pl.pallas_call(
            functools.partial(_bwd_kernel_dd, chunk),
            grid=(T, nc),
            in_specs=[rev_mat, rev_mat, rev_vec, rev_vec],
            out_specs=rev_vec,
            out_shape=vec_shape,
            scratch_shapes=[carry_v, carry_v],     # x carry hi/lo
            interpret=interpret,
        )(ch_s, cl_s, yh_s, yl_s)

    from openpystruct_tpu.ops.beam_kernel import _from_slab

    x = _from_slabs(x_s, B0)[:, :n]
    piv = _from_slab(piv_s, B0)[:, 0]
    return x, piv


@functools.partial(
    jax.jit, static_argnames=("E", "A", "interpret", "sub", "chunk")
)
def solve_beam_dd_streamed(I, Le, free_mask, point_loads, udl,
                           E: float, A: float, interpret: bool = False,
                           sub=None, chunk: int = CHUNK_DD):
    """Batched beam FEA at dd accuracy with NO mesh-size ceiling.

    Drop-in for ``pallas_beam_analysis_dd``'s (u, pivot) role past its
    ~430-node VMEM range (fem/accuracy.py escalation): dd assembly +
    scaling in XLA, then the streamed dd solve.  ``free_mask`` is the
    (B, n, 3) boolean CONSTRAINED-DOF-free mask (True = free), matching
    ``~constraint_mask(scenario)``.

    Returns ``(u, pivot)``: float32 displacements (B, n, 3) and the dd
    min-Schur-pivot (B,).
    """
    dtype = I.dtype
    free = free_mask.astype(dtype)
    diag, upper, f, s = assemble_beam_system_dd(
        I, Le, free, point_loads, udl, E, A
    )
    x, piv = pallas_solve_dd_streamed(diag, upper, f, interpret=interpret,
                                      sub=sub, chunk=chunk)
    return x * s, piv
