"""HBM-streaming block-tridiagonal solver: meshes past the VMEM ceiling.

The VMEM-resident Thomas kernel (ops/block_tridiag.py) holds the whole
factorization state on-core, which caps it at ~1,100 nodes (solve-only;
~640 fused) — beyond that round 2 fell back to the ``lax.scan`` path at
~50x the per-lane cost.  This module is the promised "long-context"
mechanism (SURVEY.md §5: blockwise banded solve for finer meshes,
replacing OpenSees BandSPD at scale, OpenPyStruct_BeamOpt.py:122): the
node axis is processed in fixed chunks that stream HBM->VMEM while the
serial recurrence state (one 3x3 multiplier block, one 3-vector, one
coupling block per lane slab) persists in scratch across grid steps.

Pallas's sequential TPU grid double-buffers the chunk copies
automatically, so DMA of chunk c+1 overlaps the recurrence over chunk c —
the kernel stays VPU-bound like the resident one, paying only the extra
HBM traffic for the materialized back-substitution multipliers C and
forward solution y (the two sweeps are separate kernels because the
backward pass walks the chunks in reverse).

Layout matches ops/block_tridiag.py: scenario batch across vector lanes,
(T, n, 3, 3, sub, LANES) slabs, all 3x3 algebra unrolled over static
component indices.
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
    _from_slabs,
    _inv3_slabs,
    _mm,
    _mv,
    _sub_m,
    _sub_v,
    _t,
    _to_slabs,
)

# Nodes per streamed chunk.  VMEM per chunk ~ chunk * 33 floats * sub *
# LANES * 4B * 2 (double buffer) ~= 4.3 MB at chunk=64/sub=4 — small
# enough that double-buffering never presses the 16 MB core limit, large
# enough that each DMA is ~megabyte-scale (bandwidth-efficient).
CHUNK = 64


def _read_mat(ref, j):
    return [[ref[0, j, a, b] for b in range(3)] for a in range(3)]


def _read_carry_mat(ref):
    return [[ref[a, b] for b in range(3)] for a in range(3)]


def _write_carry_mat(ref, m):
    for a in range(3):
        for b in range(3):
            ref[a, b] = m[a][b]


def _fwd_kernel(chunk, diag_ref, upper_ref, b_ref, c_out, y_out,
                cprev_scr, yprev_scr, uprev_scr):
    """Forward factorization + substitution over one (tile, chunk) cell.

    Carries across chunks (persist in scratch between sequential grid
    steps): C_{i-1}, y_{i-1}, U_{i-1}.  All are zero at the first row,
    which makes row 0 fall out of the generic recurrence (S_0 = D_0,
    y_0 = Sinv_0 b_0) with no special case.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _reset():
        z = jnp.zeros_like(cprev_scr[0, 0])
        for a in range(3):
            yprev_scr[a] = z
            for b in range(3):
                cprev_scr[a, b] = z
                uprev_scr[a, b] = z

    def row(j, _):
        u_prev = _read_carry_mat(uprev_scr)
        c_prev = _read_carry_mat(cprev_scr)
        y_prev = [yprev_scr[a] for a in range(3)]
        s = _sub_m(_read_mat(diag_ref, j), _mm(_t(u_prev), c_prev))
        sinv = _inv3_slabs(s)
        u_i = _read_mat(upper_ref, j)
        c_i = _mm(sinv, u_i)
        y_i = _mv(sinv, _sub_v(
            [b_ref[0, j, a] for a in range(3)], _mv(_t(u_prev), y_prev)
        ))
        for a in range(3):
            y_out[0, j, a] = y_i[a]
            yprev_scr[a] = y_i[a]
            for b in range(3):
                c_out[0, j, a, b] = c_i[a][b]
        _write_carry_mat(cprev_scr, c_i)
        _write_carry_mat(uprev_scr, u_i)
        return 0

    jax.lax.fori_loop(0, chunk, row, 0)


def _bwd_kernel(chunk, c_ref, y_ref, x_out, xnext_scr):
    """Backward substitution x_i = y_i - C_i x_{i+1}, chunks in reverse.

    The x_{i+1} carry starts at zero: the last (possibly padding) row has
    C = 0 (zero-padded super-diagonal), so x_{n-1} = y_{n-1} falls out of
    the generic step.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _reset():
        z = jnp.zeros_like(xnext_scr[0])
        for a in range(3):
            xnext_scr[a] = z

    def row(k, _):
        j = chunk - 1 - k
        x_next = [xnext_scr[a] for a in range(3)]
        cx = _mv(_read_mat(c_ref, j), x_next)
        x = _sub_v([y_ref[0, j, a] for a in range(3)], cx)
        for a in range(3):
            x_out[0, j, a] = x[a]
            xnext_scr[a] = x[a]
        return 0

    jax.lax.fori_loop(0, chunk, row, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "sub", "chunk")
)
def pallas_block_tridiag_solve_streamed(diag, upper, b, interpret=False,
                                        sub=None, chunk=CHUNK):
    """Solve K x = b for a batch of symmetric block-tridiagonal systems of
    ANY length by streaming node chunks through VMEM.

    Same contract as ``pallas_block_tridiag_solve`` (diag (B, n, 3, 3),
    upper (B, n-1, 3, 3), b (B, n, 3) -> x (B, n, 3); symmetric K, batch
    padded to lane tiles with identity systems) with no VMEM-imposed mesh
    ceiling: VMEM holds only the in-flight chunks plus O(1) recurrence
    carry, so n is bounded by HBM, not VMEM.
    """
    Bsz, n = diag.shape[0], diag.shape[1]
    dtype = diag.dtype
    if sub is None:
        sub = SUB
    tile = sub * LANES

    nc = max((n + chunk - 1) // chunk, 1)
    n_pad = nc * chunk

    # node-axis padding: identity diagonal rows, zero coupling, zero rhs
    # (decoupled from the real rows because upper[n-1] is zero-padded)
    upper_p = jnp.concatenate(
        [upper, jnp.zeros((Bsz, n_pad - n + 1, 3, 3), dtype)], axis=1
    )
    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=dtype), (Bsz, n_pad - n, 3, 3)
    )
    diag_p = jnp.concatenate([diag, eye], axis=1)
    b_p = jnp.concatenate(
        [b, jnp.zeros((Bsz, n_pad - n, 3), dtype)], axis=1
    )

    diag_s, B0, T = _to_slabs(diag_p, 2, sub)
    upper_s, _, _ = _to_slabs(upper_p, 2, sub)
    b_s, _, _ = _to_slabs(b_p, 1, sub)
    if T * tile > B0:
        eye_s = jnp.eye(3, dtype=dtype)[None, None, :, :, None, None]
        lane_ids = jnp.arange(T * tile).reshape(T, sub, LANES)
        padmask = jnp.broadcast_to(
            (lane_ids >= B0)[:, None, None, None, :, :], diag_s.shape
        )
        diag_s = jnp.where(padmask, eye_s, diag_s)

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
    from openpystruct_tpu.ops.beam_kernel import _kernel_trace_scope

    with _kernel_trace_scope(dtype):
        c_s, y_s = pl.pallas_call(
            functools.partial(_fwd_kernel, chunk),
            grid=(T, nc),
            in_specs=[mat_spec, mat_spec, vec_spec],
            out_specs=[mat_spec, vec_spec],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (T, n_pad, 3, 3, sub, LANES), dtype
                ),
                jax.ShapeDtypeStruct((T, n_pad, 3, sub, LANES), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, 3, sub, LANES), dtype),   # C carry
                pltpu.VMEM((3, sub, LANES), dtype),      # y carry
                pltpu.VMEM((3, 3, sub, LANES), dtype),   # U carry
            ],
            interpret=interpret,
        )(diag_s, upper_s, b_s)

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
            functools.partial(_bwd_kernel, chunk),
            grid=(T, nc),
            in_specs=[rev_mat, rev_vec],
            out_specs=rev_vec,
            out_shape=jax.ShapeDtypeStruct(
                (T, n_pad, 3, sub, LANES), dtype
            ),
            scratch_shapes=[
                pltpu.VMEM((3, sub, LANES), dtype),      # x carry
            ],
            interpret=interpret,
        )(c_s, y_s)
    return _from_slabs(x_s, B0)[:, :n]
