"""Streamed double-double solver tests (interpret mode on CPU).

The acceptance bar extends the resident dd kernel's (test_beam_kernel_dd):
dd-grade agreement with float64 on the ill-conditioned tail, but with NO
mesh-size ceiling — the n=641 case below was past the ROUND-3 resident dd
kernel's VMEM range (the r4 bending-only layout fits it resident; the
streamed kernel remains the no-ceiling path past ~750 nodes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_beam_kernel_dd import E, A, _ill_conditioned_batch, _to64
from openpystruct_tpu.fem.beam import (
    BeamScenario,
    beam_min_pivot,
    constraint_mask,
    solve_beam,
)
from openpystruct_tpu.ops.beam_kernel_dd import _FLOATS_ANALYSIS
from openpystruct_tpu.ops.block_tridiag import pick_sub
from openpystruct_tpu.ops.block_stream_dd import solve_beam_dd_streamed


def _f64_reference(scen, I):
    scen64, I64 = _to64(scen), I.astype(jnp.float64)
    sol = jax.jit(jax.vmap(
        lambda I_, sc: solve_beam(I_, sc, E, A).displacements
    ))(I64, scen64)
    piv = jax.jit(jax.vmap(
        lambda I_, sc: beam_min_pivot(I_, sc, E, A)
    ))(I64, scen64)
    return np.asarray(sol), np.asarray(piv)


def _run_streamed(scen, I, **kw):
    Le = jnp.diff(scen.node_x, axis=-1).astype(I.dtype)
    free = ~jax.vmap(constraint_mask)(scen)
    return solve_beam_dd_streamed(
        I, Le, free, scen.point_loads, scen.udl, E, A,
        interpret=jax.default_backend() != "tpu", **kw
    )


def test_streamed_dd_matches_f64_on_ill_conditioned_tail():
    """Same gate as the resident dd kernel: dd keeps f64-grade digits
    where float32 keeps none (~5e7 stiffness contrast lanes)."""
    scen, I = _ill_conditioned_batch()
    u64, piv64 = _f64_reference(scen, I)
    u, piv = _run_streamed(scen, I, sub=1, chunk=16)
    scale = np.abs(u64).max(axis=(1, 2), keepdims=True)
    rel = (np.abs(np.asarray(u, np.float64) - u64) / scale).max()
    assert rel < 1e-6, rel
    np.testing.assert_allclose(
        np.asarray(piv, np.float64), piv64, rtol=2e-3
    )


def test_streamed_dd_past_resident_ceiling():
    """n=641 — past the ROUND-3 resident dd kernel's VMEM range — a
    span-scaled 1280 m beam (Le = 2 m): one lane with a 256 m tail
    overhang (pivot ~1e-12, the ill-but-valid regime where float32 is
    ~15% wrong) and one fully-supported lane, against float64.

    Span scaling is the claim being tested: mesh GROWTH stays dd-solvable
    without a ceiling.  Fixed-span hyper-refinement is a different story —
    cond ~ n^4 crosses dd's ~cond*eps_dd floor near n~500 (measured
    5.2e-4 at n=641 on a 200 m span), which no 48-bit arithmetic can fix;
    solve_beam_checked's certification reports exactly that."""
    n = 641
    # n=641 was past the round-3 3x3 layout's resident ceiling (~430
    # nodes); the round-4 bending-only layout fits it resident (ceiling
    # ~750), so the streamed kernel is driven EXPLICITLY here (it is the
    # no-ceiling path for everything beyond) — assert the ceiling is
    # where the layout says it is so auto-dispatch stays honest.
    assert pick_sub(n, _FLOATS_ANALYSIS) == 1
    assert pick_sub(801, _FLOATS_ANALYSIS) is None, (
        "resident dd ceiling moved; update this premise"
    )
    node_x = jnp.linspace(0.0, 2.0 * (n - 1), n, dtype=jnp.float32)
    ill_tags = jnp.arange(63, 513, 64)       # supported to node 511
    benign_tags = jnp.arange(63, n - 1, 64)  # rollers every 128 m
    scen = BeamScenario(
        node_x=jnp.broadcast_to(node_x, (2, n)),
        roller_mask=jnp.stack([
            jnp.zeros(n, bool).at[ill_tags].set(True),
            jnp.zeros(n, bool).at[benign_tags].set(True),
        ]),
        point_loads=jnp.zeros((2, n), jnp.float32)
        .at[0, 600].set(-3.5e5)
        .at[1, n // 3].set(-2.5e5),
        udl=jnp.full((2,), -1000.0, jnp.float32),
    )
    key = jax.random.PRNGKey(641)
    I = 0.05 * jax.random.uniform(key, (2, n - 1), minval=0.8, maxval=1.2,
                                  dtype=jnp.float32)
    u64, piv64 = _f64_reference(scen, I)
    u, piv = _run_streamed(scen, I, sub=1, chunk=16)
    scale = np.abs(u64).max(axis=(1, 2), keepdims=True)
    rel = (np.abs(np.asarray(u, np.float64) - u64) / scale).max(axis=(1, 2))
    assert rel[0] < 1e-5, rel   # overhang lane (measured 1.3e-6)
    assert rel[1] < 1e-6, rel   # supported lane (measured 8.3e-8)
    np.testing.assert_allclose(
        np.asarray(piv, np.float64), piv64, rtol=2e-3
    )
    # the overhang lane genuinely needs dd: float32 + 2 refinement
    # sweeps is ~15% wrong there
    from openpystruct_tpu.fem.beam import solve_beam_batched

    sol32 = solve_beam_batched(I, scen, E, A, refine=2, use_pallas=False)
    rel32 = (np.abs(np.asarray(sol32.displacements, np.float64) - u64)
             / scale).max(axis=(1, 2))
    assert rel32[0] > 0.05, rel32


def test_streamed_dd_ragged_batch_and_chunk_padding():
    """Batch not a multiple of the lane tile and n not a multiple of the
    chunk: padding lanes/rows must not perturb real ones (compare against
    the same solver at a different chunking)."""
    scen, I = _ill_conditioned_batch()
    scen3 = jax.tree.map(lambda x: x[:3], scen)
    u_a, piv_a = _run_streamed(scen3, I[:3], sub=1, chunk=16)
    u_b, piv_b = _run_streamed(scen3, I[:3], sub=1, chunk=25)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b),
                               rtol=2e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(piv_a), np.asarray(piv_b),
                               rtol=1e-5)
