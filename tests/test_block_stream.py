"""HBM-streaming block-tridiagonal solver tests (interpret mode on CPU).

Acceptance per VERDICT round 2 item 2: meshes past the VMEM-resident
ceiling (~1,100 nodes solve-only) must solve through the streamed kernel
with parity against the scan path to 1e-5 (f32 + refine), and ``pick_sub``
must auto-dispatch the three regimes (fused / resident / streamed).
"""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.fem.beam import BeamScenario, solve_beam_batched
from openpystruct_tpu.fem.solve import block_tridiag_solve
from openpystruct_tpu.ops.block_stream import (
    pallas_block_tridiag_solve_streamed,
)
from openpystruct_tpu.ops.block_tridiag import (
    pallas_block_tridiag_solve,
    pick_sub,
)

E, A = 200e9, 0.01


def _beam_system(n, B, key=0):
    """Well-conditioned beam systems (rollers every ~20 nodes) assembled
    at size n — realistic SPD block-tridiagonal inputs."""
    from openpystruct_tpu.fem.beam import assemble_beam_system

    keys = jax.random.split(jax.random.PRNGKey(key), B)
    node_x = jnp.linspace(0.0, 2.0 * n, n, dtype=jnp.float32)
    rollers = jnp.zeros(n, bool).at[jnp.arange(19, n - 1, 20)].set(True)

    def mk(k):
        loads = jnp.zeros(n, jnp.float32).at[n // 2].set(
            -3e5 * (0.5 + jax.random.uniform(k, dtype=jnp.float32))
        )
        I = 0.05 * jax.random.uniform(k, (n - 1,), minval=0.5, maxval=2.0,
                                      dtype=jnp.float32)
        sc = BeamScenario(
            node_x=node_x, roller_mask=rollers, point_loads=loads,
            udl=jnp.asarray(-1000.0, jnp.float32),
        )
        return assemble_beam_system(I, sc, E, A), sc, I

    (sys_b, scs, Is) = jax.vmap(mk)(keys)
    diag, upper, f = sys_b
    # Jacobi-scale like the production path (condition control)
    d = jnp.diagonal(diag, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(d)
    diag_s = diag * s[..., :, None] * s[..., None, :]
    upper_s = upper * s[..., :-1, :, None] * s[..., 1:, None, :]
    f_s = f * s
    return diag_s, upper_s, f_s, scs, Is


def test_streamed_matches_resident_small():
    """At a VMEM-resident size the streamed kernel must agree with the
    resident kernel — same recurrence, different data motion."""
    diag, upper, f, _, _ = _beam_system(101, 4)
    x_res = pallas_block_tridiag_solve(diag, upper, f, interpret=True)
    x_str = pallas_block_tridiag_solve_streamed(
        diag, upper, f, interpret=True, chunk=32
    )
    np.testing.assert_allclose(
        np.asarray(x_str), np.asarray(x_res), rtol=1e-6, atol=1e-12
    )


def test_streamed_large_mesh_parity_vs_scan():
    """n=1501 — past the resident ceiling.  Streamed + compensated
    refinement vs the scan path at the SAME arithmetic (f32, refine=1) to
    1e-5 relative (the VERDICT item-2 gate: identical recurrence, only
    the data motion differs — refinement rides ``pallas_solve_sym``'s
    dispatch, exercising the third regime end-to-end)."""
    from openpystruct_tpu.ops.block_tridiag import pallas_solve_sym

    n = 1501
    assert pick_sub(n, 36) is None, "n=1501 unexpectedly fits VMEM"
    diag, upper, f, _, _ = _beam_system(n, 2, key=1)
    x_str = pallas_solve_sym(diag, upper, f, 1, True)
    x_scan = jax.vmap(
        lambda d, u, b: block_tridiag_solve(d, u, b, refine=1)
    )(diag, upper, f)
    err = np.abs(np.asarray(x_str) - np.asarray(x_scan))
    scale = np.abs(np.asarray(x_scan)).max()
    assert (err / scale).max() < 1e-5, (err / scale).max()


def test_streamed_ragged_chunk_and_batch():
    """n not divisible by the chunk, batch not filling a lane tile.

    Compared against the RESIDENT kernel (identical unrolled arithmetic,
    so agreement is at rounding level; an unrefined f32-vs-scan
    comparison at this n would be conditioning-limited instead and prove
    nothing about the chunking)."""
    n = 230  # 230 = 3*64 + 38: ragged final chunk
    diag, upper, f, _, _ = _beam_system(n, 3, key=2)
    x_str = pallas_block_tridiag_solve_streamed(
        diag, upper, f, interpret=True, chunk=64
    )
    x_res = pallas_block_tridiag_solve(diag, upper, f, interpret=True)
    np.testing.assert_allclose(
        np.asarray(x_str), np.asarray(x_res), rtol=1e-6, atol=1e-12
    )


def test_auto_dispatch_three_regimes():
    """pallas_block_tridiag_solve transparently dispatches: resident at
    mesh sizes that fit VMEM, streamed beyond — and the full FEM path
    (solve_beam_batched use_pallas=True) rides it at any n."""
    n = 1301
    assert pick_sub(n, 36) is None
    diag, upper, f, scs, Is = _beam_system(n, 2, key=3)
    # the resident entry point must NOT raise past the ceiling any more
    x = pallas_block_tridiag_solve(diag, upper, f, interpret=True)
    assert np.isfinite(np.asarray(x)).all()

    sol_p = solve_beam_batched(Is, scs, E, A, refine=1, use_pallas=True,
                               interpret=True)
    sol_s = solve_beam_batched(Is, scs, E, A, refine=1, use_pallas=False)
    d_p = np.asarray(sol_p.deflections)
    d_s = np.asarray(sol_s.deflections)
    scale = np.abs(d_s).max()
    assert (np.abs(d_p - d_s) / scale).max() < 1e-5


def test_streamed_vjp_matches_finite_differences():
    """Adjoint certification PAST the resident range (VERDICT r3 item 8):
    ``pallas_solve_sym``'s custom VJP rides the streamed dispatch at
    n=1301; check the analytic directional derivative against central
    finite differences in float64 interpret mode (same method as
    tests/test_fused_vjp.py)."""
    from openpystruct_tpu.ops.block_tridiag import pallas_solve_sym

    n, B = 1301, 2
    assert pick_sub(n, 36) is None, "n=1301 unexpectedly fits VMEM"
    diag, upper, f, _, _ = _beam_system(n, B, key=5)
    diag = jnp.asarray(diag, jnp.float64)
    upper = jnp.asarray(upper, jnp.float64)
    f = jnp.asarray(f, jnp.float64)
    w = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, n, 3)), jnp.float64
    )

    def loss(d, u, b):
        x = pallas_solve_sym(d, u, b, 1, True)
        return jnp.sum(w * x)

    g_d, g_u, g_b = jax.grad(loss, argnums=(0, 1, 2))(diag, upper, f)

    rng = np.random.default_rng(1)
    Dd = jnp.asarray(rng.normal(size=diag.shape), jnp.float64)
    # keep the perturbed system symmetric like the primal inputs
    Dd = 0.5 * (Dd + jnp.swapaxes(Dd, -1, -2))
    Du = jnp.asarray(rng.normal(size=upper.shape), jnp.float64)
    Db = jnp.asarray(rng.normal(size=f.shape), jnp.float64)

    analytic = float(
        jnp.sum(g_d * Dd) + jnp.sum(g_u * Du) + jnp.sum(g_b * Db)
    )
    # h must sit inside the solve's linear regime: the FD secant deviates
    # from the tangent by ~(cond * ||D|| * h)^2 — measured 1.8% at h=1e-6
    # for this n=1301 system, so h=1e-8 puts truncation near 2e-6 while
    # the f64 roundoff on the secant difference stays orders below it.
    h = 1e-8
    fp = float(loss(diag + h * Dd, upper + h * Du, f + h * Db))
    fm = float(loss(diag - h * Dd, upper - h * Du, f - h * Db))
    fd = (fp - fm) / (2 * h)
    np.testing.assert_allclose(analytic, fd, rtol=1e-4)
