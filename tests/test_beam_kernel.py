"""Fused beam-analysis kernel vs the split assembly+solve path."""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.datagen import sample_scenario
from openpystruct_tpu.fem.beam import constraint_mask, solve_beam_batched
from openpystruct_tpu.ops.beam_kernel import pallas_beam_analysis

E, A = 200e9, 0.01


def setup(B=4, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    scs = jax.vmap(sample_scenario)(keys)
    scs = jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        scs,
    )
    n = scs.node_x.shape[1]
    I = (
        jnp.exp(jax.random.normal(jax.random.PRNGKey(seed + 1),
                                  (B, n - 1)) * 0.3) * 0.5
    ).astype(dtype)
    Le = jnp.diff(scs.node_x, axis=-1)
    free = (~jax.vmap(constraint_mask)(scs)).astype(dtype)
    return scs, I, Le, free


def test_fused_kernel_matches_split_f64():
    """float64 interpret mode: both paths agree to roundoff."""
    scs, I, Le, free = setup(dtype=jnp.float64)
    ref = solve_beam_batched(I, scs, E, A, use_pallas=False)
    u, V, M, piv = pallas_beam_analysis(
        I, Le, free, scs.point_loads, scs.udl, E, A, refine=0,
        interpret=True,
    )
    np.testing.assert_allclose(
        # rtol 1e-8 (the OpenSees-agreement gate): the fused kernel factors
        # the bending 2x2 chain directly while the split path factors 3x3
        # blocks — mathematically identical on the block-diagonal chain,
        # but the rounding order differs at the ~1e-9 level in f64.
        np.asarray(u), np.asarray(ref.displacements), rtol=1e-8, atol=1e-18
    )
    np.testing.assert_allclose(
        np.asarray(V), np.asarray(ref.shear_forces), rtol=1e-8, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(M), np.asarray(ref.bending_moments), rtol=1e-8, atol=1e-6
    )
    # the emitted pivot matches the standalone diagnostic
    from openpystruct_tpu.fem import beam_min_pivot

    piv_ref = jax.vmap(lambda I, sc: beam_min_pivot(I, sc, E, A))(I, scs)
    np.testing.assert_allclose(
        np.asarray(piv), np.asarray(piv_ref), rtol=1e-6
    )


def test_fused_kernel_refine_f32_matches_split():
    """float32 + refinement: the fused kernel's error vs float64 truth must
    match the (already-validated) split path's — at refine 1 AND 2 (the
    two-sweep case regression-tests the work-vector separation)."""
    scs, I, Le, free = setup(dtype=jnp.float32)
    scs64 = jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, scs,
    )
    truth = solve_beam_batched(
        I.astype(jnp.float64), scs64, E, A, use_pallas=False
    )
    scale = float(jnp.max(jnp.abs(truth.displacements)))
    for refine in (1, 2):
        u, V, M, _ = pallas_beam_analysis(
            I, Le, free, scs.point_loads, scs.udl, E, A, refine=refine,
            interpret=True,
        )
        split = solve_beam_batched(
            I, scs, E, A, refine=refine, use_pallas=True, interpret=True
        )
        err_fused = np.abs(np.asarray(u, np.float64)
                           - np.asarray(truth.displacements)).max() / scale
        err_split = np.abs(
            np.asarray(split.displacements, np.float64)
            - np.asarray(truth.displacements)
        ).max() / scale
        assert err_fused < max(err_split * 1.5, 1e-6), (err_fused, err_split)


def test_fused_kernel_batch_padding():
    scs, I, Le, free = setup(B=3, seed=2, dtype=jnp.float64)
    u, V, M, piv = pallas_beam_analysis(
        I, Le, free, scs.point_loads, scs.udl, E, A, refine=0,
        interpret=True,
    )
    assert u.shape == (3, 101, 3) and V.shape == (3, 100)
    assert piv.shape == (3,)
    ref = solve_beam_batched(I, scs, E, A, use_pallas=False)
    np.testing.assert_allclose(
        # rtol 1e-8 (the OpenSees-agreement gate): the fused kernel factors
        # the bending 2x2 chain directly while the split path factors 3x3
        # blocks — mathematically identical on the block-diagonal chain,
        # but the rounding order differs at the ~1e-9 level in f64.
        np.asarray(u), np.asarray(ref.displacements), rtol=1e-8, atol=1e-18
    )
