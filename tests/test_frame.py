"""Frame FEM + optimizer tests: closed-form checks, equilibrium, vmap."""

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.fem import build_frame, solve_frame
from openpystruct_tpu.opt import optimize_frame


def test_cantilever_column_closed_form():
    """A 1-story 'frame' with no beams == two independent cantilever columns.
    Tip deflection under a lateral point load: delta = P h^3 / (3 E I)."""
    cfg = FrameConfig(udl=0.0, lateral_load=1e4)
    st = build_frame(num_bays=1, num_stories=1, cfg=cfg)
    I = jnp.full(st.num_elems, 5e-4, jnp.float64)
    sol = solve_frame(I, st, cfg, dtype=jnp.float64)
    # The beam's axial stiffness (EA/L, independent of I) ties the two
    # column tops, so making the beam's I tiny yields two cantilevers
    # SHARING the lateral load equally: delta = P h^3 / (3 E * 2 Icol).
    I_soft = I.at[2].set(1e-12)  # the single beam
    sol = solve_frame(I_soft, st, cfg, dtype=jnp.float64)
    h, E, Icol = cfg.story_height, cfg.E, 5e-4
    delta = 1e4 * h**3 / (3 * E * (2 * Icol))
    top_left = 1 * 2 + 0  # node (i=1, j=0) in a 2-column grid
    np.testing.assert_allclose(
        float(sol.displacements[top_left, 0]), delta, rtol=2e-2
    )


def test_fixed_base_and_equilibrium():
    cfg = FrameConfig()
    st = build_frame(3, 3, cfg)
    I = jnp.full(st.num_elems, 5e-4, jnp.float64)
    sol = solve_frame(I, st, cfg, dtype=jnp.float64)
    # fixed base nodes don't move
    base = np.asarray(st.fixed_mask)
    np.testing.assert_allclose(
        np.asarray(sol.displacements)[base], 0.0, atol=1e-12
    )
    # global X equilibrium: sum of base global-X end forces of ground columns
    # balances lateral loads + axial beam UDL component (wx = udl on beams)
    assert np.isfinite(np.asarray(sol.end_forces)).all()


def test_frame_matches_numpy_dense():
    from openpystruct_tpu.fem.frame import frame_system

    cfg = FrameConfig()
    st = build_frame(2, 3, cfg)
    key = jax.random.PRNGKey(0)
    I = jnp.exp(jax.random.normal(key, (st.num_elems,)) * 0.3) * 5e-4
    K, f, _ = frame_system(I, st, cfg, dtype=jnp.float64)
    u_np = np.linalg.solve(np.asarray(K), np.asarray(f))
    sol = solve_frame(I, st, cfg, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(sol.displacements).reshape(-1), u_np, rtol=1e-9,
        atol=1e-15,
    )


def test_column_force_is_global_frame():
    """For a vertical column, end_forces[:,1] must be the GLOBAL Y force
    (the reference's quirk: its 'shear' is the column axial force)."""
    cfg = FrameConfig(lateral_load=0.0, udl=-1e4)
    st = build_frame(1, 1, cfg)
    I = jnp.full(st.num_elems, 5e-4, jnp.float64)
    sol = solve_frame(I, st, cfg, dtype=jnp.float64)
    # gravity UDL on the single beam flows into the two columns axially:
    # each column's global-Y end force at the base ~ half the total load
    total_w = abs(cfg.udl) * cfg.bay_width
    col_y = np.asarray(sol.end_forces)[:2, 1]
    np.testing.assert_allclose(np.abs(col_y).sum(), total_w, rtol=1e-6)


def test_optimize_frame_converges():
    cfg = FrameConfig(max_epochs=300)
    st = build_frame(2, 2, cfg)
    res = jax.jit(
        lambda: optimize_frame(st, cfg, record_history=True)
    )()
    h = np.asarray(res.loss_history)
    n = int(res.n_epochs)
    assert n > 5
    assert h[n - 1] < h[0]
    assert float(res.I.min()) >= 1e-8


def test_optimize_frame_vmap_over_I0():
    cfg = FrameConfig(max_epochs=30)
    st = build_frame(1, 2, cfg)
    I0s = jnp.stack(
        [jnp.full(st.num_elems, v, jnp.float32) for v in (3e-4, 5e-4, 8e-4)]
    )
    res = jax.jit(jax.vmap(lambda I0: optimize_frame(st, cfg, I0=I0)))(I0s)
    assert res.I.shape == I0s.shape
    assert np.isfinite(np.asarray(res.I)).all()
