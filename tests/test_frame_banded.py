"""Banded frame solver + accuracy autopilot tests (VERDICT r4 items 2+4).

The block-tridiagonal solver must match the dense path to roundoff, its
scaled Schur pivots must separate healthy from near-clamp regimes (the
measured calibration in BENCHMARKS.md), and ``solve_frame_checked`` must
escalate exactly the uncertifiable lanes to float64 — matching the
reference's implicit f64 BandGeneral guarantee
(OpenPyStruct_FrameOpt_Discrete_Beta.py:134-139).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.fem import (
    build_frame,
    frame_min_pivot,
    solve_frame,
    solve_frame_banded,
    solve_frame_checked,
)
from openpystruct_tpu.fem.frame_banded import FRAME_VALID_PIVOT


def _rand_I(st, rng, sigma=0.5, I0=5e-4):
    return jnp.asarray(np.exp(rng.normal(size=st.num_elems) * sigma) * I0)


@pytest.mark.parametrize("bays,stories", [(1, 1), (1, 5), (5, 1), (3, 4),
                                          (7, 7)])
def test_banded_matches_dense_f64(bays, stories):
    cfg = FrameConfig()
    st = build_frame(bays, stories, cfg)
    I = _rand_I(st, np.random.default_rng(bays * 13 + stories))
    dense = solve_frame(I, st, cfg, jnp.float64, method="dense")
    banded, piv = solve_frame_banded(I, st, cfg, jnp.float64)
    scale = float(jnp.max(jnp.abs(dense.displacements)))
    np.testing.assert_allclose(
        np.asarray(banded.displacements), np.asarray(dense.displacements),
        atol=1e-10 * scale,
    )
    np.testing.assert_allclose(
        np.asarray(banded.end_forces), np.asarray(dense.end_forces),
        rtol=1e-8, atol=1e-6 * float(jnp.max(jnp.abs(dense.end_forces))),
    )
    assert float(piv) > FRAME_VALID_PIVOT  # healthy frame


def test_banded_vmap_and_load_overrides():
    cfg = FrameConfig()
    st = build_frame(2, 3, cfg)
    rng = np.random.default_rng(0)
    B = 4
    I = jnp.stack([_rand_I(st, rng) for _ in range(B)])
    udl = jnp.asarray(rng.uniform(-2e4, -5e3, B))
    lat = jnp.asarray(rng.uniform(5e3, 2e4, B))
    sols, pivs = jax.vmap(
        lambda i, w, p: solve_frame_banded(i, st, cfg, jnp.float64,
                                           udl=w, lateral_load=p)
    )(I, udl, lat)
    for k in range(B):
        ref = solve_frame(I[k], st, cfg, jnp.float64, method="dense",
                          udl=udl[k], lateral_load=lat[k])
        np.testing.assert_allclose(
            np.asarray(sols.displacements[k]),
            np.asarray(ref.displacements),
            atol=1e-10 * float(jnp.max(jnp.abs(ref.displacements))),
        )
    assert pivs.shape == (B,)


def test_banded_grad_matches_dense():
    """The optimizer differentiates through the solve — the banded path's
    gradient (AD through scan + Cholesky) must match the dense path's."""
    cfg = FrameConfig()
    st = build_frame(2, 2, cfg)
    I = _rand_I(st, np.random.default_rng(7))

    def obj(i, method):
        s = solve_frame(i, st, cfg, jnp.float64, method=method)
        return jnp.sum(s.displacements ** 2) * 1e6 + jnp.sum(
            jnp.abs(s.end_forces)) * 1e-6

    gd = jax.grad(lambda i: obj(i, "dense"))(I)
    gb = jax.grad(lambda i: obj(i, "banded"))(I)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd), rtol=1e-7,
                               atol=1e-9 * float(jnp.max(jnp.abs(gd))))


def test_pivot_separates_regimes():
    """Measured calibration (BENCHMARKS.md frame section): healthy frames
    factor with scaled pivots ~1e-2, near-clamp regimes collapse below
    ~1e-5 with O(10%+) f32 error.  FRAME_VALID_PIVOT must split them."""
    cfg = FrameConfig()
    st = build_frame(3, 3, cfg)
    rng = np.random.default_rng(3)
    I_ok = np.exp(rng.normal(size=st.num_elems) * 0.5) * cfg.I0
    I_bad = I_ok.copy()
    k = int(0.8 * st.num_elems)
    I_bad[rng.choice(st.num_elems, size=k, replace=False)] = 1e-8
    piv_ok = float(frame_min_pivot(jnp.asarray(I_ok, jnp.float32), st, cfg))
    piv_bad = float(frame_min_pivot(jnp.asarray(I_bad, jnp.float32), st,
                                    cfg))
    assert piv_ok > FRAME_VALID_PIVOT * 3
    assert not (piv_bad > FRAME_VALID_PIVOT / 3)  # NaN also fails validity


def test_solve_frame_checked_escalates_and_certifies():
    cfg = FrameConfig()
    st = build_frame(3, 4, cfg)
    rng = np.random.default_rng(1)
    B = 4
    Ib = np.exp(rng.normal(size=(B, st.num_elems)) * 0.5) * cfg.I0
    # lane 3: near-clamp garbage-f32 regime
    Ib[3, rng.choice(st.num_elems, size=int(0.8 * st.num_elems),
                     replace=False)] = 1e-8
    sol, info = solve_frame_checked(jnp.asarray(Ib, jnp.float32), st, cfg,
                                    tol=1e-4)
    assert not info["used_f64"][:3].any()
    assert info["used_f64"][3]
    assert (info["est"] <= 1e-4).all()
    # every lane agrees with the f64 dense reference at the certified tol
    for k in range(B):
        ref = solve_frame(jnp.asarray(Ib[k], jnp.float64), st, cfg,
                          jnp.float64, method="dense")
        err = float(
            jnp.max(jnp.abs(sol.displacements[k]
                            - ref.displacements.astype(jnp.float32)))
            / jnp.max(jnp.abs(ref.displacements))
        )
        assert err < 5e-4, (k, err)


def test_solve_frame_checked_raise_mode():
    """A lane whose f64 pivot-based error bound exceeds the requested tol
    cannot be certified -> on_fail='raise' raises.  (A UNIFORMLY clamped
    frame is benign — Jacobi scaling normalizes it — so the trigger is
    extreme I contrast + a tolerance below the f64 bound eps64/pivot:
    the measured 95%-clamped 2x8 regime has scaled pivot ~1.6e-7, bound
    ~7e-10.)"""
    cfg = FrameConfig()
    st = build_frame(2, 8, cfg)
    rng = np.random.default_rng(5)
    I = np.exp(rng.normal(size=(1, st.num_elems)) * 0.5) * cfg.I0
    I[0, rng.choice(st.num_elems, size=int(0.95 * st.num_elems),
                    replace=False)] = 1e-8
    with pytest.raises(ValueError, match="cannot be certified"):
        solve_frame_checked(jnp.asarray(I, jnp.float32), st, cfg,
                            tol=1e-11, on_fail="raise")


def test_optimize_frame_banded_matches_dense():
    from openpystruct_tpu.opt import optimize_frame

    cfg = FrameConfig(max_epochs=60)
    st = build_frame(2, 2, cfg)
    rd = jax.jit(lambda: optimize_frame(st, cfg, dtype=jnp.float64,
                                        method="dense"))()
    rb = jax.jit(lambda: optimize_frame(st, cfg, dtype=jnp.float64,
                                        method="banded"))()
    np.testing.assert_allclose(np.asarray(rb.I), np.asarray(rd.I),
                               rtol=1e-6)
    assert int(rb.n_epochs) == int(rd.n_epochs)


def test_frame_datagen_valid_uses_pivot():
    """FrameBatch.valid must be accuracy-grade: finite-but-near-singular
    lanes fail the pivot gate (VERDICT r4 weak #1)."""
    from openpystruct_tpu.datagen.frames import generate_frame_batch

    cfg = FrameConfig(max_epochs=25)
    _st, batch = generate_frame_batch(jax.random.PRNGKey(0), 4, num_bays=2,
                                      num_stories=2, cfg=cfg)
    assert batch.pivot.shape == (4,)
    v = np.asarray(batch.valid)
    p = np.asarray(batch.pivot)
    np.testing.assert_array_equal(
        v, np.isfinite(p) & (p > FRAME_VALID_PIVOT)
        & np.isfinite(np.asarray(batch.result.I)).all(-1)
        & np.isfinite(np.asarray(
            batch.result.solution.displacements)).reshape(4, -1).all(-1),
    )
    # real optimized lanes sit ~2 decades above the threshold (measured)
    assert v.all()
    assert (p > 0.05).all()


class TestBlockedCholesky:
    """Panel-blocked level factor (round 5): above _CHOL_BLOCK_MIN_WIDTH
    the fully unrolled Cholesky's program size (m sequential rank-1
    updates) costs minutes of XLA compile per topology; the blocked form
    must be numerically identical and carry the same NaN failure signal."""

    def test_matches_numpy_all_widths(self):
        from openpystruct_tpu.fem.frame_banded import _chol_blocked
        rng = np.random.default_rng(1)
        for m in (7, 16, 21, 48, 63, 93):   # incl. non-multiples of panel
            A = rng.standard_normal((m, m))
            A = A @ A.T + m * np.eye(m)
            Lb = np.asarray(_chol_blocked(jnp.asarray(A)))
            Lu = np.linalg.cholesky(A)
            np.testing.assert_allclose(Lb, Lu, atol=1e-12 * np.abs(Lu).max())

    def test_non_spd_propagates_nan(self):
        from openpystruct_tpu.fem.frame_banded import _chol_blocked
        A = np.eye(21)
        A[17, 17] = -1.0                    # in the last (padded) panel
        L = np.asarray(_chol_blocked(jnp.asarray(A)))
        assert np.isnan(L[17, 17])

    def test_wide_level_solve_matches_dense(self):
        # 20x0 "slab" topology: one story level of width m = 63 forces the
        # blocked path through the full banded solve machinery
        cfg = FrameConfig()
        st = build_frame(20, 2, cfg)
        assert 3 * (st.num_bays + 1) >= 49   # blocked dispatch engaged
        I = _rand_I(st, np.random.default_rng(7))
        dense = solve_frame(I, st, cfg, jnp.float64, method="dense")
        banded, piv = solve_frame_banded(I, st, cfg, jnp.float64)
        scale = float(jnp.max(jnp.abs(dense.displacements)))
        np.testing.assert_allclose(
            np.asarray(banded.displacements),
            np.asarray(dense.displacements), atol=1e-10 * scale,
        )
        assert float(piv) > FRAME_VALID_PIVOT


class TestImplicitAdjoint:
    """block_thomas_solve's custom_vjp (round 5): the frame system is
    symmetric, so the adjoint solve must reuse the forward factors
    (substitution-only) and match reverse-AD through the dense path."""

    @pytest.mark.parametrize("bays,stories", [(3, 4), (20, 2)])
    def test_grad_wrt_I_matches_dense(self, bays, stories):
        # (20, 2) puts m = 63 >= 49 through the blocked-Cholesky dispatch
        cfg = FrameConfig()
        st = build_frame(bays, stories, cfg)
        I = _rand_I(st, np.random.default_rng(11)).astype(jnp.float64)

        def loss_banded(I):
            sol, _ = solve_frame_banded(I, st, cfg, jnp.float64)
            return jnp.sum(sol.displacements**2) + jnp.sum(
                sol.end_forces[:, 1] ** 2) * 1e-12

        def loss_dense(I):
            sol = solve_frame(I, st, cfg, jnp.float64, method="dense")
            return jnp.sum(sol.displacements**2) + jnp.sum(
                sol.end_forces[:, 1] ** 2) * 1e-12

        gb = np.asarray(jax.jit(jax.grad(loss_banded))(I))
        gd = np.asarray(jax.jit(jax.grad(loss_dense))(I))
        np.testing.assert_allclose(gb, gd, rtol=1e-8,
                                   atol=1e-10 * np.abs(gd).max())

    def test_grad_wrt_loads_matches_dense(self):
        cfg = FrameConfig()
        st = build_frame(3, 4, cfg)
        I = _rand_I(st, np.random.default_rng(5)).astype(jnp.float64)
        w0 = jnp.asarray(cfg.udl, jnp.float64)
        p0 = jnp.asarray(cfg.lateral_load, jnp.float64)

        def loss(w, p, method):
            sol = solve_frame(I, st, cfg, jnp.float64, udl=w,
                              lateral_load=p, method=method)
            return jnp.sum(sol.displacements**2)

        gb = jax.jit(jax.grad(loss, argnums=(0, 1)),
                     static_argnums=2)(w0, p0, "banded")
        gd = jax.jit(jax.grad(loss, argnums=(0, 1)),
                     static_argnums=2)(w0, p0, "dense")
        for b, d in zip(gb, gd):
            np.testing.assert_allclose(float(b), float(d), rtol=1e-9)

    def test_adjoint_optimize_matches_dense_trajectory(self):
        from openpystruct_tpu.opt.frame_opt import optimize_frame

        cfg = dataclasses.replace(FrameConfig(), max_epochs=25,
                                  patience=10**6)
        st = build_frame(3, 3, cfg)
        rb = jax.jit(lambda: optimize_frame(
            st, cfg, grad_mode="adjoint", dtype=jnp.float64,
            method="banded"))()
        rd = jax.jit(lambda: optimize_frame(
            st, cfg, grad_mode="adjoint", dtype=jnp.float64,
            method="dense"))()
        np.testing.assert_allclose(np.asarray(rb.I), np.asarray(rd.I),
                                   rtol=1e-8)
        assert np.isfinite(float(rb.loss.total))
        assert float(jnp.min(rb.I)) >= 1e-8 - 1e-12
