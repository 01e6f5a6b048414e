"""Batched frame driver tests (the TPU-first frame story round 2 lacked).

Reference baseline: one frame optimized serially per run
(OpenPyStruct_FrameOpt_Discrete_Beta.py:166-206).  Here a batch of load
scenarios shares one program; per-lane trajectories must equal the
single-scenario loop's.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.datagen import (
    frame_batch_to_columnar,
    generate_frame_batch,
    sample_frame_loads,
)
from openpystruct_tpu.fem import build_frame
from openpystruct_tpu.opt import optimize_frame, optimize_frame_batched
from openpystruct_tpu.parallel import default_mesh

FAST = FrameConfig(max_epochs=40)


def test_batched_matches_single():
    cfg = FAST
    structure = build_frame(2, 2, cfg)
    udl = jnp.asarray([-1e4, -0.7e4, -1.3e4], jnp.float32)
    lat = jnp.asarray([1e4, 1.2e4, 0.6e4], jnp.float32)
    res_b = jax.jit(
        lambda u, p: optimize_frame_batched(structure, u, p, cfg)
    )(udl, lat)
    for i in range(3):
        res_1 = jax.jit(
            lambda u, p: optimize_frame(structure, cfg, udl=u,
                                        lateral_load=p)
        )(udl[i], lat[i])
        np.testing.assert_allclose(
            np.asarray(res_b.I)[i], np.asarray(res_1.I), rtol=1e-6
        )
        assert int(res_b.n_epochs[i]) == int(res_1.n_epochs)

    # default loads reproduce the reference configuration exactly
    res_d = jax.jit(lambda: optimize_frame(structure, cfg))()
    res_b2 = jax.jit(
        lambda u, p: optimize_frame_batched(structure, u, p, cfg)
    )(jnp.full((1,), cfg.udl, jnp.float32),
      jnp.full((1,), cfg.lateral_load, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(res_b2.I)[0], np.asarray(res_d.I), rtol=1e-6
    )


def test_chunked_matches_unchunked():
    """chunk_size serializes lanes into lax.map chunks (the HBM bound for
    very large topology x batch); the trajectory must be identical,
    including a chunk size that does not divide the batch (padding lanes
    are sliced off)."""
    cfg = FAST
    structure = build_frame(2, 3, cfg)
    udl, lat = sample_frame_loads(jax.random.PRNGKey(7), 5, cfg)
    full = jax.jit(
        lambda u, p: optimize_frame_batched(structure, u, p, cfg)
    )(udl, lat)
    for chunk in (2, 5, 8):
        part = jax.jit(
            lambda u, p: optimize_frame_batched(
                structure, u, p, cfg, chunk_size=chunk
            )
        )(udl, lat)
        # different batch shapes can vectorize reductions differently, so
        # match the batched-vs-single tolerance rather than bitwise
        np.testing.assert_allclose(
            np.asarray(full.I), np.asarray(part.I), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(full.n_epochs), np.asarray(part.n_epochs)
        )

    # the datagen wrapper threads chunk_size through (incl. the chunked
    # pivot pass) and keeps validity/pivot identical
    _, b_full = generate_frame_batch(
        jax.random.PRNGKey(9), 6, num_bays=2, num_stories=2, cfg=cfg
    )
    _, b_chunk = generate_frame_batch(
        jax.random.PRNGKey(9), 6, num_bays=2, num_stories=2, cfg=cfg,
        chunk_size=4,
    )
    np.testing.assert_allclose(
        np.asarray(b_full.result.I), np.asarray(b_chunk.result.I),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(b_full.pivot), np.asarray(b_chunk.pivot), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(b_full.valid), np.asarray(b_chunk.valid)
    )


def test_generate_frame_batch_and_columnar():
    structure, batch = generate_frame_batch(
        jax.random.PRNGKey(0), 8, num_bays=3, num_stories=2, cfg=FAST
    )
    valid = np.asarray(batch.valid)
    assert valid.all()
    I = np.asarray(batch.result.I)
    assert I.shape == (8, structure.num_elems)
    assert (I >= 1e-8).all()
    # loads actually vary and optimization responds to them
    assert len(np.unique(np.asarray(batch.udl))) == 8
    assert np.std(I.sum(axis=1)) > 0.0

    cols = frame_batch_to_columnar(structure, batch)
    assert cols["num_bays"] == 3 and cols["num_stories"] == 2
    assert len(cols["I_values"]) == 8
    assert len(cols["I_values"][0]) == structure.num_elems
    assert len(cols["displacements"][0]) == structure.num_nodes


def test_generate_frame_batch_sharded_matches_unsharded():
    mesh = default_mesh(("data",))
    _, b0 = generate_frame_batch(
        jax.random.PRNGKey(3), 16, num_bays=2, num_stories=2, cfg=FAST
    )
    _, b1 = generate_frame_batch(
        jax.random.PRNGKey(3), 16, num_bays=2, num_stories=2, cfg=FAST,
        mesh=mesh,
    )
    # shard_map and plain vmap give XLA different fusion layouts for the
    # banded solver's level scan, so f32 accumulation order differs
    # slightly; after 40 optimizer epochs the trajectories agree to ~1e-5
    # relative (measured 2.8e-5 max), not bitwise
    np.testing.assert_allclose(
        np.asarray(b0.result.I), np.asarray(b1.result.I), rtol=3e-4
    )


def test_sample_frame_loads_distribution():
    cfg = FrameConfig()
    udl, lat = sample_frame_loads(jax.random.PRNGKey(1), 4096, cfg)
    udl, lat = np.asarray(udl), np.asarray(lat)
    # scaled versions of the reference loads, right sign and range
    assert (udl <= 0.5 * cfg.udl).all() and (udl >= 1.5 * cfg.udl).all()
    assert (lat >= 0.5 * cfg.lateral_load).all()
    assert (lat <= 1.5 * cfg.lateral_load).all()
    # roughly uniform: mean near the midpoint
    assert abs(udl.mean() / cfg.udl - 1.0) < 0.02


def test_generate_frame_dataset_mixed_topologies():
    """One call covers the reference's random 1-10x1-10 topology
    distribution (OpenPyStruct_FrameOpt_Discrete_Beta.py:50-52): lanes
    bucketed per (bays, stories), per-row topology columns, padding lanes
    dropped."""
    from openpystruct_tpu.datagen import generate_frame_dataset

    data = generate_frame_dataset(
        jax.random.PRNGKey(0), 48, FAST, bays_range=(1, 4),
        stories_range=(1, 4), min_bucket=4,
    )
    rows = len(data["I_values"])
    assert rows <= 48
    assert rows >= 40  # fixed-base frames essentially never fail
    topos = set(zip(data["num_bays"], data["num_stories"]))
    assert len(topos) >= 6  # 48 draws over a 16-cell grid
    for b, s in topos:
        assert 1 <= b <= 4 and 1 <= s <= 4
    # per-row shapes are consistent with the row's topology:
    # elements = 2*b*s + ... columns then beams; nodes = (b+1)*(s+1)
    for i in range(rows):
        b, s = data["num_bays"][i], data["num_stories"][i]
        n_cols = b + 1  # columns per story: (bays+1)
        nelem = s * n_cols + s * b  # columns then beams per story
        assert len(data["I_values"][i]) == nelem, (i, b, s)
        assert len(data["displacements"][i]) == (b + 1) * (s + 1)
        assert np.isfinite(np.asarray(data["I_values"][i])).all()
    # every sampled topology count is preserved (no silent drops beyond
    # the validity filter)
    assert len(set(map(tuple, data["I_values"][:5]))) > 1  # distinct rows


def test_generate_frame_batch_adjoint_mode():
    """grad_mode="adjoint" is a first-class frame datagen citizen (the
    beam path got this in round 5's datagen CLI work): exact gradients
    through the banded solve via the implicit custom_vjp, all lanes kept,
    and a result that differs from (improves on) the semi trajectory."""
    _, semi = generate_frame_batch(jax.random.PRNGKey(3), 8, 2, 2, FAST)
    _, adj = generate_frame_batch(jax.random.PRNGKey(3), 8, 2, 2, FAST,
                                  grad_mode="adjoint")
    assert np.asarray(adj.valid).all()
    # same loads, different gradient rule -> different optimized I
    assert np.abs(
        np.asarray(adj.result.I) - np.asarray(semi.result.I)
    ).max() > 0
    assert np.isfinite(np.asarray(adj.result.loss.total)).all()
