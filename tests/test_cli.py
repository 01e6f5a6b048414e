"""CLI smoke tests (subprocess, CPU): the user-facing script surface."""

import json
import os
import subprocess
import sys

import pytest

ENV = {
    **os.environ,
    # JAX_PLATFORMS alone is NOT enough on hosts whose PJRT boot hook
    # (sitecustomize) hard-sets jax.config.jax_platforms — the package
    # re-applies this override before any backend initializes
    "OPENPYSTRUCT_PLATFORM": "cpu",
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
}


def run_cli(*args, timeout=900):
    # each CLI subprocess pays full cold jit compiles; on a loaded 1-core
    # host the datagen/train invocations are marginal against 420 s
    return subprocess.run(
        [sys.executable, "-m", "openpystruct_tpu", *args],
        capture_output=True, text=True, timeout=timeout, env=ENV,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


@pytest.mark.slow
def test_cli_beam_opt_runs():
    r = run_cli("beam-opt", "--epochs", "8", "--refine", "0")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Total Loss:" in r.stdout
    assert "Primary Loss:" in r.stdout


@pytest.mark.slow
def test_cli_frame_opt_batch(tmp_path):
    out = str(tmp_path / "frames.json")
    r = run_cli("frame-opt", "--bays", "2", "--stories", "1", "--epochs",
                "10", "--batch", "6", "--output", out)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "load scenarios optimized" in r.stdout
    data = json.load(open(out))
    assert len(data["I_values"]) == 6
    assert data["num_bays"] == 2 and data["num_stories"] == 1


@pytest.mark.slow
def test_cli_datagen_train_predict_roundtrip(tmp_path):
    ds = str(tmp_path / "ds.json")
    r = run_cli("datagen", "--num-samples", "48", "--batch-size", "48",
                "--max-epochs", "15", "--refine", "0", "--output", ds)
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.load(open(ds))
    assert len(data["I_values"]) > 0

    ck = str(tmp_path / "ckpt")
    r = run_cli("train", "--model", "fnn", "--data", ds, "--epochs", "3",
                "--epochs-per-sync", "3", "--checkpoint", ck)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "R² on Validation:" in r.stdout
    assert os.path.exists(ck + "_preproc.npz")

    r = run_cli("predict", "--model", "fnn", "--checkpoint", ck,
                "--preproc", ck + "_preproc.npz")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "predicted I" in r.stdout


@pytest.mark.slow
def test_cli_mesh_size_roundtrip_and_observability(tmp_path):
    """datagen -> train -> predict at a NON-reference mesh size (201
    nodes), with the observability flags live: the mesh-scaling claim
    holds through the whole user surface (VERDICT r4 items 5+6), and the
    structured metrics artifacts appear and parse."""
    ds = str(tmp_path / "ds201.json")
    r = run_cli("datagen", "--num-samples", "48", "--batch-size", "48",
                "--num-nodes", "201", "--max-epochs", "10", "--refine",
                "0", "--output", ds)
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.load(open(ds))
    assert len(data["I_values"][0]) == 200  # elements = nodes - 1

    ck = str(tmp_path / "ckpt201")
    jsonl = str(tmp_path / "metrics.jsonl")
    tbdir = str(tmp_path / "tb")
    r = run_cli("train", "--model", "fnn", "--data", ds, "--epochs", "3",
                "--epochs-per-sync", "3", "--checkpoint", ck,
                "--metrics-jsonl", jsonl, "--tensorboard", tbdir)
    assert r.returncode == 0, r.stderr[-2000:]
    # metrics JSONL: one parseable entry per epoch with both losses
    entries = [json.loads(line) for line in open(jsonl)]
    assert len(entries) == 3
    assert all("train_loss" in e and "val_loss" in e and "step" in e
               for e in entries)
    # TensorBoard: an events file with content appeared
    evts = [f for f in os.listdir(tbdir) if "tfevents" in f]
    assert evts and os.path.getsize(os.path.join(tbdir, evts[0])) > 0

    r = run_cli("predict", "--model", "fnn", "--checkpoint", ck,
                "--preproc", ck + "_preproc.npz")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mesh: 200 elements" in r.stdout
    assert "predicted I" in r.stdout


@pytest.mark.slow
def test_cli_datagen_flags(tmp_path):
    """--no-compact / --no-rescue / --watch surface: the datagen flags run
    end-to-end and train writes the live plot PNG."""
    ds = str(tmp_path / "ds.json")
    # cold-cache subprocesses pay full jit compiles; give them headroom
    r = run_cli("datagen", "--num-samples", "32", "--batch-size", "32",
                "--max-epochs", "10", "--refine", "0", "--output", ds,
                "--no-compact", "--no-rescue", "--random-bridge",
                timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.load(open(ds))
    assert len(data["I_values"]) > 0

    png = str(tmp_path / "live.png")
    r = run_cli("train", "--model", "fnn", "--data", ds, "--epochs", "2",
                "--epochs-per-sync", "1", "--watch", png, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(png) and os.path.getsize(png) > 1000
