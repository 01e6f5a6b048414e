"""Driver-contract tests for __graft_entry__.

The round-1 driver run failed because dryrun_multichip inherited the ambient
(broken-TPU) platform; it must now self-provision a virtual CPU mesh in every
environment (VERDICT.md round 1, next-round item 1).
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces():
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


def test_dryrun_multichip_inprocess():
    # conftest provides an 8-device CPU platform -> fast in-process path.
    graft.dryrun_multichip(8)


def test_dryrun_multichip_subprocess_with_hostile_platform():
    # Simulate the driver environment where the ambient platform is a broken
    # TPU plugin: any default-backend initialization would raise, so the
    # dryrun must never touch it.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "bogus_tpu"
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    subprocess.run(
        [sys.executable, "-c", code, REPO],
        env=env, cwd=REPO, check=True, timeout=900,
    )
