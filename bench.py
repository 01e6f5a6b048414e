"""Headline benchmark: batched beam FEA solves/sec on the accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (the reference's compute pattern): the reference performs one
serial banded direct solve per optimizer epoch per sample through OpenSeesPy
on CPU (OpenPyStruct_BeamOpt.py:122-126,199-207).  Since OpenSeesPy is not
installable here, the baseline is measured as a *generous* stand-in: a
serial CPU loop of scipy banded-Cholesky solves of the identical 303-DOF
system — ignoring the ~500 per-epoch Python<->C++ crossings the reference
also pays, so the reported speedup is a lower bound.
"""

import json
import sys
import time

import numpy as np


def build_system(I, n=101, L=200.0, E=200e9, A=0.01, udl=-1000.0):
    """Assemble the reference beam system as a dense banded matrix (host)."""
    import jax.numpy as jnp

    from openpystruct_tpu.fem import BeamScenario, assemble_beam_system

    node_x = jnp.linspace(0.0, L, n)
    roller = jnp.zeros(n, bool).at[jnp.array([9, 29, 69, 84, 99])].set(True)
    loads = jnp.zeros(n).at[jnp.array([15, 44, 91])].set(
        jnp.array([-3e5, -1e5, -2.5e5])
    )
    sc = BeamScenario(
        node_x=node_x, roller_mask=roller, point_loads=loads,
        udl=jnp.asarray(udl),
    )
    diag, upper, f = assemble_beam_system(jnp.asarray(I), sc, E, A)
    return sc, np.asarray(diag), np.asarray(upper), np.asarray(f)


def cpu_baseline_rate(diag, upper, f, iters=300):
    """Serial scipy banded-Cholesky solves of the same system (CPU)."""
    from scipy.linalg import solveh_banded

    n = diag.shape[0]
    N = 3 * n
    dense = np.zeros((N, N))
    for i in range(n):
        dense[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = diag[i]
    for i in range(n - 1):
        dense[3 * i : 3 * i + 3, 3 * i + 3 : 3 * i + 6] = upper[i]
        dense[3 * i + 3 : 3 * i + 6, 3 * i : 3 * i + 3] = upper[i].T
    # upper banded storage, bandwidth 5 (3 DOF blocks, chain coupling)
    bw = 5
    ab = np.zeros((bw + 1, N))
    for k in range(bw + 1):
        ab[bw - k, k:] = np.diagonal(dense, offset=k)
    rhs = f.reshape(-1)
    t0 = time.perf_counter()
    for _ in range(iters):
        solveh_banded(ab, rhs)
    dt = time.perf_counter() - t0
    return iters / dt


def device_rate(sc, I, batch=8192, reps=10, refine=1):
    """Full batched FEA (assembly + solve + force recovery).

    On TPU this runs the fully-fused Pallas kernel; elsewhere the split
    assembly + scan-solver path.
    """
    import jax
    import jax.numpy as jnp

    from openpystruct_tpu.fem.beam import constraint_mask, solve_beam_batched

    E, A = 200e9, 0.01
    sc32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        sc,
    )
    sc_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                        sc32)
    key = jax.random.PRNGKey(0)
    Ib = (
        jnp.exp(jax.random.normal(key, (batch, len(I)), jnp.float32) * 0.3)
        * 0.5
    )
    if jax.default_backend() == "tpu":
        from openpystruct_tpu.ops.beam_kernel import pallas_beam_analysis

        Le = jnp.diff(sc_b.node_x, axis=-1)
        free = (~jax.vmap(constraint_mask)(sc_b)).astype(jnp.float32)
        fn = jax.jit(
            lambda Ib: pallas_beam_analysis(
                Ib, Le, free, sc_b.point_loads, sc_b.udl, E, A,
                refine=refine,
            )[0]
        )  # [0] = displacements; outputs also include V, M, pivot
    else:
        fn = jax.jit(
            lambda Ib: solve_beam_batched(
                Ib, sc_b, E, A, refine=refine, use_pallas=False
            ).deflections
        )
    out = fn(Ib)
    out.block_until_ready()
    # Remote-device links add ~10% run-to-run jitter; take the best of
    # several timing rounds (the standard throughput-measurement practice —
    # slower rounds measure interference, not the kernel).
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(Ib)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        best = max(best, batch / dt)
    return best


def main():
    import jax

    I = np.full(100, 0.5, np.float32)
    sc, diag, upper, f = build_system(I)
    base = max(cpu_baseline_rate(diag, upper, f, iters=100)
               for _ in range(3))
    dev = device_rate(sc, I, reps=30)
    print(
        f"device={jax.devices()[0]} base={base:.0f}/s dev={dev:.0f}/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "batched beam FEA solves/sec",
                "value": round(dev, 1),
                "unit": "solves/sec",
                "vs_baseline": round(dev / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
