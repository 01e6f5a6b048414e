"""Frame I-field optimization.

Reference loop (OpenPyStruct_FrameOpt_Discrete_Beta.py:166-206): Adam with
lr=0.005 and NO learning-rate scheduler, loss

  sum(I) + alpha_m * sum(M^2 / (2 E I + 1e-8))
         + alpha_s * sum(F_y^2 / (G * 0.03 * sqrt(I)))

where F_y is the element's global-Y end force (``response[1]`` — the axial
force for vertical columns; see fem/frame.py docstring), post-step clamp
I >= 1e-8, and early stop at tolerance 1e-3 / patience 10 over <= 5000
epochs.  Semi-gradient like the beam: the force fields are constants per
iteration (the reference accumulates Python floats, FrameOpt:149-158).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from openpystruct_tpu.config import FrameConfig
from openpystruct_tpu.fem.frame import FrameSolution, FrameStructure, solve_frame
from openpystruct_tpu.opt.loss import LossComponents


@struct.dataclass
class FrameOptResult:
    I: jax.Array
    solution: FrameSolution
    loss: LossComponents
    n_epochs: jax.Array
    converged: jax.Array
    loss_history: Optional[jax.Array] = None


def frame_loss(I, solution: FrameSolution, cfg: FrameConfig,
               alpha_moment: float = 1e-2, alpha_shear: float = 1e-2,
               grad_mode: str = "semi") -> LossComponents:
    fy = solution.end_forces[:, 1]
    mz = solution.end_forces[:, 2]
    if grad_mode == "semi":
        fy = jax.lax.stop_gradient(fy)
        mz = jax.lax.stop_gradient(mz)
    bending = jnp.sum(mz**2 / (2.0 * cfg.E * I + 1e-8))
    shear = jnp.sum(fy**2 / (cfg.G * (0.03 * jnp.sqrt(I))))
    primary = jnp.sum(I)
    b, s = alpha_moment * bending, alpha_shear * shear
    return LossComponents(
        total=primary + b + s, primary=primary,
        bending_energy=b, shear_energy=s,
    )


def optimize_frame(
    structure: FrameStructure,
    cfg: FrameConfig = FrameConfig(),
    I0: Optional[jax.Array] = None,
    lr: Optional[float] = None,
    alpha_moment: float = 1e-2,
    alpha_shear: float = 1e-2,
    grad_mode: str = "semi",
    record_history: bool = False,
    dtype=jnp.float32,
    udl=None,
    lateral_load=None,
    method: str = "auto",
) -> FrameOptResult:
    """Vmappable over I0 and the per-scenario ``udl``/``lateral_load``
    overrides (see :func:`optimize_frame_batched`).

    ``method`` selects the linear solver (see ``fem.frame.solve_frame``):
    dense batched LU or the story-level block-Cholesky Thomas
    factorization; "auto" = banded (measured faster at every topology)."""
    if I0 is None:
        I0 = jnp.full((structure.num_elems,), cfg.I0, dtype)
    if lr is None:
        lr = cfg.lr

    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state0 = tx.init(I0)

    def eval_loss(I):
        # Semi-gradient: the force fields are per-iteration constants, so
        # stop the gradient at the solve INPUT — otherwise XLA compiles the
        # (dead) dense-LU backward of every while_loop iteration.
        I_solve = jax.lax.stop_gradient(I) if grad_mode == "semi" else I
        sol = solve_frame(I_solve, structure, cfg, dtype, udl=udl,
                          lateral_load=lateral_load, method=method)
        comps = frame_loss(I, sol, cfg, alpha_moment, alpha_shear, grad_mode)
        return comps.total, (sol, comps)

    grad_fn = jax.value_and_grad(eval_loss, has_aux=True)
    sol0, comps0 = eval_loss(I0)[1]
    loss_dtype = comps0.total.dtype
    hist0 = (
        jnp.full((cfg.max_epochs,), jnp.nan, loss_dtype)
        if record_history else None
    )

    carry0 = dict(
        I=I0, opt_state=opt_state0, epoch=jnp.asarray(0, jnp.int32),
        best=jnp.asarray(jnp.inf, loss_dtype),
        no_improve=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False), sol=sol0, comps=comps0, hist=hist0,
    )

    def cond(c):
        return (~c["done"]) & (c["epoch"] < cfg.max_epochs)

    def body(c):
        (total, (sol, comps)), g = grad_fn(c["I"])
        updates, opt_state = tx.update(g, c["opt_state"], c["I"])
        I_new = jnp.maximum(optax.apply_updates(c["I"], updates), 1e-8)
        improved = total < c["best"] - cfg.tolerance
        best = jnp.where(improved, total, c["best"])
        no_improve = jnp.where(improved, 0, c["no_improve"] + 1)
        hist = c["hist"]
        if hist is not None:
            hist = jax.lax.dynamic_update_slice(
                hist, total.astype(hist.dtype)[None],
                (c["epoch"],),
            )
        return dict(
            I=I_new, opt_state=opt_state, epoch=c["epoch"] + 1,
            best=best, no_improve=no_improve,
            done=no_improve >= cfg.patience, sol=sol, comps=comps,
            hist=hist,
        )

    c = jax.lax.while_loop(cond, body, carry0)
    # Re-run the analysis at the converged I before reporting, as the
    # reference does (FrameOpt_Discrete_Beta.py:217-219) — the in-loop
    # solution trails the final clamp/step by one iteration.
    sol_f = solve_frame(jax.lax.stop_gradient(c["I"]), structure, cfg,
                        dtype, udl=udl, lateral_load=lateral_load,
                        method=method)
    comps_f = frame_loss(c["I"], sol_f, cfg, alpha_moment, alpha_shear,
                         grad_mode)
    return FrameOptResult(
        I=c["I"], solution=sol_f, loss=comps_f,
        n_epochs=c["epoch"], converged=c["done"], loss_history=c["hist"],
    )


def optimize_frame_batched(
    structure: FrameStructure,
    udl,
    lateral_load,
    cfg: FrameConfig = FrameConfig(),
    I0: Optional[jax.Array] = None,
    lr: Optional[float] = None,
    alpha_moment: float = 1e-2,
    alpha_shear: float = 1e-2,
    grad_mode: str = "semi",
    dtype=jnp.float32,
    method: str = "auto",
    chunk_size: Optional[int] = None,
) -> FrameOptResult:
    """Batched frame optimization: one topology, ``B`` load scenarios.

    The TPU-first frame driver the reference has no analog of (its frame
    script optimizes exactly one random frame serially,
    OpenPyStruct_FrameOpt_Discrete_Beta.py:166-206): ``udl`` and
    ``lateral_load`` are (B,) per-scenario loads, the per-lane systems
    batch into one banded block-Cholesky factorization per iteration
    (``fem.frame_banded``; ``method="dense"`` keeps the (B, 3N, 3N)
    MXU LU), and each lane carries its own early-stopping state
    (converged lanes freeze under the shared while_loop, exactly like
    ``vmap`` semantics — because it IS vmap of the single-scenario
    loop).

    ``chunk_size`` bounds peak HBM at large topology x batch products
    (a 30x30 grid at B=512 exhausts a v5e under the dense method; the
    banded solver at that scale wants chunks <= ~256): lanes run in
    sequential ``lax.map`` chunks of that size, trading wall-clock
    serialization for a fixed working set.  ``None`` (default) runs the
    whole batch as one program.

    Topology is static (index arrays fix the trace), so batches group by
    (bays, stories); jit wrappers cache per topology shape.
    """
    B = jnp.shape(udl)[0]
    if I0 is None:
        I0 = jnp.full((B, structure.num_elems), cfg.I0, dtype)
    udl = jnp.asarray(udl, dtype)
    lateral_load = jnp.asarray(lateral_load, dtype)

    run = jax.vmap(
        lambda I0_, w, p: optimize_frame(
            structure, cfg, I0=I0_, lr=lr, alpha_moment=alpha_moment,
            alpha_shear=alpha_shear, grad_mode=grad_mode, dtype=dtype,
            udl=w, lateral_load=p, method=method,
        )
    )

    if chunk_size is None or chunk_size >= B:
        return run(I0, udl, lateral_load)
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")

    # Pad B up to a chunk multiple with copies of lane 0 (any solvable
    # load works — padding lanes are sliced off below), then lax.map over
    # (num_chunks, chunk_size) so chunks execute strictly sequentially:
    # peak live memory is one chunk's working set, not the whole batch's.
    pad = (-B) % chunk_size
    edge = lambda a: jnp.concatenate(
        [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
    ) if pad else a
    split = lambda a: a.reshape((-1, chunk_size) + a.shape[1:])
    res = jax.lax.map(
        lambda args: run(*args),
        (split(edge(I0)), split(edge(udl)), split(edge(lateral_load))),
    )
    return jax.tree.map(
        lambda x: x.reshape((B + pad,) + x.shape[2:])[:B], res
    )
