"""Adam optimization of the per-element moment-of-inertia field.

Reference semantics reproduced exactly (OpenPyStruct_BeamOpt.py:179-244 and
the datagen loop at OpenPyStruct_BeamOpt_training_MultiCore.py:164-219):

  each epoch: FE solve at the current I -> combined loss -> Adam step with
  ExponentialLR decay -> clamp I >= 1e-8 -> early stop when the loss fails
  to improve by ``tolerance`` for ``patience`` consecutive epochs.

Differences in *mechanism* (not semantics): the reference wipes and rebuilds
the OpenSees model each epoch through ~500 Python<->C++ calls; here the whole
loop is a single ``lax.while_loop`` inside one XLA program, vmappable over
thousands of scenarios at once (that vmap is what replaces the 22-process
joblib pool of the MultiCore datagen driver).

Faithful reproduction notes:
- the loss is evaluated at I_t and the step produces I_{t+1}; on exit the
  returned ``solution`` corresponds to the *last solved* I (the reference
  reads eleResponse/nodeDisp after the loop without re-analyzing,
  OpenPyStruct_BeamOpt.py:269-274, MultiCore.py:222-223) while the returned
  ``I`` has the final step applied (MultiCore.py:230) — same off-by-one as
  the reference;
- torch Adam(lr) + ExponentialLR(gamma) == optax scale_by_adam with an
  exponential-decay schedule stepped once per epoch;
- the clamp is a projection applied to I only, not to Adam state.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from openpystruct_tpu.config import BeamConfig, OptimizerConfig
from openpystruct_tpu.fem.beam import BeamScenario, BeamSolution, solve_beam
from openpystruct_tpu.opt.loss import LossComponents, structural_loss


@struct.dataclass
class BeamOptResult:
    I: jax.Array                 # (nelem,) optimized moments of inertia
    I_solved: jax.Array          # (nelem,) the I at which ``solution`` holds
    solution: BeamSolution       # FE fields at the last solved I
    loss: LossComponents         # loss components at the last evaluation
    n_epochs: jax.Array          # epochs actually run
    converged: jax.Array         # True if early-stopped before max_epochs
    loss_history: Optional[jax.Array] = None  # (max_epochs, 4) or None
    # min Schur pivot of the last solved system (fused-kernel path only) —
    # the singularity diagnostic, captured for free during factorization
    pivot: Optional[jax.Array] = None


def _adam(lr: float, gamma: float) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=lr, transition_steps=1, decay_rate=gamma
    )
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )


def optimize_beam(
    scenario: BeamScenario,
    beam: BeamConfig = BeamConfig(),
    opt: OptimizerConfig = OptimizerConfig(),
    I0: Optional[jax.Array] = None,
    refine: int = 0,
    record_history: bool = False,
) -> BeamOptResult:
    """Run the I-field optimization for one scenario (vmappable).

    Under ``jax.vmap`` the while_loop runs until every lane in the batch has
    converged (converged lanes freeze), bounded by ``opt.max_epochs``.
    """
    nelem = scenario.num_nodes - 1
    if I0 is None:
        I0 = jnp.full((nelem,), beam.I0, dtype=jnp.float32)
    dtype = I0.dtype

    tx = _adam(opt.lr, opt.lr_gamma)
    opt_state0 = tx.init(I0)

    E, G, A = beam.E, beam.G, beam.A

    def eval_loss(I):
        # see optimize_beam_batched: in semi mode the solve is a constant
        I_solve = jax.lax.stop_gradient(I) if opt.grad_mode == "semi" else I
        sol = solve_beam(I_solve, scenario, E, A, refine=refine)
        comps = structural_loss(
            I,
            sol.bending_moments,
            sol.shear_forces,
            E,
            G,
            opt.alpha_moment,
            opt.alpha_shear,
            grad_mode=opt.grad_mode,
        )
        return comps.total, (sol, comps)

    grad_fn = jax.value_and_grad(eval_loss, has_aux=True)

    sol0, comps0 = eval_loss(I0)[1]
    loss_dtype = comps0.total.dtype
    hist0 = (
        jnp.full((opt.max_epochs, 4), jnp.nan, dtype=loss_dtype)
        if record_history
        else None
    )

    carry0 = dict(
        I=I0,
        I_solved=I0,
        opt_state=opt_state0,
        epoch=jnp.asarray(0, jnp.int32),
        best=jnp.asarray(jnp.inf, loss_dtype),
        no_improve=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        sol=sol0,
        comps=comps0,
        hist=hist0,
    )

    def cond(c):
        return (~c["done"]) & (c["epoch"] < opt.max_epochs)

    def body(c):
        (total, (sol, comps)), g = grad_fn(c["I"])
        updates, opt_state = tx.update(g, c["opt_state"], c["I"])
        I_new = jnp.maximum(optax.apply_updates(c["I"], updates), opt.clamp_min)

        improved = total < c["best"] - opt.tolerance
        best = jnp.where(improved, total, c["best"])
        no_improve = jnp.where(improved, 0, c["no_improve"] + 1)
        done = no_improve >= opt.patience

        hist = c["hist"]
        if hist is not None:
            row = jnp.stack(
                [comps.total, comps.primary, comps.bending_energy,
                 comps.shear_energy]
            ).astype(hist.dtype)
            hist = jax.lax.dynamic_update_slice(
                hist, row[None, :],
                (c["epoch"], jnp.asarray(0, c["epoch"].dtype)),
            )

        return dict(
            I=I_new,
            I_solved=c["I"],
            opt_state=opt_state,
            epoch=c["epoch"] + 1,
            best=best,
            no_improve=no_improve,
            done=done,
            sol=sol,
            comps=comps,
            hist=hist,
        )

    c = jax.lax.while_loop(cond, body, carry0)

    return BeamOptResult(
        I=c["I"],
        I_solved=c["I_solved"],
        solution=c["sol"],
        loss=c["comps"],
        n_epochs=c["epoch"],
        converged=c["done"],
        loss_history=c["hist"],
    )


def optimize_beam_batched(
    scenario: BeamScenario,
    beam: BeamConfig = BeamConfig(),
    opt: OptimizerConfig = OptimizerConfig(),
    I0: Optional[jax.Array] = None,
    refine: int = 0,
    use_pallas: bool = True,
    interpret: bool = False,
    fused: Optional[bool] = None,
    dd: bool = False,
) -> BeamOptResult:
    """Explicitly-batched optimizer: every leaf of ``scenario`` has a
    leading batch dim, the FE solves run the Pallas kernel on the whole
    batch, and each lane carries its own early-stopping state (converged
    lanes freeze, exactly like ``vmap(optimize_beam)``).

    Adam + per-epoch exponential lr decay are inlined with torch-identical
    math (bias-corrected moments, lr_t = lr * gamma^t, post-step clamp);
    the trajectory therefore matches ``optimize_beam`` whose own parity with
    the reference's torch loop is tested step-for-step.

    ``fused`` selects the fully-fused Pallas opt-step kernel (assembly +
    solve + loss + gradient + Adam update per launch, everything in VMEM;
    ops/beam_kernel.py).  Default: on whenever the Pallas path is on.  Both
    gradient modes ride it: semi-gradient computes the explicit dL/dI in
    kernel, adjoint mode adds the implicit chain with one extra
    substitution pair against the saved factorization.  The while_loop
    carry holds only the (B, nelem) optimizer state — no displacement or
    force fields — and the reported solution comes from one final fused
    analysis at the last-solved I (bitwise the same solve the loop saw).
    """
    B = scenario.node_x.shape[0]
    nelem = scenario.node_x.shape[-1] - 1
    if I0 is None:
        I0 = jnp.full((B, nelem), beam.I0, dtype=jnp.float32)
    dtype = I0.dtype
    if fused is None:
        fused = use_pallas and _fits_fused(nelem + 1)

    kernel_step = _make_kernel_step(
        scenario, beam, opt, refine, use_pallas, fused, interpret, dtype,
        dd=dd,
    )

    carry0 = dict(
        _lane_state_init(I0),
        epoch=jnp.asarray(0, jnp.int32),
    )

    def cond(c):
        return jnp.any(~c["done"]) & (c["epoch"] < opt.max_epochs)

    body = _make_freeze_body(kernel_step, opt)
    c = jax.lax.while_loop(cond, body, carry0)

    sol, piv = _final_solution(
        scenario, c["I_solved"], beam, refine, use_pallas, fused, interpret,
        dd=dd,
    )

    return BeamOptResult(
        I=c["I"],
        I_solved=c["I_solved"],
        solution=sol,
        loss=c["comps"],
        n_epochs=c["n_epochs"],
        converged=c["done"],
        loss_history=None,
        pivot=piv,
    )


def _fits_fused(n_nodes: int) -> bool:
    """Whether the fused opt-step kernel's VMEM working set fits at this
    mesh size (at some slab depth); past it the split path takes over.
    The bending-only (2x2) kernel layout roughly doubles the resident
    range over the round-3 3-DOF layout (42 vs 66 slab floats/node)."""
    from openpystruct_tpu.ops.beam_kernel import (
        _FLOATS_OPT_B2,
        _pick_sub_b2,
    )

    return _pick_sub_b2(n_nodes, _FLOATS_OPT_B2 + 3) is not None


def _make_kernel_step(scenario, beam, opt, refine, use_pallas, fused,
                      interpret, dtype, dd=False):
    """One optimizer iteration for the whole batch:
    ``step(I, mu, nu, epoch) -> (I_new, mu, nu, comps)``.

    Shared by :func:`optimize_beam_batched` (single while_loop) and the
    segmented/compacting driver (:func:`optimize_beam_compact`); safe to call
    with traced ``scenario`` leaves.
    """
    from openpystruct_tpu.fem.beam import constraint_mask, solve_beam_batched
    from openpystruct_tpu.ops.beam_kernel import pallas_beam_opt_step

    E, G, A = beam.E, beam.G, beam.A
    b1, b2, eps = 0.9, 0.999, 1e-8

    if dd:
        from openpystruct_tpu.ops.beam_kernel_dd import (
            pallas_beam_opt_step_dd,
        )

        if opt.grad_mode != "semi":
            raise NotImplementedError(
                "dd kernels implement the reference's semi-gradient mode "
                "only (the rescue path; OpenPyStruct_BeamOpt.py:150-151)"
            )
        Le = jnp.diff(scenario.node_x, axis=-1).astype(dtype)
        free = (~jax.vmap(constraint_mask)(scenario)).astype(dtype)

        def kernel_step(I, mu, nu, epoch):
            t = (epoch + 1).astype(dtype)
            lr_t = opt.lr * opt.lr_gamma ** epoch.astype(dtype)
            bc1 = 1.0 / (1.0 - b1**t)
            bc2 = 1.0 / (1.0 - b2**t)
            I_new, mu_new, nu_new, stats, _piv = pallas_beam_opt_step_dd(
                I, mu, nu, Le, free, scenario.point_loads, scenario.udl,
                lr_t, bc1, bc2, float(E), float(A), float(G),
                alpha_m=float(opt.alpha_moment),
                alpha_s=float(opt.alpha_shear),
                clamp_min=float(opt.clamp_min),
                interpret=interpret,
            )
            comps = LossComponents(
                total=stats[:, 0], primary=stats[:, 1],
                bending_energy=stats[:, 2], shear_energy=stats[:, 3],
            )
            return I_new, mu_new, nu_new, comps

        return kernel_step

    if fused:
        Le = jnp.diff(scenario.node_x, axis=-1).astype(dtype)
        free = (~jax.vmap(constraint_mask)(scenario)).astype(dtype)

        def kernel_step(I, mu, nu, epoch):
            t = (epoch + 1).astype(dtype)
            lr_t = opt.lr * opt.lr_gamma ** epoch.astype(dtype)
            bc1 = 1.0 / (1.0 - b1**t)
            bc2 = 1.0 / (1.0 - b2**t)
            I_new, mu_new, nu_new, stats = pallas_beam_opt_step(
                I, mu, nu, Le, free, scenario.point_loads, scenario.udl,
                lr_t, bc1, bc2, float(E), float(A), float(G),
                alpha_m=float(opt.alpha_moment),
                alpha_s=float(opt.alpha_shear),
                clamp_min=float(opt.clamp_min),
                grad_semi=(opt.grad_mode == "semi"),
                refine=refine, interpret=interpret,
            )
            comps = LossComponents(
                total=stats[:, 0], primary=stats[:, 1],
                bending_energy=stats[:, 2], shear_energy=stats[:, 3],
            )
            return I_new, mu_new, nu_new, comps

        return kernel_step

    else:
        def eval_loss(I):
            # Semi-gradient mode treats the whole FE solve as a constant
            # per iteration (the reference's fresh-leaf-tensor semantics,
            # OpenPyStruct_BeamOpt.py:150-151) — stopping I at the solve
            # input lets XLA skip the assembly/solve backward pass.
            I_solve = (jax.lax.stop_gradient(I)
                       if opt.grad_mode == "semi" else I)
            sol = solve_beam_batched(
                I_solve, scenario, E, A, refine=refine,
                use_pallas=use_pallas, interpret=interpret,
            )
            comps = jax.vmap(
                lambda I, M, V: structural_loss(
                    I, M, V, E, G, opt.alpha_moment, opt.alpha_shear,
                    grad_mode=opt.grad_mode,
                )
            )(I, sol.bending_moments, sol.shear_forces)
            # independent samples: summing gives each lane its own grad
            return jnp.sum(comps.total), comps

        grad_fn = jax.value_and_grad(eval_loss, has_aux=True)

        def kernel_step(I, mu, nu, epoch):
            (_, comps), g = grad_fn(I)
            t = (epoch + 1).astype(dtype)
            lr_t = opt.lr * opt.lr_gamma ** epoch.astype(dtype)
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * g * g
            mu_hat = mu / (1 - b1**t)
            nu_hat = nu / (1 - b2**t)
            I_new = jnp.maximum(
                I - lr_t * mu_hat / (jnp.sqrt(nu_hat) + eps),
                opt.clamp_min,
            )
            return I_new, mu, nu, comps

        return kernel_step


def _lane_state_init(I0):
    """Per-lane optimizer/early-stopping state (no scalar epoch)."""
    B = I0.shape[0]
    dtype = I0.dtype
    return dict(
        I=I0,
        I_solved=I0,
        mu=jnp.zeros_like(I0),
        nu=jnp.zeros_like(I0),
        n_epochs=jnp.zeros((B,), jnp.int32),
        best=jnp.full((B,), jnp.inf, dtype),
        no_improve=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        # NaN, not zero: a lane that runs zero epochs (max_epochs=0) must
        # report "never evaluated", not a plausible-looking zero loss; any
        # lane that takes even one step overwrites these
        comps=LossComponents(
            total=jnp.full((B,), jnp.nan, dtype),
            primary=jnp.full((B,), jnp.nan, dtype),
            bending_energy=jnp.full((B,), jnp.nan, dtype),
            shear_energy=jnp.full((B,), jnp.nan, dtype),
        ),
    )


def _make_freeze_body(kernel_step, opt):
    """while_loop body: one step + per-lane freeze/early-stop bookkeeping.
    The carry is ``_lane_state_init(...) + {'epoch': scalar}``."""

    def body(c):
        I_new, mu, nu, comps = kernel_step(
            c["I"], c["mu"], c["nu"], c["epoch"]
        )
        active = ~c["done"]
        am = active[:, None]

        total = comps.total
        improved = total < c["best"] - opt.tolerance
        best = jnp.where(active & improved, total, c["best"])
        no_improve = jnp.where(
            active, jnp.where(improved, 0, c["no_improve"] + 1),
            c["no_improve"],
        )
        done = c["done"] | (no_improve >= opt.patience)

        def freeze1(new, old):
            return jnp.where(active, new, old)

        return dict(
            I=jnp.where(am, I_new, c["I"]),
            I_solved=jnp.where(am, c["I"], c["I_solved"]),
            mu=jnp.where(am, mu, c["mu"]),
            nu=jnp.where(am, nu, c["nu"]),
            epoch=c["epoch"] + 1,
            n_epochs=c["n_epochs"] + active.astype(jnp.int32),
            best=best,
            no_improve=no_improve,
            done=done,
            comps=jax.tree.map(freeze1, comps, c["comps"]),
        )

    return body


def _final_solution(scenario, I_solved, beam, refine, use_pallas, fused,
                    interpret, dd=False):
    """One analysis at the last-solved I — reproduces exactly the solution
    the loop's last evaluation saw (same kernel, same inputs) without
    carrying (B, n, 3) fields through every iteration.  Returns
    ``(BeamSolution, pivot-or-None)``."""
    from openpystruct_tpu.fem.beam import (
        BeamSolution,
        constraint_mask,
        solve_beam_batched,
    )
    from openpystruct_tpu.ops.beam_kernel import pallas_beam_analysis

    I_solved = jax.lax.stop_gradient(I_solved)
    if dd:
        from openpystruct_tpu.ops.beam_kernel_dd import (
            pallas_beam_analysis_dd,
        )

        dtype = I_solved.dtype
        Le = jnp.diff(scenario.node_x, axis=-1).astype(dtype)
        free = (~jax.vmap(constraint_mask)(scenario)).astype(dtype)
        u, V, M, piv = pallas_beam_analysis_dd(
            I_solved, Le, free, scenario.point_loads, scenario.udl,
            float(beam.E), float(beam.A), interpret=interpret,
        )
        sol = BeamSolution(
            displacements=u, deflections=u[..., 1], rotations=u[..., 2],
            shear_forces=V, bending_moments=M,
        )
        return sol, piv
    if fused:
        dtype = I_solved.dtype
        Le = jnp.diff(scenario.node_x, axis=-1).astype(dtype)
        free = (~jax.vmap(constraint_mask)(scenario)).astype(dtype)
        u, V, M, piv = pallas_beam_analysis(
            I_solved, Le, free, scenario.point_loads, scenario.udl,
            float(beam.E), float(beam.A), refine=refine, interpret=interpret,
        )
        sol = BeamSolution(
            displacements=u, deflections=u[..., 1], rotations=u[..., 2],
            shear_forces=V, bending_moments=M,
        )
    else:
        sol = solve_beam_batched(
            I_solved, scenario, beam.E, beam.A, refine=refine,
            use_pallas=use_pallas, interpret=interpret,
        )
        piv = None
    return sol, piv


# ---------------------------------------------------------------------------
# Batched driver with converged-lane compaction
# ---------------------------------------------------------------------------


def _bucket_size(n_active: int, min_bucket: int, cap: int) -> int:
    """Smallest power-of-two working-set size covering the active lanes,
    floored at ``min_bucket`` (kernel tile efficiency) and capped at the
    full batch."""
    size = max(n_active, min_bucket, 1)
    return min(cap, 1 << (size - 1).bit_length())


def _compact_sizes(B: int, min_bucket: int) -> list:
    """Static halving schedule of working-set sizes, e.g. 8192 ->
    [8192, 4096, 2048, 1024, 512] at the default 512 floor."""
    sizes = [B]
    min_b = min(min_bucket, B)
    while True:
        nxt = _bucket_size(max(sizes[-1] // 2, 1), min_b, B)
        if nxt >= sizes[-1]:
            return sizes
        sizes.append(nxt)


def optimize_beam_compact(
    scenario: BeamScenario,
    beam: BeamConfig = BeamConfig(),
    opt: OptimizerConfig = OptimizerConfig(),
    I0: Optional[jax.Array] = None,
    refine: int = 0,
    use_pallas: bool = True,
    interpret: bool = False,
    fused: Optional[bool] = None,
    min_bucket: int = 512,
    dd: bool = False,
) -> BeamOptResult:
    """``optimize_beam_batched`` with early-exit lane compaction.

    The plain batched driver keeps solving converged lanes until the slowest
    lane in the batch finishes (they freeze, but the kernel still runs them).
    Here the loop runs as a *static* cascade of halving working-set sizes
    (B, B/2, ..., ``min_bucket`` — the Pallas kernel's 512-lane tile): each
    stage's while_loop exits early once the active-lane count fits the next
    bucket, the active lanes are gathered into it (stable ``argsort(done)``
    — shapes are static, only the switchover epoch is dynamic), and the
    results are scattered back at the stage boundary.

    Because the schedule is static, the whole cascade traces into ONE XLA
    program: jittable, zero mid-run host syncs (a host-orchestrated variant
    measured slower than the waste it removed — device->host round trips
    through a remote-device tunnel), and usable under ``shard_map`` (each
    device compacts its local shard).

    Per-lane trajectories are identical to ``optimize_beam_batched`` — lanes
    are independent and the global epoch counter (which drives the lr
    schedule) threads through the stages — only the wasted epochs on frozen
    lanes are skipped.
    """
    B = scenario.node_x.shape[0]
    nelem = scenario.node_x.shape[-1] - 1
    if I0 is None:
        I0 = jnp.full((B, nelem), beam.I0, dtype=jnp.float32)
    if fused is None:
        fused = use_pallas and _fits_fused(nelem + 1)
    sizes = _compact_sizes(B, min_bucket)

    def run_stage(scen_s, st, epoch0, next_size):
        kernel_step = _make_kernel_step(
            scen_s, beam, opt, refine, use_pallas, fused, interpret,
            I0.dtype, dd=dd,
        )
        body = _make_freeze_body(kernel_step, opt)

        def cond(c):
            return (c["epoch"] < opt.max_epochs) & (
                jnp.sum(~c["done"]) > next_size
            )

        c = jax.lax.while_loop(cond, body, dict(st, epoch=epoch0))
        ep = c.pop("epoch")
        return c, ep

    state = _lane_state_init(I0)
    epoch = jnp.asarray(0, jnp.int32)
    state, epoch = run_stage(
        scenario, state, epoch, sizes[1] if len(sizes) > 1 else 0
    )
    for i, s in enumerate(sizes[1:], start=1):
        nxt = sizes[i + 1] if i + 1 < len(sizes) else 0
        # stable argsort: active lanes first, in original order; trailing
        # slots are genuinely-converged lanes that stay frozen
        gidx = jnp.argsort(state["done"])[:s]
        ws = jax.tree.map(lambda x: x[gidx], state)
        scen_s = jax.tree.map(lambda x: x[gidx], scenario)
        ws, epoch = run_stage(scen_s, ws, epoch, nxt)
        # gidx is a subset of a permutation -> conflict-free scatter
        state = jax.tree.map(lambda f, w: f.at[gidx].set(w), state, ws)

    sol, piv = _final_solution(
        scenario, state["I_solved"], beam, refine, use_pallas, fused,
        interpret, dd=dd,
    )
    return BeamOptResult(
        I=state["I"],
        I_solved=state["I_solved"],
        solution=sol,
        loss=state["comps"],
        n_epochs=state["n_epochs"],
        converged=state["done"],
        loss_history=None,
        pivot=piv,
    )
