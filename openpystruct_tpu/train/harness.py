"""One jitted training harness for every surrogate family.

Reference pattern reproduced (OpenPyStruct_FNN_MultiCase.py:480-632):
shuffled batches -> per-epoch decaying Gaussian input noise
(sigma_0 * gamma_noise^epoch) -> mixed-precision forward (bf16 on TPU, the
AMP analog) -> TrainableL1L2 loss + (alpha_0 - alpha)^2 regularizer ->
global-norm grad clip 1.0 -> Adam with L2 weight decay (torch style:
decay added to the gradient before the Adam update; ``decoupled=True``
gives the GNN script's AdamW) -> per-epoch ExponentialLR -> early stopping
on val loss with best-checkpoint retention -> R^2 evaluation on
un-standardized, clipped predictions.

TPU-first mechanics: each epoch is ONE jitted program — a ``lax.scan`` over
batches — so there is no per-batch Python/dispatch overhead; with a mesh the
batch axis is sharded and XLA inserts the gradient all-reduce over ICI.

Divergence from the reference (intentional): the in-batch ``permute_data``
re-shuffle (OpenPyStruct_FNN_MultiCase.py:440-461,537-540) is NOT
replicated — reordering rows *within* a batch is mathematically a no-op for
every loss here (all are means over rows, invariant to row order; the batch
composition itself is already randomized by the epoch shuffle).  Partial
trailing TRAIN batches
are dropped (static shapes; the reference's DataLoader keeps them) — the
validation set is evaluated in full, with the ragged remainder as one extra
batch at its own static shape, so early stopping sees every val sample like
the reference's val loop.  The loss alpha is actually trained by default —
see models/losses.py for why the reference never updates it; pass
``train_alpha=False`` to freeze it.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from openpystruct_tpu.config import TrainConfig
from openpystruct_tpu.models.losses import trainable_l1l2_loss


@struct.dataclass
class TrainState:
    params: Any          # {"model": pytree, "alpha": scalar}
    opt_state: Any
    step: jax.Array
    batch_stats: Any = None  # BatchNorm running statistics (FNO/PINN)


@struct.dataclass
class FitResult:
    params: Any                    # best params (by val loss)
    state: TrainState              # final state
    train_losses: np.ndarray = struct.field(pytree_node=False, default=None)
    val_losses: np.ndarray = struct.field(pytree_node=False, default=None)
    best_epoch: int = struct.field(pytree_node=False, default=0)
    stopped_early: bool = struct.field(pytree_node=False, default=False)
    batch_stats: Any = None        # running stats matching ``params``


def _per_shard_epoch_batches(ks, X_tr, Y_tr, steps, batch, mesh, data_axis):
    """Shuffle an epoch with ZERO cross-device communication: each device
    permutes its resident rows (key folded with its mesh position) and
    reshapes them into its slice of every batch.  The global-permutation
    path gathers ``X[perm]`` across the whole mesh — over DCN on a
    multi-host mesh — every epoch; here rows never leave their device, at
    the cost of batches mixing only within shards (``shuffle_scope`` docs
    on ``fit``).  Keys fold in the mesh position, not the process index,
    so the realized batches are identical for any process layout of the
    same mesh."""
    n_shards = mesh.shape[data_axis]
    lbatch = batch // n_shards

    def local(ks, X, Y):
        i = jax.lax.axis_index(data_axis)
        p = jax.random.permutation(
            jax.random.fold_in(ks, i), X.shape[0]
        )[: steps * lbatch]
        return (
            X[p].reshape(steps, lbatch, *X.shape[1:]),
            Y[p].reshape(steps, lbatch, *Y.shape[1:]),
        )

    P = jax.sharding.PartitionSpec
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis)),
        out_specs=P(None, data_axis),
        check_vma=False,
    )(ks, X_tr, Y_tr)


def _make_optimizer(cfg: TrainConfig, steps_per_epoch: int, train_alpha: bool,
                    decoupled: bool):
    # lr * gamma^epoch, scheduler stepped once per epoch
    # (OpenPyStruct_FNN_MultiCase.py:482,574).
    schedule = lambda count: cfg.learning_rate * (
        cfg.lr_gamma ** (count // steps_per_epoch)
    )
    # Weight decay applies to the model parameters only, never to the loss
    # alpha (the reference's optimizer sees only model params,
    # OpenPyStruct_FNN_MultiCase.py:481; alpha gets its own optimizer there).
    def wd_mask(params):
        return {
            "model": jax.tree.map(lambda _: True, params["model"]),
            "alpha": False,
        }
    if decoupled:
        # AdamW (the GNN script, OpenPyStruct_GNN_MultiCase_Beta.py:395)
        inner = optax.chain(
            optax.scale_by_adam(eps=1e-8),
            optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        # torch Adam(weight_decay): L2 term added to the gradient BEFORE the
        # Adam moments (OpenPyStruct_FNN_MultiCase.py:481).
        inner = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
            optax.scale_by_adam(eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        )
    tx = optax.chain(optax.clip_by_global_norm(1.0), inner)
    if not train_alpha:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels={"model": "train", "alpha": "freeze"},
        )
    return tx


def fit(
    model,
    X_train,
    Y_train,
    X_val,
    Y_val,
    cfg: TrainConfig = TrainConfig(),
    rng: Optional[jax.Array] = None,
    loss_fn: Optional[Callable] = None,
    loss_fn_builder: Optional[Callable] = None,
    param_loss_fn: Optional[Callable] = None,
    train_alpha: bool = True,
    decoupled_weight_decay: bool = False,
    model_rng_keys: Sequence[str] = ("dropout",),
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    shuffle_scope: str = "global",
    epochs_per_sync: int = 8,
    verbose: bool = False,
    metrics=None,
    live_plot=None,
    checkpoint_dir: Optional[str] = None,
    resume_from: Optional[str] = None,
    checkpoint_every: int = 1,
) -> FitResult:
    """Train ``model`` with the shared reference recipe.

    loss_fn(alpha, preds, targets) -> scalar; defaults to TrainableL1L2 with
    box constraints from the training-label min/max
    (OpenPyStruct_FNN_MultiCase.py:313-314).
    loss_fn_builder(Y_train) -> loss_fn lets a family derive data-dependent
    terms from the (standardized) train labels before training starts —
    e.g. the PINN's box-constraint bounds over the I-slice
    (OpenPyStruct_PINN_MultiCase.py:377-378,556-558).  Mutually exclusive
    with ``loss_fn``.
    param_loss_fn(model_params) -> scalar adds parameter-dependent terms
    (e.g. the Bayesian models' scaled KL).

    ``shuffle_scope``: ``"global"`` (default) permutes the full training
    set each epoch — exact reference DataLoader semantics
    (OpenPyStruct_FNN_MultiCase.py:486), but on a multi-host mesh the
    gather ``X[perm]`` crosses hosts over DCN every epoch.  ``"per_shard"``
    permutes each device's resident rows independently (``shard_map`` over
    the data axis, zero communication): batches mix only within shards, so
    the trajectory differs from the reference's by batch composition —
    statistically equivalent for i.i.d. rows, and the right trade when DCN
    bandwidth dominates.  Requires even sharding; up to ``devices-1``
    trailing rows per process are dropped to guarantee it.  Still
    bit-identical across ``epochs_per_sync`` values and resume.

    ``epochs_per_sync``: epochs executed per device round-trip (shuffling,
    noisy steps, val evaluation, best-checkpoint selection AND the
    early-stop decision all run on-device in one scanned program, with
    training state frozen at the stop epoch).  Every epoch's
    shuffle/noise/dropout keys are ``fold_in(rng, epoch)`` from the fixed
    base key — a pure function of (seed, epoch), never chained through
    chunk boundaries — so the trajectory, histories and best checkpoint
    are bit-identical for any value; the knob only amortizes host/link
    round-trip latency, which dominates small-model / small-dataset
    training (the TFD reference configuration is ~entirely dispatch-bound
    at 1).  Post-stop epochs inside the final chunk execute as frozen
    no-ops (wasted device time bounded by chunk - 1 tiny epochs).

    ``metrics``: an optional ``utils.MetricsLogger`` receiving one entry per
    epoch (train_loss, val_loss).

    ``live_plot``: a ``viz.LiveLossPlot`` (or a path string, which creates
    one writing a self-refreshing PNG) updated once per sync chunk — the
    reference's per-epoch live training plot
    (OpenPyStruct_FNN_MultiCase.py:493-515,594) for headless TPU hosts.

    ``checkpoint_dir``: save the FULL training state (params, optimizer
    state, best-so-far, loop rng, epoch counters, loss histories) every
    ``checkpoint_every`` sync chunks; ``resume_from`` restores such a
    checkpoint and continues — with identical data and config, the
    resumed run reproduces the uninterrupted val-loss trajectory exactly,
    regardless of ``epochs_per_sync`` on either side of the restart
    (epoch keys are fold_in-derived from the checkpointed base rng, not
    chained across epochs).  This is the mid-run resume the reference
    lacks (it only ``torch.save``'s a best state_dict, SURVEY.md §5).
    """
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    owns_live_plot = isinstance(live_plot, str)
    if owns_live_plot:
        from openpystruct_tpu.viz import LiveLossPlot

        live_plot = LiveLossPlot(live_plot)
    X_train = jnp.asarray(X_train, jnp.float32)
    Y_train = jnp.asarray(Y_train, jnp.float32)
    X_val = jnp.asarray(X_val, jnp.float32)
    Y_val = jnp.asarray(Y_val, jnp.float32)

    # Multi-host data contract (mesh spanning >1 process): each process
    # passes its OWN rows of the training set (per-host dataset shards),
    # and the FULL validation set (small; replicated).  Single process:
    # everything is the full arrays, as before.
    multihost = jax.process_count() > 1
    if multihost and mesh is None:
        raise ValueError("multi-host fit() requires a mesh")
    if shuffle_scope not in ("global", "per_shard"):
        raise ValueError(f"shuffle_scope must be 'global' or 'per_shard', "
                         f"got {shuffle_scope!r}")
    per_shard = (
        shuffle_scope == "per_shard"
        and mesh is not None and mesh.shape[data_axis] > 1
    )
    if shuffle_scope == "per_shard" and not per_shard:
        # don't silently ignore the zero-communication intent (ADVICE r4)
        import warnings

        warnings.warn(
            "shuffle_scope='per_shard' has no effect without a mesh whose "
            f"'{data_axis}' axis has >1 shard; using the global shuffle",
            stacklevel=2,
        )
    if per_shard:
        # shard_map needs even GLOBAL sharding: every process trims its rows
        # to the same count — the minimum across processes, rounded down to
        # a multiple of its local share of the data axis.  Trimming each
        # process independently (round 4) broke at trace time whenever
        # processes passed unequal row counts, which the local-shards data
        # contract allows (ADVICE r4).
        local_shards = max(mesh.shape[data_axis] // jax.process_count(), 1)
        rows = X_train.shape[0]
        if multihost:
            from openpystruct_tpu.parallel import all_processes_min_max

            rows = int(all_processes_min_max(np.asarray([rows]))[0])
        keep = (rows // local_shards) * local_shards
        X_train, Y_train = X_train[:keep], Y_train[:keep]

    # box-constraint bounds must be identical on every host even though
    # each host only sees its own train rows
    from openpystruct_tpu.parallel import all_processes_min_max

    min_c, max_c = all_processes_min_max(Y_train)
    if loss_fn_builder is not None:
        if loss_fn is not None:
            raise ValueError("pass loss_fn OR loss_fn_builder, not both")
        loss_fn = loss_fn_builder(Y_train)
    if loss_fn is None:
        def loss_fn(alpha, preds, targets):
            return trainable_l1l2_loss(
                alpha, preds, targets, min_c, max_c, cfg.box_constraint_coeff
            )

    rng, init_rng = jax.random.split(rng)
    init_rngs = {"params": init_rng}
    for k in model_rng_keys:
        rng, sub = jax.random.split(rng)
        init_rngs[k] = sub
    variables = model.init(init_rngs, X_train[:2], train=True)
    params = {
        "model": variables["params"],
        "alpha": jnp.asarray(cfg.initial_alpha, jnp.float32),
    }
    batch_stats = variables.get("batch_stats", None)
    has_bn = batch_stats is not None

    if mesh is not None:
        # sharded global train arrays (multi-host safe: round 2's plain
        # device_put of host arrays cannot populate non-addressable
        # shards); after this X_train.shape[0] is the GLOBAL row count
        from openpystruct_tpu.parallel import make_global_batch

        X_train = make_global_batch(X_train, mesh, data_axis,
                                    local=multihost)
        Y_train = make_global_batch(Y_train, mesh, data_axis,
                                    local=multihost)

    n_shards = mesh.shape[data_axis] if mesh is not None else 1

    def _fit_batch(requested, total):
        b = min(requested, total)
        b = max((b // n_shards) * n_shards, n_shards)
        if b > total:
            raise ValueError(
                f"dataset of {total} samples cannot fill one batch across "
                f"{n_shards} mesh shards"
            )
        return b

    batch = _fit_batch(cfg.batch_size, X_train.shape[0])
    steps = max(X_train.shape[0] // batch, 1)
    tx = _make_optimizer(cfg, steps, train_alpha, decoupled_weight_decay)
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.asarray(0),
        batch_stats=batch_stats,
    )

    val_batch = _fit_batch(cfg.batch_size, X_val.shape[0])
    val_steps = max(X_val.shape[0] // val_batch, 1)
    Xv = X_val[: val_steps * val_batch].reshape(
        val_steps, val_batch, *X_val.shape[1:]
    )
    Yv = Y_val[: val_steps * val_batch].reshape(
        val_steps, val_batch, *Y_val.shape[1:]
    )
    # The ragged val remainder is evaluated as one extra batch at its own
    # (static) shape, so the early-stop metric sees EVERY val sample — the
    # reference's DataLoader keeps the partial batch and its val loss is
    # the mean over all batches including it
    # (OpenPyStruct_FNN_MultiCase.py:564-571).
    Xv_tail = X_val[val_steps * val_batch:]
    Yv_tail = Y_val[val_steps * val_batch:]
    has_tail = Xv_tail.shape[0] > 0

    def compute_loss(params, batch_stats, Xb, Yb, rngs, train):
        variables = {"params": params["model"]}
        if has_bn:
            variables["batch_stats"] = batch_stats
        if train and has_bn:
            preds, mutated = model.apply(
                variables, Xb, train=True, rngs=rngs,
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            preds = model.apply(
                variables, Xb, train=train,
                rngs=rngs if train or model_rng_keys else None,
            )
            new_stats = batch_stats
        loss = loss_fn(params["alpha"], preds, Yb)
        # mild penalty on alpha deviating from its initial value
        # (OpenPyStruct_FNN_MultiCase.py:546-547)
        loss = loss + (cfg.initial_alpha - params["alpha"]) ** 2
        if param_loss_fn is not None:
            loss = loss + param_loss_fn(params["model"])
        return loss, new_stats

    def train_epoch(state, Xe, Ye, rng, noise_level):
        def step_fn(carry, xs):
            st, rng = carry
            Xb, Yb = xs
            rng, kn, *kms = jax.random.split(rng, 2 + len(model_rng_keys))
            rngs = dict(zip(model_rng_keys, kms))
            Xb = Xb + jax.random.normal(kn, Xb.shape, Xb.dtype) * noise_level

            def lf(p):
                return compute_loss(p, st.batch_stats, Xb, Yb, rngs, True)

            (loss, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(
                st.params
            )
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            st = TrainState(
                params=new_params, opt_state=opt_state, step=st.step + 1,
                batch_stats=new_stats,
            )
            return (st, rng), loss

        (state, _), losses = jax.lax.scan(step_fn, (state, rng), (Xe, Ye))
        return state, jnp.mean(losses)

    def val_loss_fn(state, rng, Xv, Yv, Xvt, Yvt):
        def one(carry, xs):
            rng = carry
            Xb, Yb = xs
            rng, *kms = jax.random.split(rng, 1 + max(len(model_rng_keys), 1))
            rngs = dict(zip(model_rng_keys, kms))
            loss, _ = compute_loss(
                state.params, state.batch_stats, Xb, Yb, rngs, False
            )
            return rng, loss

        rng, losses = jax.lax.scan(one, rng, (Xv, Yv))
        if not has_tail:
            return jnp.mean(losses)
        # one extra batch at the remainder's own static shape (compiled
        # once); mean over all batches = the reference's val metric
        rng, *kms = jax.random.split(rng, 1 + max(len(model_rng_keys), 1))
        tail_loss, _ = compute_loss(
            state.params, state.batch_stats, Xvt, Yvt,
            dict(zip(model_rng_keys, kms)), False,
        )
        return (jnp.sum(losses) + tail_loss) / (val_steps + 1)

    def run_epochs(state, best, rng, epoch0, no_improve0, n_epochs,
                   X_tr, Y_tr, Xv, Yv, Xvt, Yvt):
        """Run ``n_epochs`` epochs entirely on-device (one jitted scan):
        shuffle, noisy train steps, per-epoch val loss, best-checkpoint
        selection AND the early-stop decision all stay on the device —
        the host only syncs once per chunk.  When patience runs out
        mid-chunk the training state and best checkpoint FREEZE at the
        stop epoch (remaining scanned epochs are no-ops on frozen state),
        so any ``epochs_per_sync`` reproduces the per-epoch-sync
        trajectory exactly; the host's own bookkeeping over the returned
        loss arrays makes the identical stop decision and truncates.
        ``best`` is (best_val, best_params, best_stats).  The data arrays
        are explicit jit arguments (NOT closure captures: captured
        constants get serialized into the compile payload, which breaks
        remote-compile setups for large datasets)."""

        def epoch_body(carry, e_idx):
            st, best, no_improve, stopped = carry
            epoch = epoch0 + 1 + e_idx
            noise = cfg.sigma_0 * jnp.power(
                jnp.asarray(cfg.gamma_noise, jnp.float32),
                epoch.astype(jnp.float32),
            )
            # Epoch keys derive from the FIXED base rng and the absolute
            # epoch number — never from a key chained through the scan
            # carry.  Chained keys would make epoch k's shuffle/noise/
            # dropout depend on where its chunk boundary fell, breaking
            # the bit-identical-for-any-epochs_per_sync contract.
            ks, ke, kv = jax.random.split(
                jax.random.fold_in(rng, epoch), 3
            )
            if per_shard:
                Xe, Ye = _per_shard_epoch_batches(
                    ks, X_tr, Y_tr, steps, batch, mesh, data_axis
                )
            else:
                perm = jax.random.permutation(ks, X_tr.shape[0])[
                    : steps * batch
                ]
                Xe = X_tr[perm].reshape(steps, batch, *X_tr.shape[1:])
                Ye = Y_tr[perm].reshape(steps, batch, *Y_tr.shape[1:])
            st_new, tr_loss = train_epoch(st, Xe, Ye, ke, noise)
            va_loss = val_loss_fn(st_new, kv, Xv, Yv, Xvt, Yvt)

            best_val, best_params, best_stats = best
            active = ~stopped
            improved = (va_loss < best_val) & active
            best_val = jnp.where(improved, va_loss, best_val)
            sel = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(improved, a, b), new, old
            )
            best_params = sel(st_new.params, best_params)
            if has_bn:
                best_stats = sel(st_new.batch_stats, best_stats)
            # the stopping epoch's trained state is kept (the reference
            # breaks AFTER the epoch, OpenPyStruct_FNN_MultiCase.py:581-585)
            st = jax.tree.map(
                lambda new, old: jnp.where(stopped, old, new), st_new, st
            )
            no_improve = jnp.where(
                active, jnp.where(improved, 0, no_improve + 1), no_improve
            )
            stopped = stopped | (no_improve >= cfg.patience)
            return (
                st, (best_val, best_params, best_stats), no_improve,
                stopped,
            ), (tr_loss, va_loss)

        (state, best, _, _), (tr, va) = jax.lax.scan(
            epoch_body,
            (state, best, jnp.asarray(no_improve0, jnp.int32),
             jnp.asarray(False)),
            jnp.arange(n_epochs),
        )
        return state, best, tr, va

    run_epochs_j = jax.jit(run_epochs, static_argnames=("n_epochs",))

    if mesh is not None:
        from openpystruct_tpu.parallel import replicate_to_mesh

        val_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, data_axis)
        )

        def put_val(x):
            # val arrays are full on every process (data contract above);
            # assemble per-device from the host copy — multi-host safe
            if not multihost:
                return jax.device_put(x, val_sh)
            xh = np.asarray(x)
            return jax.make_array_from_callback(
                xh.shape, val_sh, lambda idx: xh[idx]
            )

        Xv = put_val(Xv)
        Yv = put_val(Yv)
        # the ragged tail need not divide the mesh; it is small — replicate
        Xv_tail = replicate_to_mesh(Xv_tail, mesh)
        Yv_tail = replicate_to_mesh(Yv_tail, mesh)
        state = replicate_to_mesh(jax.device_get(state), mesh) \
            if multihost else jax.device_put(
                state, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                )
            )

    best = (
        jnp.asarray(jnp.inf, jnp.float32),
        state.params,
        state.batch_stats if has_bn else 0,
    )
    best_epoch = 0
    epochs_no_improve = 0
    best_val = float("inf")
    train_hist, val_hist = [], []
    stopped = False
    epoch0 = 0

    if resume_from:
        import os

        from openpystruct_tpu.train.checkpoint import load_checkpoint

        # Target-based restore: the templates built above supply the pytree
        # structure (incl. optax namedtuples), the checkpoint the values.
        template = {
            "state": jax.device_get(state),
            "best": jax.device_get(best),
            "rng": jax.device_get(rng),
        }
        raw = load_checkpoint(
            os.path.join(resume_from, "tree"), target=template
        )
        state, best = raw["state"], raw["best"]
        rng = jnp.asarray(raw["rng"])
        with np.load(os.path.join(resume_from, "aux.npz")) as aux:
            epoch0 = int(aux["epoch0"])
            best_epoch = int(aux["best_epoch"])
            epochs_no_improve = int(aux["epochs_no_improve"])
            best_val = float(aux["best_val"])
            train_hist = [float(x) for x in aux["train_hist"]]
            val_hist = [float(x) for x in aux["val_hist"]]
        if mesh is not None:
            from openpystruct_tpu.parallel import replicate_to_mesh

            state = replicate_to_mesh(state, mesh)
            best = replicate_to_mesh(best, mesh)

    def _save_full_state():
        import os

        from openpystruct_tpu.train.checkpoint import save_checkpoint

        os.makedirs(checkpoint_dir, exist_ok=True)
        save_checkpoint(os.path.join(checkpoint_dir, "tree"), {
            "state": jax.device_get(state),
            "best": jax.device_get(best),
            "rng": jax.device_get(rng),
        })
        tmp = os.path.join(checkpoint_dir, ".aux.tmp.npz")
        np.savez(
            tmp,
            epoch0=np.int64(epoch0),
            best_epoch=np.int64(best_epoch),
            epochs_no_improve=np.int64(epochs_no_improve),
            best_val=np.float64(best_val),
            train_hist=np.asarray(train_hist, np.float64),
            val_hist=np.asarray(val_hist, np.float64),
        )
        os.replace(tmp, os.path.join(checkpoint_dir, "aux.npz"))

    chunks_done = 0
    while epoch0 < cfg.num_epochs and not stopped:
        chunk = min(epochs_per_sync, cfg.num_epochs - epoch0)
        state, best, tr, va = run_epochs_j(
            state, best, rng, epoch0, epochs_no_improve, chunk,
            X_train, Y_train, Xv, Yv, Xv_tail, Yv_tail,
        )
        tr = np.asarray(tr)
        va = np.asarray(va)
        for i in range(chunk):
            # the device froze training at the stop epoch (run_epochs),
            # and this loop makes the IDENTICAL stop decision from the
            # same float values — post-stop chunk entries are no-ops on
            # frozen state and are not recorded, so histories (and
            # checkpoints: epoch0 == len(train_hist)) are bit-identical
            # for ANY epochs_per_sync
            if stopped:
                break
            epoch = epoch0 + 1 + i
            train_hist.append(float(tr[i]))
            val_hist.append(float(va[i]))
            if metrics is not None:
                metrics.log(step=epoch, train_loss=float(tr[i]),
                            val_loss=float(va[i]))
            if va[i] < best_val:
                best_val = float(va[i])
                best_epoch = epoch
                epochs_no_improve = 0
            else:
                epochs_no_improve += 1
                if epochs_no_improve >= cfg.patience:
                    stopped = True
                    if verbose:
                        print(f"Early stopping at epoch {epoch}")
            if verbose and not stopped:
                print(
                    f"Epoch {epoch}/{cfg.num_epochs} | "
                    f"Train Loss={tr[i]:.6f}, Val Loss={va[i]:.6f}"
                )
        if live_plot is not None:
            live_plot.update(train_hist, val_hist)
        epoch0 = len(train_hist)
        chunks_done += 1
        if checkpoint_dir and (
            chunks_done % checkpoint_every == 0
            or stopped
            or epoch0 >= cfg.num_epochs
        ):
            _save_full_state()

    if owns_live_plot:
        # fit created the figure, so fit releases it (one leaked matplotlib
        # figure per call otherwise; matplotlib warns after 20)
        live_plot.close()

    _, best_params_dev, best_stats_dev = best
    best_params = jax.device_get(best_params_dev)
    best_stats = jax.device_get(best_stats_dev) if has_bn else None

    return FitResult(
        params=best_params,
        state=state,
        train_losses=np.asarray(train_hist),
        val_losses=np.asarray(val_hist),
        best_epoch=best_epoch,
        stopped_early=stopped,
        batch_stats=best_stats,
    )


def predict(model, params, X, scaler_Y=None, rng=None,
            model_rng_keys: Sequence[str] = (), clip=(0.0, 1e10),
            batch_stats=None, batch_size: Optional[int] = None):
    """Batch inference; optionally un-standardize with ``scaler_Y`` and clip
    (the reference's eval path, OpenPyStruct_FNN_MultiCase.py:611-628).

    ``batch_size`` chunks the forward pass so arbitrarily large sets don't
    have to fit activations on-device at once; the final ragged chunk runs
    at its own shape (one extra compile at most).  Each chunk draws fresh
    model rngs (folded from ``rng``) — reusing one key across chunks would
    correlate the stochastic models' noise per chunk and make results
    depend on ``batch_size``."""
    if model_rng_keys:
        rng = jax.random.PRNGKey(0) if rng is None else rng
    variables = {"params": params["model"]}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    X = jnp.asarray(X, jnp.float32)

    def make_rngs(chunk_idx):
        if not model_rng_keys:
            return None
        keys = jax.random.split(
            jax.random.fold_in(rng, chunk_idx), len(model_rng_keys)
        )
        return dict(zip(model_rng_keys, keys))

    def apply(Xb, rngs):
        return model.apply(variables, Xb, train=False, rngs=rngs)

    if batch_size is None or X.shape[0] <= batch_size:
        preds = np.asarray(apply(X, make_rngs(0)))
    else:
        apply_j = jax.jit(apply)
        chunks = [
            np.asarray(apply_j(X[i:i + batch_size], make_rngs(ci)))
            if X.shape[0] - i >= batch_size
            else np.asarray(apply(X[i:], make_rngs(ci)))
            for ci, i in enumerate(range(0, X.shape[0], batch_size))
        ]
        preds = np.concatenate(chunks, axis=0)
    if scaler_Y is not None:
        preds = scaler_Y.inverse_transform(preds)
        if clip is not None:
            preds = np.clip(preds, *clip)
    return preds


def evaluate_r2(model, params, X_val, Y_val_std, scaler_Y, rng=None,
                model_rng_keys: Sequence[str] = (),
                batch_stats=None, label_slice: Optional[slice] = None,
                batch_size: Optional[int] = None) -> float:
    """R^2 on un-standardized, clipped predictions vs labels
    (OpenPyStruct_FNN_MultiCase.py:598-632).

    ``label_slice`` restricts the score to a column range — the PINN's
    headline metric is R^2 on the I slice only
    (OpenPyStruct_PINN_MultiCase.py:831-852, "R^2 on Validation (I only)").
    The scaler is per-column, so slicing after the inverse transform equals
    the reference's slice-then-I-scaler order."""
    preds = predict(model, params, X_val, scaler_Y, rng=rng,
                    model_rng_keys=model_rng_keys, batch_stats=batch_stats,
                    batch_size=batch_size)
    labels = scaler_Y.inverse_transform(np.asarray(Y_val_std))
    labels = np.clip(labels, 0.0, 1e10)
    if label_slice is not None:
        preds = preds[:, label_slice]
        labels = labels[:, label_slice]
    ss_res = float(((labels - preds) ** 2).sum())
    ss_tot = float(((labels - labels.mean()) ** 2).sum())
    return 1.0 - ss_res / ss_tot
