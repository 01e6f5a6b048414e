"""Surrogate training losses.

``trainable_l1l2_loss`` is the reference's ``TrainableL1L2Loss``
(OpenPyStruct_FNN_MultiCase.py:386-438): an alpha-blended L1/L2 loss plus
ReLU box-constraint penalties against the training-label min/max.  The
external mild regularizer ``(alpha_0 - alpha)^2``
(OpenPyStruct_FNN_MultiCase.py:546-547) is applied by the train harness.

Reference quirk, reproduced on request: every reference script constructs
its torch optimizer with ``model.parameters()`` only
(OpenPyStruct_FNN_MultiCase.py:481 and equivalents), so the "trainable"
alpha is never actually updated — it stays at its initial 0.5 and the
regularizer is constantly zero.  The harness trains alpha by default (the
evident design intent) and offers ``train_alpha=False`` for bit-faithful
replication of the reference behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def trainable_l1l2_loss(
    alpha,
    preds,
    targets,
    min_constraint=None,
    max_constraint=None,
    penalty_weight: float = 5e-1,
):
    """alpha * L1 + (1 - alpha) * L2 + penalty_weight * box_penalty.

    ``alpha`` is the raw (unclamped) parameter; the blend uses the clamped
    value, exactly as the reference clamps inside ``forward``
    (OpenPyStruct_FNN_MultiCase.py:419).
    """
    a = jnp.clip(alpha, 1e-6, 1.0)
    l1 = jnp.mean(jnp.abs(preds - targets))
    l2 = jnp.mean((preds - targets) ** 2)
    penalty = 0.0
    if min_constraint is not None:
        penalty = penalty + jnp.sum(jnp.maximum(min_constraint - preds, 0.0))
    if max_constraint is not None:
        penalty = penalty + jnp.sum(jnp.maximum(preds - max_constraint, 0.0))
    return a * l1 + (1.0 - a) * l2 + penalty_weight * penalty
