"""PINN surrogate: conv-augmented residual FNN with composite physics loss.

Reference: ``ResidualBlock`` (two-linear bottleneck + Conv1d(1,1,3)+BatchNorm
path) and ``FNNWithResidual(norm_type='batch'|'layer')``
(OpenPyStruct_PINN_MultiCase.py:395-541); output is 302 = I(100) +
deflections(101) + rotations(101) (PINN:35-56); ``CompositeLoss`` =
TrainableL1L2 on the I slice + ``penalty_pinn``-scaled relative-L1 on the
deflection/rotation slices (PINN:603-653).

Note (honest description, as in SURVEY.md section 2/C12): no PDE residual is
computed — "physics" enters only through FEA-produced auxiliary supervision
targets.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from openpystruct_tpu.models.losses import trainable_l1l2_loss


class PINNResidualBlock(nn.Module):
    """Linear bottleneck + optional single-channel conv path + skip
    (OpenPyStruct_PINN_MultiCase.py:395-452)."""

    dim: int
    hidden_dim: int
    dropout_rate: float
    use_conv: bool = True
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        residual = x
        out = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        out = nn.Dense(self.dim, dtype=self.dtype)(out)
        if self.use_conv:
            # Conv1d(1,1,k) over the feature axis: (B, dim) -> (B, dim, 1)
            c = nn.Conv(
                features=1, kernel_size=(self.kernel_size,), padding="SAME",
                dtype=self.dtype,
            )(x[..., None])
            # BatchNorm1d(1): stats over (batch, length) for the one channel
            c = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis=-1, dtype=jnp.float32,
            )(c)
            out = out + c.squeeze(-1).astype(self.dtype)
        return out + residual


class PINNWithResidual(nn.Module):
    """The PINN's FNNWithResidual (OpenPyStruct_PINN_MultiCase.py:454-541):
    input Dense -> norm -> LeakyReLU -> Dropout -> num_blocks x
    [PINNResidualBlock -> norm] -> output Dense (302 by default)."""

    hidden_dim: int = 350
    num_blocks: int = 2
    output_dim: int = 302
    dropout_rate: float = 0.5
    use_conv: bool = True
    norm_type: str = "batch"
    dtype: Any = jnp.float32

    def _norm(self, train: bool):
        if self.norm_type == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=jnp.float32,
            )
        if self.norm_type == "layer":
            return nn.LayerNorm(dtype=jnp.float32)
        raise ValueError("Invalid norm_type. Use 'batch' or 'layer'.")

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.ndim == 3:
            x = x.reshape(x.shape[0], -1)
        x = x.astype(self.dtype)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        out = self._norm(train)(out).astype(self.dtype)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        for _ in range(self.num_blocks):
            out = PINNResidualBlock(
                self.hidden_dim, self.hidden_dim // 2, self.dropout_rate,
                self.use_conv, dtype=self.dtype,
            )(out, train=train)
            out = self._norm(train)(out).astype(self.dtype)
        return nn.Dense(self.output_dim, dtype=jnp.float32)(out)


def composite_pinn_loss(
    alpha,
    preds,
    targets,
    nelem: int = 100,
    min_constraint=None,
    max_constraint=None,
    box_constraint_coeff: float = 1e-1,
    penalty_pinn: float = 1.5e-6,
):
    """TrainableL1L2 on the I slice + penalty_pinn * (relative-L1 on
    deflections + rotations) (OpenPyStruct_PINN_MultiCase.py:603-653).
    The deflection/rotation dims are each (output_dim - nelem) / 2."""
    aux_dim = (preds.shape[-1] - nelem) // 2
    I_pred, I_true = preds[:, :nelem], targets[:, :nelem]
    d_pred = preds[:, nelem : nelem + aux_dim]
    d_true = targets[:, nelem : nelem + aux_dim]
    r_pred = preds[:, nelem + aux_dim :]
    r_true = targets[:, nelem + aux_dim :]

    loss_I = trainable_l1l2_loss(
        alpha, I_pred, I_true, min_constraint, max_constraint,
        box_constraint_coeff,
    )
    eps = 1e-8
    loss_d = jnp.mean(jnp.abs(d_pred - d_true) / (jnp.abs(d_true) + eps))
    loss_r = jnp.mean(jnp.abs(r_pred - r_true) / (jnp.abs(r_true) + eps))
    return loss_I + penalty_pinn * (loss_d + loss_r)
