"""Flax surrogate model families (the reference's L4 layer)."""

from openpystruct_tpu.models.losses import trainable_l1l2_loss
from openpystruct_tpu.models.fnn import FNNWithResidual
from openpystruct_tpu.models.gnn import ChainGNN
from openpystruct_tpu.models.fno import FNO1dModel, SpectralConv1d
from openpystruct_tpu.models.pinn import (
    PINNWithResidual,
    composite_pinn_loss,
)
from openpystruct_tpu.models.transformer_diffusion import (
    DiffusionModule,
    TransformerDiffusionModel,
)
from openpystruct_tpu.models.bayesian import (
    BayesLinear,
    BayesianTransformerDiffusionModel,
    bayes_kl,
    mc_output_stats,
)

__all__ = [
    "BayesLinear",
    "BayesianTransformerDiffusionModel",
    "bayes_kl",
    "mc_output_stats",
    "trainable_l1l2_loss",
    "FNNWithResidual",
    "ChainGNN",
    "FNO1dModel",
    "SpectralConv1d",
    "PINNWithResidual",
    "composite_pinn_loss",
    "DiffusionModule",
    "TransformerDiffusionModel",
]
