"""Chain-GNN surrogate.

Reference: ``precompute_normalized_adjacency`` + ``GCNLayer`` + ``ChainGNN``
(OpenPyStruct_GNN_MultiCase_Beta.py:249-349): flattened multi-case features
-> encoder MLP producing n_elem x hidden node embeddings -> 2 pre-norm
residual GCN layers over the path-graph adjacency D^-1/2 A D^-1/2 -> per-node
scalar readout.  Trained with AdamW (GNN_Beta.py:395 — pass
``decoupled_weight_decay=True`` to the harness).

TPU note: the 100x100 normalized adjacency is a static dense matrix; the
batched (B, n, d) mixing is a single MXU matmul per layer.  (The chain graph
makes A_hat tridiagonal, so a width-3 conv would also serve, but at n=100 a
dense matmul is already optimal on the MXU.)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def normalized_chain_adjacency(n: int) -> np.ndarray:
    """Path-graph adjacency, symmetrically normalized
    (OpenPyStruct_GNN_MultiCase_Beta.py:249-262)."""
    A = np.zeros((n, n), dtype=np.float32)
    idx = np.arange(n - 1)
    A[idx, idx + 1] = 1.0
    A[idx + 1, idx] = 1.0
    d_inv_sqrt = (A.sum(axis=1) + 1e-8) ** -0.5
    return A * d_inv_sqrt[None, :] * d_inv_sqrt[:, None]


class ChainGNN(nn.Module):
    n_elem: int = 100
    encoder_hidden_dim: int = 128
    gnn_hidden_dim: int = 128
    num_gnn_layers: int = 2
    dropout_rate: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.ndim == 3:  # (B, n_cases, feat) -> flattened, as the reference
            x = x.reshape(x.shape[0], -1)
        x = x.astype(self.dtype)
        B = x.shape[0]

        # Encoder MLP -> node embeddings
        # (OpenPyStruct_GNN_MultiCase_Beta.py:305-310)
        h = nn.Dense(self.encoder_hidden_dim, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.n_elem * self.gnn_hidden_dim, dtype=self.dtype)(h)
        out = h.reshape(B, self.n_elem, self.gnn_hidden_dim)

        A_hat = jnp.asarray(
            normalized_chain_adjacency(self.n_elem), self.dtype
        )
        for _ in range(self.num_gnn_layers):
            # pre-norm residual GCN block (GNN_Beta.py:341-345)
            h = nn.LayerNorm(dtype=jnp.float32)(out).astype(self.dtype)
            h = nn.Dense(self.gnn_hidden_dim, use_bias=False,
                         dtype=self.dtype)(h)
            h = jnp.einsum("ij,bjd->bid", A_hat, h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            out = out + h

        out = nn.Dense(1, dtype=jnp.float32)(out)
        return out.squeeze(-1)
