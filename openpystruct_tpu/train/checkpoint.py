"""Checkpointing.

Upgrade over the reference, which only ``torch.save``'s a best model
state_dict (OpenPyStruct_FNN_MultiCase.py:577-580) with no optimizer state
and no resume: orbax checkpoints of arbitrary pytrees (params or full train
state), restorable across hosts.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree checkpoint to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(tree), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; ``target`` provides structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)
