"""Pytree checkpointing.

Mirrors the reference's torch.save contract (localfunctions.py:229-239,
310-322): a periodic ``model.pth`` every 5 epochs with
{epoch, model_state_dict, optimizer_state_dict} and a best-mIoU checkpoint
(default name ``best_model.pth``) additionally carrying ``class_avg_iou``.
Here the state dict is the {params, batch_stats} pytree plus the optax
optimizer state; arrays are materialized to NumPy so checkpoints are
device-free and load anywhere.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, epoch: int, variables: Dict,
                    opt_state: Any = None,
                    class_avg_iou: Optional[float] = None) -> None:
    state = {
        "epoch": epoch,
        "model_state_dict": _to_host(variables),
        "optimizer_state_dict": _to_host(opt_state) if opt_state is not None else None,
    }
    if class_avg_iou is not None:
        state["class_avg_iou"] = float(class_avg_iou)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        state = pickle.load(f)
    return state


def restore_variables(state: Dict):
    """Return (variables, opt_state, epoch) with arrays as jnp."""
    import jax.numpy as jnp

    variables = jax.tree_util.tree_map(jnp.asarray, state["model_state_dict"])
    opt_state = state.get("optimizer_state_dict")
    if opt_state is not None:
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
    return variables, opt_state, state.get("epoch", 0)
