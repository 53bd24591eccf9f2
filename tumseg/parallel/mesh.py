"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY §2.3: no torch.distributed anywhere);
scaling here is TPU-native instead: a 1-D ``data`` mesh axis shards the
batch/block dimension over chips, parameters and batch-stats are replicated,
and XLA inserts the ICI collectives (psum for grads and the cross-chip
BatchNorm reduction) from the sharding annotations — no NCCL analogue.

Multi-host pods extend the same mesh via jax.distributed.initialize();
nothing else in the framework changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` (defaults to all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch/block) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded on the leading axis.
    Pads the batch to a multiple of the mesh size if needed (padded rows are
    the caller's responsibility to mask — see infer.voting)."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``arr`` along ``axis`` to a multiple of ``multiple`` by repeating
    the last row; returns (padded, original_length)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_block = np.take(arr, [-1] * rem, axis=axis)
    return np.concatenate([arr, pad_block], axis=axis), n
