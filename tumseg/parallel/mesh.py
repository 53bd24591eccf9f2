"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY §2.3: no torch.distributed anywhere);
scaling here is TPU-native instead: a 1-D ``data`` mesh axis shards the
batch/block dimension over chips, parameters and batch-stats are replicated,
and XLA inserts the ICI collectives (psum for grads and the cross-chip
BatchNorm reduction) from the sharding annotations — no NCCL analogue.

Multi-host pods extend the same mesh via :func:`initialize_distributed`
(a jax.distributed.initialize front end driven by --coordinator_address or
the standard cluster env vars); nothing else in the framework changes —
make_mesh() then spans every process's devices automatically.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_distributed_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Join a multi-host JAX cluster (idempotent).

    Call before any backend use, once per host process. Strictly explicit
    opt-in: joins only when --coordinator_address is passed or
    TUMSEG_COORDINATOR_ADDRESS is set, and then num_processes/process_id
    must also be given (flags or TUMSEG_NUM_PROCESSES/TUMSEG_PROCESS_ID).
    Broad cluster-env sniffing — ours or jax's own auto-detection — is a
    trap: this image's TPU tunnel exports pod-looking vars like
    TPU_WORKER_HOSTNAMES in single-host sessions, which jax's detector
    would read as a multi-process pod and hang waiting for peers. With no
    coordinator this is a no-op returning False, so single-host runs (the
    default, and everything the reference supported) pay nothing.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    if coordinator_address is None:
        coordinator_address = os.environ.get("TUMSEG_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    if num_processes is None and os.environ.get("TUMSEG_NUM_PROCESSES"):
        num_processes = int(os.environ["TUMSEG_NUM_PROCESSES"])
    if process_id is None and os.environ.get("TUMSEG_PROCESS_ID"):
        process_id = int(os.environ["TUMSEG_PROCESS_ID"])
    if num_processes is None or process_id is None:
        raise ValueError(
            "initialize_distributed: coordinator_address requires explicit "
            "num_processes and process_id (--num_processes/--process_id or "
            "TUMSEG_NUM_PROCESSES/TUMSEG_PROCESS_ID) — jax's cluster "
            "auto-detection is disabled because this environment exports "
            "pod-looking vars in single-host sessions")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _distributed_initialized = True
    return True


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
