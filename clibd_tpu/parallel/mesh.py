"""Device mesh + sharding helpers.

The reference's distribution stack (mp.spawn + DDP + NCCL + DistributedSampler,
scripts/train_cl.py:44-48,204,365) maps to: one `jax.sharding.Mesh` over all
devices with a 'data' axis; batches sharded over 'data', params replicated;
XLA inserts all-gathers/psums over ICI inside the jitted step
(SURVEY.md §2.6-2.9, §5.8).  Multi-host initialization goes through
`jax.distributed.initialize` (single-controller JAX).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_initialize_distributed() -> None:
    """Multi-host init (single-controller JAX): call once per process before
    any backend use when running on a multi-host TPU slice.  Uses the TPU
    coordinator autodetection; no-ops when unconfigured or already
    initialized (replaces the reference's MASTER_ADDR/port NCCL rendezvous,
    train_cl.py:44-48)."""
    import os

    if os.environ.get("CLIBD_DISABLE_DISTRIBUTED"):
        return
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process run or already initialized


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a host batch (pytree of np arrays) onto the mesh, batch axis
    sharded over 'data'."""
    sh = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading axis of every array to a multiple (for even sharding);
    returns (padded_batch, original_length)."""
    import numpy as np

    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % multiple

    def _pad(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths, mode="edge")

    return jax.tree.map(_pad, batch), n
