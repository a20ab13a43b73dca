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


_MULTIHOST_ENV_HINTS = (
    "CLIBD_MULTIHOST",              # explicit opt-in
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",         # Cloud TPU pod slices
)


def maybe_initialize_distributed() -> bool:
    """Multi-host init (single-controller JAX): call once per process, before
    any backend use, when running on a multi-host TPU slice.  Replaces the
    reference's MASTER_ADDR/port NCCL rendezvous (train_cl.py:44-48).

    Only attempts `jax.distributed.initialize()` when the environment carries
    a multi-host hint (coordinator address / pod-slice vars / CLIBD_MULTIHOST)
    so single-chip and CPU runs never block on autodetection.  Returns True
    if distributed mode is active after the call."""
    import os

    if os.environ.get("CLIBD_DISABLE_DISTRIBUTED"):
        return False
    # ORDER MATTERS: the env-hint check must come before ANY jax API call —
    # jax.process_count() initializes the XLA backend, after which
    # jax.distributed.initialize() raises unconditionally (and the swallowed
    # error would silently degrade an opted-in multi-host job to N
    # independent single-host jobs with wrong loader sharding)
    if not any(os.environ.get(k) for k in _MULTIHOST_ENV_HINTS):
        return False
    try:
        jax.distributed.initialize()
    except Exception:
        # already initialized (a prior call) or genuinely single-process
        return jax.process_count() > 1
    return jax.process_count() > 1


def host_id() -> int:
    """This process's rank in the multi-host job (0 on single host)."""
    return jax.process_index()


def num_hosts() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Gate for checkpoint saves / logging — the reference's rank-0 checks
    (train_cl.py:264-331)."""
    return jax.process_index() == 0


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by more than one process."""
    return len({d.process_index for d in np.asarray(mesh.devices).flat}) > 1


def all_hosts_agree(flag: bool) -> bool:
    """True only when EVERY process passes True (single-process: identity).

    Use for any branch whose arms contain collectives: a per-host
    filesystem check (e.g. "is the embeddings cache on disk?") must not
    send processes down different arms, or the pod deadlocks on the first
    collective one side never joins."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray([bool(flag)]))
    return bool(np.all(flags))


def broadcast_from_main(tree):
    """Process 0's pytree of host arrays to every process (single-process:
    identity). Structure/shapes/dtypes must match across processes."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def local_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    """Mesh over THIS process's devices only — for per-host work (e.g. eval,
    where every host runs the full computation on the full data)."""
    return Mesh(np.asarray(jax.local_devices()), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a host batch (pytree of np arrays) onto the mesh, batch axis
    sharded over 'data'.

    When the mesh spans processes, each process passes its LOCAL shard
    (global_batch/num_hosts rows, produced by its host-sharded loader) and
    the global array is assembled across processes; single-process meshes
    (incl. a per-host `local_mesh()` inside a multi-host job) keep the plain
    device_put path."""
    sh = data_sharding(mesh, axis_name)
    if mesh_is_multiprocess(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading axis of every array to a multiple (for even sharding);
    returns (padded_batch, original_length)."""
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % multiple

    def _pad(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths, mode="edge")

    return jax.tree.map(_pad, batch), n
