"""Device mesh + sharding helpers — the distributed runtime of ffwm_tpu.

The reference has no distributed execution (SURVEY.md §2.7: single GPU, a
vestigial DataParallel). The TPU-native replacement is GSPMD data
parallelism: one ``data`` mesh axis over the slice, batches sharded on their
leading axis, parameters replicated, and gradient/BatchNorm reductions
inserted by XLA as ICI collectives (psum/all-reduce) — no NCCL, no process
groups, no explicit gradient averaging.

For multi-host slices the same code works: `jax.distributed.initialize()` +
per-host batch construction with `make_host_array` below.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded.

    One device_put call for the whole tree — jax batches the transfers
    (per-leaf puts pay per-call dispatch overhead).

    Multi-host: each process passes its LOCAL shard (global_batch /
    process_count rows — the loader's ``process_shard`` slicing produces
    exactly that) and the global array is assembled from the per-process
    parts; the global batch dimension is local_rows * process_count.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        nproc = jax.process_count()

        def put(x):
            gshape = (x.shape[0] * nproc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)

        return jax.tree.map(put, batch)
    return jax.device_put(batch, sh)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/optimizer state) across the mesh.

    Multi-host: every process must hold the same host values (trainers
    guarantee this: same PRNG seed, or a checkpoint all hosts read); the
    values are assembled into process-spanning replicated arrays.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, P())
    return jax.device_put(tree, replicated(mesh))


def make_host_array(global_shape, mesh: Mesh, local_data: np.ndarray):
    """Multi-host entry: assemble a globally-sharded array from this host's
    shard (wraps jax.make_array_from_process_local_data)."""
    sh = batch_sharding(mesh)
    return jax.make_array_from_process_local_data(sh, local_data, global_shape)


def check_batch_divisible(batch_size: int, n_dev: int, flag: str = "--batch_size") -> None:
    """Fail fast when the configured batch can't shard over the data mesh.

    Training drops non-divisible batches (:func:`drop_remainder`); a batch
    size that is itself not a multiple of the device count would therefore
    drop EVERY batch and train nothing (e.g. the reference's flow default
    batch 6 on a v5e-8 mesh). Loud error beats a silent no-op epoch.
    """
    if batch_size % n_dev:
        raise SystemExit(
            f"{flag} {batch_size} is not a multiple of the {n_dev}-device "
            f"data mesh: every batch would be dropped (uneven shards can't "
            f"split over the mesh; only an epoch's final partial batch is "
            f"droppable). Use a multiple of {n_dev}.")


def drop_remainder(batch: Any, multiple: int) -> Optional[Any]:
    """Truncate the leading axis to a multiple of ``multiple``; None when the
    whole batch is smaller than one sample per device.

    Training-path counterpart of :func:`pad_to_multiple`: padding would feed
    edge-replicated samples into losses, BatchNorm statistics and gradient
    means at full weight — numerics the reference's single-device training
    never sees. Dropping the (shuffled) tail keeps every gradient exact; use
    :func:`pad_to_multiple` only for evaluation, where the caller masks the
    padded rows out of the metric (real count is returned alongside).
    """
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    keep = n - n % multiple
    if keep == n:
        return batch
    if keep == 0:
        return None
    return jax.tree.map(lambda x: x[:keep], batch)


def pad_to_multiple(batch: Any, multiple: int):
    """Pad the leading axis of every array to a multiple (uneven final
    batches can't shard); returns (padded_batch, real_count)."""
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths, mode="edge")

    return jax.tree.map(_pad, batch), n
