"""GSPMD data-parallel runtime (mesh, shardings, host-array assembly)."""

from ffwm_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_host_array,
    make_mesh,
    check_batch_divisible,
    drop_remainder,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_host_array",
    "make_mesh",
    "check_batch_divisible",
    "drop_remainder",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]
