"""Datasets + host data plane (Multi-PIE / LFW / LightCNN / synthetic)."""

from ffwm_tpu.data.face_dataset import FaceDataset, rotate_augment, s2f
from ffwm_tpu.data.lightcnn_dataset import LightCNNDataset
from ffwm_tpu.data.loader import DataLoader, collate


def create_dataset(dataroot: str, datamode: str = "multipie",
                   phase: str = "train", batch_size: int = 8,
                   load_size: int = 128, aug: bool = False,
                   preload: bool = False, num_threads: int = 4,
                   max_dataset_size=None, shuffle=None, seed=None,
                   process_shard=None) -> DataLoader:
    """Registry-style entry (reference data/__init__.py:49-60): build the
    dataset + loader for a phase. Validation loaders don't shuffle."""
    ds = FaceDataset(dataroot, datamode=datamode, phase=phase,
                     load_size=load_size, aug=aug, preload=preload, seed=seed)
    is_train = phase == "train"
    return DataLoader(
        ds,
        batch_size=batch_size,
        shuffle=is_train if shuffle is None else shuffle,
        num_threads=num_threads if is_train else 1,
        drop_last=is_train,
        max_dataset_size=max_dataset_size,
        seed=seed,
        process_shard=process_shard,
    )


__all__ = [
    "DataLoader",
    "FaceDataset",
    "LightCNNDataset",
    "collate",
    "create_dataset",
    "rotate_augment",
    "s2f",
]
