"""Data pipeline: discovery/pairing, augmentation, prefetch, packed
storage, KITTI."""

from .generator import BatchGenerator, DataError
from .packed import PackedDataset, pack_dataset

__all__ = ["BatchGenerator", "DataError", "PackedDataset", "pack_dataset"]
