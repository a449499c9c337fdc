"""Data pipeline: discovery/pairing, augmentation, prefetch, KITTI."""

from .generator import BatchGenerator, DataError

__all__ = ["BatchGenerator", "DataError"]
