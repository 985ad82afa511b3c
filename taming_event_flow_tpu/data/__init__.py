from .base import BaseStreamLoader, pad_events, bucket_size
from .h5 import H5Loader
from .cache import CacheDataset

__all__ = [
    "BaseStreamLoader",
    "H5Loader",
    "CacheDataset",
    "pad_events",
    "bucket_size",
]
