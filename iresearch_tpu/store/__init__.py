"""Storage layer (reference: core/store/)."""

from iresearch_tpu.store.directory import (
    Directory,
    FSDirectory,
    MemoryDirectory,
    MMapDirectory,
    IndexLock,
    LockObtainError,
)
from iresearch_tpu.store.blobpack import BlobPackWriter, BlobPackReader

__all__ = [
    "Directory",
    "FSDirectory",
    "MemoryDirectory",
    "MMapDirectory",
    "IndexLock",
    "LockObtainError",
    "BlobPackWriter",
    "BlobPackReader",
]
