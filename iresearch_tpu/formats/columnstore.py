"""Columnstore: per-document stored values.

Reference: core/formats/columnstore2.{hpp,cpp} — a column is up-to-64k-doc
blocks with dense/sparse/mask encodings and a sparse-bitmap doc index.
Here a column is one of three layouts chosen automatically at build time:

* ``dense``  — every doc in [0, num_docs) has a value: ``offsets[nd+1]`` + blob
* ``sparse`` — sorted ``docs[n]`` + ``offsets[n+1]`` + blob; lookup is
  ``searchsorted`` (the role of the reference's rank-enabled sparse bitmap)
* ``mask``   — sorted ``docs[n]`` only (presence, no payload;
  reference: ColumnType::kMask, columnstore2.hpp:208-219)

Values are raw bytes; typed helpers pack/unpack numerics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np


@dataclass
class Column:
    kind: str  # dense | sparse | mask
    docs: Optional[np.ndarray]  # u32 [n], None for dense
    offsets: Optional[np.ndarray]  # u64 [n+1], None for mask
    blob: bytes
    num_docs: int

    @property
    def size(self) -> int:
        """Number of documents that carry this column."""
        if self.kind == "dense":
            return self.num_docs
        return len(self.docs)

    def doc_ids(self) -> np.ndarray:
        if self.kind == "dense":
            return np.arange(self.num_docs, dtype=np.uint32)
        return self.docs

    def has(self, doc: int) -> bool:
        if self.kind == "dense":
            return 0 <= doc < self.num_docs
        i = np.searchsorted(self.docs, doc)
        return i < len(self.docs) and self.docs[i] == doc

    def get(self, doc: int) -> Optional[bytes]:
        """Value for ``doc`` or None; mask columns return b'' when present."""
        if self.kind == "dense":
            if not (0 <= doc < self.num_docs):
                return None
            lo, hi = int(self.offsets[doc]), int(self.offsets[doc + 1])
            return self.blob[lo:hi]
        i = int(np.searchsorted(self.docs, doc))
        if i >= len(self.docs) or self.docs[i] != doc:
            return None
        if self.kind == "mask":
            return b""
        lo, hi = int(self.offsets[i]), int(self.offsets[i + 1])
        return self.blob[lo:hi]

    def items(self) -> Iterator[Tuple[int, bytes]]:
        if self.kind == "dense":
            for d in range(self.num_docs):
                lo, hi = int(self.offsets[d]), int(self.offsets[d + 1])
                yield d, self.blob[lo:hi]
        elif self.kind == "mask":
            for d in self.docs:
                yield int(d), b""
        else:
            for i, d in enumerate(self.docs):
                lo, hi = int(self.offsets[i]), int(self.offsets[i + 1])
                yield int(d), self.blob[lo:hi]


class ColumnBuilder:
    """Accumulates (doc, value) pairs in ascending doc order."""

    def __init__(self, name: str) -> None:
        self.name = name
        self._docs: List[int] = []
        self._chunks: List[bytes] = []
        self._all_empty = True

    def add(self, doc: int, value: bytes = b"") -> None:
        if self._docs and doc < self._docs[-1]:
            raise ValueError("column docs must be added in ascending order")
        if self._docs and doc == self._docs[-1]:
            # multi-valued: concatenate (reference columns store one payload
            # per doc; writers append)
            self._chunks[-1] += value
            return
        self._docs.append(doc)
        self._chunks.append(bytes(value))
        if value:
            self._all_empty = False

    def build(self, num_docs: int) -> Column:
        n = len(self._docs)
        docs = np.asarray(self._docs, dtype=np.uint32)
        if self._all_empty:
            return Column("mask", docs, None, b"", num_docs)
        if n == num_docs:
            lens = np.fromiter((len(c) for c in self._chunks), np.uint64, count=n)
            offsets = np.zeros(n + 1, np.uint64)
            np.cumsum(lens, out=offsets[1:])
            return Column("dense", None, offsets, b"".join(self._chunks), num_docs)
        lens = np.fromiter((len(c) for c in self._chunks), np.uint64, count=n)
        offsets = np.zeros(n + 1, np.uint64)
        if n:
            np.cumsum(lens, out=offsets[1:])
        return Column("sparse", docs, offsets, b"".join(self._chunks), num_docs)


def remap_column(col: Column, doc_map: np.ndarray, new_num_docs: int) -> Column:
    """Rebuild a column under an old->new doc id mapping (-1 = dropped).

    Used by merge/consolidation (reference: merge_writer.cpp column merge).
    """
    b = ColumnBuilder("remap")
    pairs = []
    for doc, value in col.items():
        nd = int(doc_map[doc])
        if nd >= 0:
            pairs.append((nd, value))
    pairs.sort(key=lambda p: p[0])
    for nd, value in pairs:
        b.add(nd, value)
    # preserve mask-ness for empty-valued columns
    return b.build(new_num_docs)
