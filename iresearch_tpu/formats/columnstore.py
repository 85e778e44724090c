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


def column_parts(
    col: Column, doc_map: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, bytes]:
    """Vectorized (new_docs, value_lens, values_blob) of the surviving,
    remapped docs of a column, ordered by new doc id — no per-doc Python.

    ``doc_map`` maps old->new doc ids (-1 = dropped). Building blocks for
    remap_column and the merge_writer column path (reference:
    merge_writer.cpp column merge; a 1M-doc column remaps in numpy time,
    not interpreter time)."""
    old_docs = col.doc_ids()
    nd = doc_map[old_docs.astype(np.int64)]
    keep = nd >= 0
    new_docs = nd[keep].astype(np.uint32)
    order = np.argsort(new_docs, kind="stable")
    new_docs = new_docs[order]
    if col.kind == "mask" or col.offsets is None:
        return new_docs, np.zeros(len(new_docs), np.int64), b""
    lens_all = np.diff(col.offsets.astype(np.int64))
    starts_all = col.offsets[:-1].astype(np.int64)
    lens = lens_all[keep][order]
    starts = starts_all[keep][order]
    total = int(lens.sum())
    if total == 0:
        return new_docs, lens, b""
    blob_arr = np.frombuffer(col.blob, np.uint8)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    blob = blob_arr[np.repeat(starts, lens) + within].tobytes()
    return new_docs, lens, blob


def column_from_parts(
    docs: np.ndarray, lens: np.ndarray, blob: bytes, num_docs: int
) -> Column:
    """Assemble a Column from vectorized parts (docs ascending unique)."""
    n = len(docs)
    if len(blob) == 0 and (n == 0 or int(lens.max(initial=0)) == 0):
        return Column("mask", docs.astype(np.uint32), None, b"", num_docs)
    offsets = np.zeros(n + 1, np.uint64)
    np.cumsum(lens.astype(np.uint64), out=offsets[1:])
    if n == num_docs:
        return Column("dense", None, offsets, blob, num_docs)
    return Column("sparse", docs.astype(np.uint32), offsets, blob, num_docs)


def remap_column(col: Column, doc_map: np.ndarray, new_num_docs: int) -> Column:
    """Rebuild a column under an old->new doc id mapping (-1 = dropped).

    Used by merge/consolidation (reference: merge_writer.cpp column merge).
    Fully vectorized — no per-doc Python loop.
    """
    docs, lens, blob = column_parts(col, doc_map)
    return column_from_parts(docs, lens, blob, new_num_docs)
