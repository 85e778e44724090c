"""Index meta + snapshot readers.

Reference: DirectoryReader over the committed ``segments_<gen>`` manifest
(core/index/directory_reader_impl.cpp:209, index meta codec
formats_10.cpp:2983-3067). Snapshot isolation: a reader materializes all
segment payloads at open, so later commits/cleanups never disturb it;
``reopen`` reuses unchanged segment readers like the reference.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from iresearch_tpu.formats.segment_io import read_segment
from iresearch_tpu.index.segment import SegmentReader
from iresearch_tpu.store.blobpack import BlobPackReader
from iresearch_tpu.store.directory import Directory

_SEGMENTS_RE = re.compile(r"^segments_(\d+)$")


@dataclass
class SegmentInfo:
    name: str
    file: str
    num_docs: int
    del_file: Optional[str] = None
    del_gen: int = 0

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "file": self.file,
            "num_docs": self.num_docs,
            "del_file": self.del_file,
            "del_gen": self.del_gen,
        }

    @staticmethod
    def from_json(d: dict) -> "SegmentInfo":
        return SegmentInfo(
            name=d["name"],
            file=d["file"],
            num_docs=d["num_docs"],
            del_file=d.get("del_file"),
            del_gen=d.get("del_gen", 0),
        )


@dataclass
class IndexMeta:
    gen: int = 0
    seg_counter: int = 0
    segments: List[SegmentInfo] = field(default_factory=list)

    def to_bytes(self) -> bytes:
        return json.dumps(
            {
                "format": "iresearch_tpu_meta/1",
                "gen": self.gen,
                "seg_counter": self.seg_counter,
                "segments": [s.to_json() for s in self.segments],
            }
        ).encode("utf-8")

    @staticmethod
    def from_bytes(data: bytes) -> "IndexMeta":
        d = json.loads(data.decode("utf-8"))
        return IndexMeta(
            gen=d["gen"],
            seg_counter=d["seg_counter"],
            segments=[SegmentInfo.from_json(s) for s in d["segments"]],
        )

    def referenced_files(self) -> set:
        out = {f"segments_{self.gen}"}
        for s in self.segments:
            out.add(s.file)
            if s.del_file:
                out.add(s.del_file)
        return out


def find_last_generation(directory: Directory) -> Optional[int]:
    gens = []
    for name in directory.list():
        m = _SEGMENTS_RE.match(name)
        if m:
            gens.append(int(m.group(1)))
    return max(gens) if gens else None


def read_meta(directory: Directory) -> IndexMeta:
    gen = find_last_generation(directory)
    if gen is None:
        return IndexMeta()
    return IndexMeta.from_bytes(directory.read(f"segments_{gen}"))


def _read_mask(directory: Directory, info: SegmentInfo) -> Optional[np.ndarray]:
    if not info.del_file:
        return None
    r = BlobPackReader(directory.read(info.del_file))
    return r.array("docs")


@dataclass
class ReaderOptions:
    """Reference: IndexReaderOptions (core/index/index_reader_options.hpp):
    doc-mask reading, columnstore warmup hooks, WAND context. The device
    analog of columnstore warmup is eager pool upload."""

    read_doc_masks: bool = True
    preload_fields: tuple = ()  # field names to upload to device at open
    # None = verify whole-file CRCs unless the directory serves mapped
    # (lazily-paged) buffers, where a full CRC would fault in every page
    # (reference: mmap opens skip footer scans; IOAdvice READONCE)
    verify_checksums: Optional[bool] = None


class DirectoryReader:
    """Point-in-time view over the committed index."""

    def __init__(
        self,
        directory: Directory,
        meta: IndexMeta,
        segments: List[SegmentReader],
        options: Optional[ReaderOptions] = None,
    ) -> None:
        self._dir = directory
        self.meta = meta
        self.segments = segments
        self.options = options or ReaderOptions()
        self.doc_base = np.zeros(len(segments) + 1, np.int64)
        np.cumsum([s.num_docs for s in segments], out=self.doc_base[1:])

    @staticmethod
    def open(
        directory: Directory, options: Optional[ReaderOptions] = None
    ) -> "DirectoryReader":
        options = options or ReaderOptions()
        meta = read_meta(directory)
        verify = options.verify_checksums
        if verify is None:
            verify = not directory.mapped_reads
        segs = []
        for info in meta.segments:
            data = read_segment(
                directory.read_mapped(info.file), verify=verify
            )
            mask = _read_mask(directory, info) if options.read_doc_masks else None
            segs.append(SegmentReader(info.name, data, mask))
        r = DirectoryReader(directory, meta, segs, options)
        r.preload_device(options.preload_fields)
        return r

    def preload_device(self, fields=()) -> None:
        """Eagerly upload the named fields' pools on every segment (the
        mmap-warmup analog; reference: columnstore warmup hook,
        segment_reader_impl.cpp:185-294)."""
        for sr in self.segments:
            for fname in fields:
                if sr.field(fname) is not None:
                    sr.device_field(fname)

    def reopen(self) -> "DirectoryReader":
        """Refresh to the latest commit, reusing unchanged segment readers."""
        meta = read_meta(directory=self._dir)
        if meta.gen == self.meta.gen:
            return self
        existing: Dict[Tuple[str, int], SegmentReader] = {
            (info.name, info.del_gen): sr
            for info, sr in zip(self.meta.segments, self.segments)
        }
        verify = self.options.verify_checksums
        if verify is None:
            verify = not self._dir.mapped_reads
        segs = []
        for info in meta.segments:
            sr = existing.get((info.name, info.del_gen))
            if sr is None:
                data = read_segment(
                    self._dir.read_mapped(info.file), verify=verify
                )
                sr = SegmentReader(info.name, data, _read_mask(self._dir, info))
            segs.append(sr)
        return DirectoryReader(self._dir, meta, segs, self.options)

    # --- aggregate stats ----------------------------------------------

    def __len__(self) -> int:
        return len(self.segments)

    def __iter__(self):
        return iter(self.segments)

    @property
    def docs_count(self) -> int:
        return int(self.doc_base[-1])

    @property
    def live_docs_count(self) -> int:
        return sum(s.live_docs_count for s in self.segments)

    def field_stats(self, field_name: str) -> Tuple[int, int]:
        """(docs_with_field, total_term_freq) summed across segments.

        Reference: FieldCollector aggregation feeding scorer stats
        (core/search/bm25.cpp:366-384).
        """
        dwf = 0
        ttf = 0
        for s in self.segments:
            fp = s.field(field_name)
            if fp is not None:
                dwf += fp.docs_with_field
                ttf += fp.total_term_freq
        return dwf, ttf

    def term_stats(self, field_name: str, term: bytes) -> int:
        """Index-wide doc frequency of a term."""
        df = 0
        for s in self.segments:
            tid = s.lookup_term(field_name, term)
            if tid is not None:
                df += int(s.field(field_name).entries[tid, 0])
        return df

    # --- stored values -------------------------------------------------

    def global_doc(self, seg_idx: int, local_doc: int) -> int:
        return int(self.doc_base[seg_idx]) + local_doc

    def split_doc(self, global_doc: int) -> Tuple[int, int]:
        seg = int(np.searchsorted(self.doc_base, global_doc, side="right")) - 1
        return seg, global_doc - int(self.doc_base[seg])

    def stored(self, global_doc: int, column: str) -> Optional[bytes]:
        seg, local = self.split_doc(global_doc)
        col = self.segments[seg].column(column)
        return None if col is None else col.get(local)
