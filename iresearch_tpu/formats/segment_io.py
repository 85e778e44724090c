"""Segment serialization: SegmentData <-> one blobpack file.

Reference analog: the per-segment file family (.doc/.pos/.tm/.ti/.cs/.sm,
formats_10.cpp:325-333) collapses into a single checksummed pack whose
arrays are 64-byte aligned for direct device upload.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from iresearch_tpu.formats.columnstore import Column
from iresearch_tpu.formats.postings import FieldPostings
from iresearch_tpu.formats.spec import NUM_CLASSES, IndexFeatures
from iresearch_tpu.store.blobpack import BlobPackReader, BlobPackWriter

# formats this build can open (reference: multi-version format registry,
# formats.hpp:429-480; readers stay backward compatible, writers emit the
# newest version)
READABLE_FORMATS = {"iresearch_tpu/3"}


def write_segment(
    seg: "SegmentData", column_compression: str = "none"
) -> bytes:  # noqa: F821
    from iresearch_tpu.index.segment import SegmentData
    from iresearch_tpu.store.codecs import get_compressor

    assert isinstance(seg, SegmentData)
    codec = get_compressor(column_compression)
    meta = {
        "format": "iresearch_tpu/3",  # 3 = planar pow2-bit-packed split pools
        "num_docs": seg.num_docs,
        "fields": {},
        "columns": {},
    }
    w = BlobPackWriter()
    for fname, fp in seg.fields.items():
        key = f"f.{fname}"
        meta["fields"][fname] = {
            "docs_with_field": fp.docs_with_field,
            "total_term_freq": fp.total_term_freq,
            "features": int(fp.features),
            "has_positions": fp.pos_flat is not None,
        }
        w.add(f"{key}.term_blob", np.frombuffer(fp.term_blob, np.uint8))
        w.add(f"{key}.term_offsets", fp.term_offsets)
        w.add(f"{key}.entries", fp.entries)
        w.add(f"{key}.norms", fp.norms)
        if fp.pos_flat is not None:
            w.add(f"{key}.pos", fp.pos_flat)
        if fp.offs_start is not None:
            w.add(f"{key}.ostart", fp.offs_start)
            w.add(f"{key}.oend", fp.offs_end)
        if fp.pay_len is not None:
            w.add(f"{key}.paylen", fp.pay_len)
            w.add(f"{key}.payblob", np.frombuffer(fp.pay_blob, np.uint8))
        for c in range(NUM_CLASSES):
            w.add(f"{key}.docw{c}", fp.doc_words[c])
            w.add(f"{key}.freqw{c}", fp.freq_words[c])
            w.add(f"{key}.base{c}", fp.base[c])
            w.add(f"{key}.bmax{c}", fp.bmax[c])
            w.add(f"{key}.bmaxf{c}", fp.bmaxf[c])
    for cname, col in seg.columns.items():
        key = f"c.{cname}"
        # stored-value payloads are compressed; postings pools are not
        # (reference: lz4 on the columnstore only, columnstore2.cpp)
        meta["columns"][cname] = {"kind": col.kind, "codec": codec.name}
        if col.docs is not None:
            w.add(f"{key}.docs", col.docs)
        if col.offsets is not None:
            w.add(f"{key}.offsets", col.offsets)
        w.add(
            f"{key}.blob",
            np.frombuffer(codec.compress(col.blob), np.uint8),
        )
    w.set_meta("segment", meta)
    return w.tobytes()


def read_segment(data: bytes) -> "SegmentData":  # noqa: F821
    from iresearch_tpu.index.segment import SegmentData

    r = BlobPackReader(data)
    meta = r.meta["segment"]
    found = meta.get("format")
    if found not in READABLE_FORMATS:
        raise ValueError(
            f"unsupported segment format {found!r}; this build reads "
            f"{sorted(READABLE_FORMATS)} (reference analog: format "
            f"registry versions, formats.hpp:429-480)"
        )
    fields: Dict[str, FieldPostings] = {}
    for fname, fm in meta["fields"].items():
        key = f"f.{fname}"
        fields[fname] = FieldPostings(
            term_blob=r.array(f"{key}.term_blob").tobytes(),
            term_offsets=r.array(f"{key}.term_offsets"),
            entries=r.array(f"{key}.entries"),
            base=tuple(r.array(f"{key}.base{c}") for c in range(NUM_CLASSES)),
            bmax=tuple(r.array(f"{key}.bmax{c}") for c in range(NUM_CLASSES)),
            bmaxf=tuple(r.array(f"{key}.bmaxf{c}") for c in range(NUM_CLASSES)),
            doc_words=tuple(r.array(f"{key}.docw{c}") for c in range(NUM_CLASSES)),
            freq_words=tuple(r.array(f"{key}.freqw{c}") for c in range(NUM_CLASSES)),
            norms=r.array(f"{key}.norms"),
            pos_flat=r.array(f"{key}.pos") if f"{key}.pos" in r else None,
            docs_with_field=fm["docs_with_field"],
            total_term_freq=fm["total_term_freq"],
            features=IndexFeatures(fm["features"]),
            offs_start=r.array(f"{key}.ostart") if f"{key}.ostart" in r else None,
            offs_end=r.array(f"{key}.oend") if f"{key}.oend" in r else None,
            pay_len=r.array(f"{key}.paylen") if f"{key}.paylen" in r else None,
            pay_blob=(
                r.array(f"{key}.payblob").tobytes()
                if f"{key}.payblob" in r
                else b""
            ),
        )
    from iresearch_tpu.store.codecs import get_compressor

    columns: Dict[str, Column] = {}
    for cname, cm in meta["columns"].items():
        key = f"c.{cname}"
        codec = get_compressor(cm.get("codec", "none"))
        columns[cname] = Column(
            kind=cm["kind"],
            docs=r.array(f"{key}.docs") if f"{key}.docs" in r else None,
            offsets=r.array(f"{key}.offsets") if f"{key}.offsets" in r else None,
            blob=codec.decompress(r.array(f"{key}.blob").tobytes()),
            num_docs=meta["num_docs"],
        )
    return SegmentData(num_docs=meta["num_docs"], fields=fields, columns=columns)
