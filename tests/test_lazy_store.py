"""Blocked columnstore (v6) + mmap lazy segment opens (VERDICT r2 items 7+9).

A compressed column must decompress only the touched 65536-value block
on point reads; an MMapDirectory open must not materialize pool bytes
(the OS pages them in on first touch) while queries stay exact.
"""

import numpy as np
import pytest

from iresearch_tpu.formats.columnstore import COLUMN_BLOCK, ColumnBuilder
from iresearch_tpu.formats.segment_io import (
    FORMAT_V6,
    read_segment,
    write_segment,
)
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.segment import SegmentData
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MMapDirectory


def test_blocked_column_point_reads():
    n = COLUMN_BLOCK * 2 + 777  # three blocks
    cb = ColumnBuilder("v")
    for d in range(n):
        cb.add(d, b"val%08d" % d)
    col = cb.build(n)
    seg = SegmentData(n, {}, {"v": col})
    blob = write_segment(seg, column_compression="zlib", version=FORMAT_V6)
    got = read_segment(blob)
    c2 = got.columns["v"]
    assert c2.blocks is not None, "compressed v6 column must be blocked"
    # point reads across block boundaries
    for d in (0, 1, COLUMN_BLOCK - 1, COLUMN_BLOCK, COLUMN_BLOCK + 5, n - 1):
        assert c2.get(d) == b"val%08d" % d
    # only the touched blocks were decompressed
    touched = set(c2.blocks._cache)
    assert touched <= {0, 1, 2} and len(touched) >= 2
    # merge/convert path reads the full payload correctly
    assert c2.full_blob() == col.full_blob()


def test_blocked_sparse_column():
    cb = ColumnBuilder("s")
    docs = list(range(0, COLUMN_BLOCK * 6, 3))  # sparse, 2 blocks of values
    for d in docs:
        cb.add(d, b"x%d" % d)
    col = cb.build(COLUMN_BLOCK * 6)
    blob = write_segment(
        SegmentData(COLUMN_BLOCK * 6, {}, {"s": col}),
        column_compression="zlib",
        version=FORMAT_V6,
    )
    c2 = read_segment(blob).columns["s"]
    for d in (0, 3, COLUMN_BLOCK * 3, docs[-1]):
        assert c2.get(d) == b"x%d" % d
    assert c2.get(1) is None


@pytest.fixture
def mmap_index(tmp_path, rng):
    d = MMapDirectory(str(tmp_path / "idx"))
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(300):
            text = " ".join(
                ["alpha", "beta", "gamma"][int(x)]
                for x in rng.integers(0, 3, size=10)
            )
            w.insert([
                Field("body", text, analyzer="segmentation"),
                Field("payload", "p" * 100 + str(i), index=False, store=True),
            ])
        w.commit()
    return d


def test_mmap_open_and_query(mmap_index):
    r = DirectoryReader.open(mmap_index)
    flt = F.ByTerm("body", "alpha")
    hits = HostQuery(flt, list(r.segments), BM25()).top_k(5)
    assert hits and all(s > 0 for _d, s in hits)
    # stored readback through the mapped buffer
    doc = hits[0][0]
    assert r.stored(doc, "payload") is not None
    # reopen also maps lazily
    assert r.reopen() is r  # same generation


def test_mmap_detects_header_corruption(tmp_path):
    d = MMapDirectory(str(tmp_path / "idx2"))
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        w.insert([Field("body", "hello world", analyzer="segmentation")])
        w.commit()
    # corrupt the magic: mapped opens skip the whole-file CRC but must
    # still reject a broken header
    seg_file = [n for n in d.list() if n.endswith(".seg")][0]
    raw = bytearray(d.read(seg_file))
    raw[0] ^= 0xFF
    d.write(seg_file, bytes(raw))
    from iresearch_tpu.store.blobpack import CorruptPackError

    with pytest.raises(CorruptPackError):
        DirectoryReader.open(d)
