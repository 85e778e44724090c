"""Format version matrix: v3 (flat positions) <-> v4 (packed positions)
<-> v5 (inline norm pools).

Reference analog: the formats test parametrization over versions 1_0..1_5
(tests/formats/formats_test_case_base.cpp instantiated per version) and
index-convert.cpp transcoding.
"""

import numpy as np
import pytest

from iresearch_tpu.formats.segment_io import (
    FORMAT_V3,
    FORMAT_V4,
    FORMAT_V5,
    FORMAT_V6,
    FORMAT_V7,
    read_segment,
    write_segment,
)
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import search as host_search
from iresearch_tpu.store.directory import FSDirectory, MemoryDirectory

WORDS = [f"v{i:02d}" for i in range(25)]


def _build(dirobj, version):
    rng = np.random.default_rng(5)
    with IndexWriter(
        dirobj,
        IndexWriterOptions(invert_backend="numpy", format_version=version),
    ) as w:
        for i in range(120):
            n = int(rng.integers(3, 20))
            idx = np.minimum(rng.zipf(1.4, size=n) - 1, len(WORDS) - 1)
            w.insert([
                Field("body", " ".join(WORDS[j] for j in idx), analyzer="segmentation"),
                Field("id", str(i), index=True, store=True),
            ])
        w.commit()
    return DirectoryReader.open(dirobj)


QUERIES = [
    F.ByTerm("body", "v00"),
    F.ByPhrase("body", ["v00", "v01"]),
    F.And(F.ByTerm("body", "v01"), F.ByTerm("body", "v02")),
]


@pytest.mark.parametrize(
    "version", [FORMAT_V3, FORMAT_V4, FORMAT_V5, FORMAT_V6, FORMAT_V7]
)
def test_write_read_search(version):
    reader = _build(MemoryDirectory(), version)
    ref = _build(MemoryDirectory(), FORMAT_V5)
    for q in QUERIES:
        assert host_search(reader, q, k=20) == host_search(ref, q, k=20)


@pytest.mark.parametrize(
    "version", [FORMAT_V3, FORMAT_V4, FORMAT_V5, FORMAT_V6, FORMAT_V7]
)
def test_segment_roundtrip_positions(version):
    reader = _build(MemoryDirectory(), FORMAT_V5)
    seg = reader.segments[0].data
    blob = write_segment(seg, version=version)
    back = read_segment(blob)
    fp_a = seg.fields["body"]
    fp_b = back.fields["body"]
    np.testing.assert_array_equal(fp_a.entries[:, :10], fp_b.entries[:, :10])
    np.testing.assert_array_equal(fp_a.positions_flat(), fp_b.positions_flat())


@pytest.mark.parametrize("version", [FORMAT_V5, FORMAT_V6, FORMAT_V7])
def test_roundtrip_keeps_inline_norm_pools(version):
    # inline norms are a PERFORMANCE contract, not just a correctness one:
    # losing them on read silently sends every norm read through the [nd]
    # gather path (this regressed for v6 once — reads returned
    # nrm_words=None, costing ~100 us/query at 5M docs)
    reader = _build(MemoryDirectory(), FORMAT_V5)
    seg = reader.segments[0].data
    fp_a = seg.fields["body"]
    assert fp_a.nrm_words is not None
    back = read_segment(write_segment(seg, version=version))
    fp_b = back.fields["body"]
    assert fp_b.nrm_words is not None, f"{version} read dropped nrm_words"
    for c, (a, b) in enumerate(zip(fp_a.nrm_words, fp_b.nrm_words)):
        np.testing.assert_array_equal(a, b, err_msg=f"norm pool class {c}")
    from iresearch_tpu.formats.spec import TermCols

    np.testing.assert_array_equal(
        fp_a.entries[:, TermCols.NCLS], fp_b.entries[:, TermCols.NCLS]
    )


def test_unknown_format_rejected(monkeypatch):
    import iresearch_tpu.formats.segment_io as sio

    reader = _build(MemoryDirectory(), FORMAT_V5)
    with pytest.raises(ValueError, match="cannot write"):
        write_segment(reader.segments[0].data, version="iresearch_tpu/9")
    # a validly-checksummed pack from a FUTURE version must be refused
    # with a descriptive error, not a deep KeyError
    monkeypatch.setattr(
        sio, "WRITABLE_FORMATS", sio.WRITABLE_FORMATS | {"iresearch_tpu/9"}
    )
    blob = write_segment(reader.segments[0].data, version="iresearch_tpu/9")
    with pytest.raises(ValueError, match="unsupported segment format"):
        read_segment(blob)


@pytest.mark.parametrize(
    "src,dst", [(FORMAT_V3, FORMAT_V4), (FORMAT_V4, FORMAT_V3),
     (FORMAT_V4, FORMAT_V5), (FORMAT_V5, FORMAT_V4),
     (FORMAT_V3, FORMAT_V5), (FORMAT_V5, FORMAT_V3),
     (FORMAT_V5, FORMAT_V6), (FORMAT_V6, FORMAT_V5),
     (FORMAT_V3, FORMAT_V6), (FORMAT_V6, FORMAT_V3),
     (FORMAT_V6, FORMAT_V7), (FORMAT_V7, FORMAT_V6),
     (FORMAT_V3, FORMAT_V7), (FORMAT_V7, FORMAT_V3)]
)
def test_convert_cli_both_directions(tmp_path, src, dst):
    from iresearch_tpu.cli.index_convert import main as convert_main

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    reader = _build(FSDirectory(str(a)), src)
    assert convert_main(["--in", str(a), "--out", str(b), "--format", dst]) == 0
    conv = DirectoryReader.open(FSDirectory(str(b)))
    for q in QUERIES:
        assert host_search(conv, q, k=20) == host_search(reader, q, k=20)
    # the converted index really is in the target version
    seg_files = [f for f in FSDirectory(str(b)).list() if f.endswith(".seg")]
    raw = bytes(FSDirectory(str(b)).read(seg_files[0]))
    assert dst.encode() in raw and src.encode() not in raw


def test_v7_packed_offsets_size_and_laziness():
    """v7 contract: column address tables cost ~1 B/value on disk (vs raw
    u64 8 B/value) and point reads decode one 65536-value block, never the
    whole table (reference: avg-encoded address tables,
    columnstore2.hpp:83)."""
    from iresearch_tpu.formats.columnstore import COLUMN_BLOCK, PackedOffsets
    from iresearch_tpu.index.segment import SegmentData
    from iresearch_tpu.formats.columnstore import ColumnBuilder

    rng = np.random.default_rng(7)
    n = 3 * COLUMN_BLOCK + 123
    lens = rng.integers(1, 40, size=n)
    cb = ColumnBuilder("x")
    pos = 0
    payload = rng.integers(0, 256, size=int(lens.sum()), dtype=np.uint8).tobytes()
    for i, ln in enumerate(lens):
        cb.add(i, payload[pos : pos + int(ln)])
        pos += int(ln)
    col = cb.build(n)
    seg = SegmentData(num_docs=n, fields={}, columns={"x": col})
    blob = write_segment(seg, version=FORMAT_V7)
    back = read_segment(blob)
    c = back.columns["x"]
    po = c.offsets
    assert isinstance(po, PackedOffsets)
    # size: ≤ 2 B/value all-in (bases + widths + pack + pack offsets)
    assert po.nbytes <= 2 * n, (po.nbytes, n)
    # laziness: a point read decodes exactly one block
    assert len(po._cache) == 0
    raw = np.concatenate([[0], np.cumsum(lens)]).astype(np.uint64)
    expect = payload[int(raw[COLUMN_BLOCK + 5]) : int(raw[COLUMN_BLOCK + 6])]
    assert c.get(COLUMN_BLOCK + 5) == expect
    assert set(po._cache) == {1}
    # exactness vs the raw table
    np.testing.assert_array_equal(po.materialize(), raw)
