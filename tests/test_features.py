"""FeatureWriter framework (reference: index_features.hpp:68-87,
norm.hpp:46-198 — pluggable per-field feature columns; Norm v1 float
1/sqrt(len), Norm2 tight int encodings)."""

import numpy as np
import pytest

from iresearch_tpu.index.features import (
    Norm,
    Norm2,
    build_feature_columns,
    feature_column_name,
    get_feature,
    read_feature,
    register_feature,
    FeatureWriter,
)
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.store.directory import MemoryDirectory


def test_norm_encodings():
    n = Norm()
    vals = n.encode(np.array([1, 4, 9]))
    assert [n.decode(v) for v in vals] == pytest.approx([1.0, 0.5, 1 / 3])
    n2 = Norm2()
    small = n2.encode(np.array([3, 200]))
    assert all(len(v) == 1 for v in small)  # 1-byte encoding
    mid = n2.encode(np.array([3, 1000]))
    assert all(len(v) == 2 for v in mid)  # widens to 2 bytes
    big = n2.encode(np.array([3, 1 << 20]))
    assert all(len(v) == 4 for v in big)
    assert n2.decode(big[1]) == float(1 << 20)


def test_feature_columns_end_to_end():
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        w.insert([
            Field("body", "one two three", analyzer="segmentation",
                  feature_columns=("norm", "norm2")),
        ])
        w.insert([Field("other", "no features here", analyzer="segmentation")])
        w.insert([
            Field("body", "a b c d e f", analyzer="segmentation",
                  feature_columns=("norm2",)),
        ])
        w.commit()
    r = DirectoryReader.open(d)
    sr = r.segments[0]
    # per-(feature, field) columns exist and roundtrip through the format
    assert feature_column_name("norm2", "body") in sr.data.columns
    assert read_feature(sr, "norm2", "body", 0) == 3.0
    assert read_feature(sr, "norm2", "body", 2) == 6.0
    assert read_feature(sr, "norm2", "body", 1) is None  # doc lacks field
    assert read_feature(sr, "norm", "body", 0) == pytest.approx(1 / np.sqrt(3))
    assert read_feature(sr, "norm", "other", 0) is None  # never requested


def test_custom_feature_registration():
    class MaxPos(FeatureWriter):
        name = "maxpos"

        def encode(self, doc_lengths):
            return [int(v - 1).to_bytes(4, "little") for v in doc_lengths]

        def decode(self, value):
            return float(int.from_bytes(value, "little"))

    register_feature("maxpos", MaxPos)
    assert isinstance(get_feature("maxpos"), MaxPos)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        w.insert([
            Field("body", "x y z", analyzer="segmentation",
                  feature_columns=("maxpos",)),
        ])
        w.commit()
    r = DirectoryReader.open(d)
    assert read_feature(r.segments[0], "maxpos", "body", 0) == 2.0


def test_feature_columns_survive_merge():
    from iresearch_tpu.index.consolidate import consolidate_count

    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for s in range(2):
            for i in range(3):
                w.insert([
                    Field("body", " ".join(["w"] * (s * 3 + i + 1)),
                          analyzer="segmentation", feature_columns=("norm2",)),
                ])
            w.commit()
        assert w.consolidate(consolidate_count())
    r = DirectoryReader.open(d)
    assert len(r.segments) == 1
    got = [read_feature(r.segments[0], "norm2", "body", doc) for doc in range(6)]
    assert got == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
