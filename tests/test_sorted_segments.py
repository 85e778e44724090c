"""Primary-sort (sorted segments) tests.

Reference analog: tests/index/sorted_index_tests.cpp — docs within a
segment ordered by the comparator; queries unaffected; consolidation
preserves the order.
"""

import numpy as np
import pytest

from iresearch_tpu.index.consolidate import consolidate_count
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import (
    Field,
    IndexWriter,
    IndexWriterOptions,
    SortSpec,
)
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import search
from iresearch_tpu.store.directory import MemoryDirectory


def int_key(b: bytes) -> int:
    return int.from_bytes(b, "little", signed=True)


def make_opts(**kw):
    return IndexWriterOptions(
        invert_backend="numpy",
        sort=SortSpec("price", key=int_key, **kw),
    )


def stored_prices(reader):
    out = []
    for s, sr in enumerate(reader.segments):
        col = sr.column("price")
        for d in range(sr.num_docs):
            v = col.get(d)
            out.append(None if v is None else int_key(v))
    return out


def build(opts, prices, segment_breaks=()):
    d = MemoryDirectory()
    with IndexWriter(d, opts) as w:
        for i, p in enumerate(prices):
            fields = [
                Field("body", f"item number{i} common", analyzer="segmentation"),
                Field("id", str(i), index=True, store=True),
            ]
            if p is not None:
                fields.append(Field("price", int(p), index=False, store=True))
            w.insert(fields)
            if i in segment_breaks:
                w.commit()
        w.commit()
    return d


def test_flush_orders_docs():
    prices = [50, 10, None, 30, 20, 40]
    d = build(make_opts(), prices)
    r = DirectoryReader.open(d)
    assert stored_prices(r) == [10, 20, 30, 40, 50, None]


def test_descending_missing_last():
    prices = [50, 10, None, 30]
    d = build(make_opts(descending=True), prices)
    r = DirectoryReader.open(d)
    assert stored_prices(r) == [50, 30, 10, None]


def test_queries_consistent_after_sort():
    rng = np.random.default_rng(4)
    prices = rng.integers(0, 1000, 100).tolist()
    sorted_dir = build(make_opts(), prices)
    plain_dir = build(IndexWriterOptions(invert_backend="numpy"), prices)
    rs = DirectoryReader.open(sorted_dir)
    rp = DirectoryReader.open(plain_dir)
    hs = search(rs, F.ByTerm("body", "number42"), k=5)
    hp = search(rp, F.ByTerm("body", "number42"), k=5)
    assert len(hs) == len(hp) == 1
    assert hs[0][1] == pytest.approx(hp[0][1])
    # the hit maps back to the same stored id
    assert rs.stored(hs[0][0], "id") == rp.stored(hp[0][0], "id") == b"42"


def test_consolidation_preserves_sort():
    prices = [50, 10, 30, 20, 40, 5, 45, 25]
    d = build(make_opts(), prices, segment_breaks=(2, 5))
    r = DirectoryReader.open(d)
    assert len(r.segments) == 3
    with IndexWriter(d, make_opts()) as w:
        assert w.consolidate(consolidate_count(1))
        w.commit()
    r2 = DirectoryReader.open(d)
    assert len(r2.segments) == 1
    got = stored_prices(r2)
    assert got == sorted(prices)


def test_sort_with_deletes_then_merge():
    prices = [50, 10, 30, 20]
    d = build(make_opts(), prices, segment_breaks=(1,))  # two segments
    with IndexWriter(d, make_opts()) as w:
        w.remove(F.ByTerm("id", "2"))  # price 30
        w.commit()
        assert w.consolidate(consolidate_count(1))
        w.commit()
    r = DirectoryReader.open(d)
    assert len(r.segments) == 1
    assert stored_prices(r) == [10, 20, 50]
