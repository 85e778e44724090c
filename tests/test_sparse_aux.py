"""Sparse aux injection + device BySamePosition (VERDICT r2 item 6).

Host-aux leaves (ByNested, ByNgramSimilarity, ByColumnExistence, ...)
must never upload [A, nd] dense arrays: the device inputs carry only the
match docs and their scores; results stay oracle-exact. BySamePosition
of plain terms executes on device like a phrase with offsets 0.
"""

import numpy as np
import pytest

from iresearch_tpu.exec import DeviceQuery
from iresearch_tpu.exec.batch import QueryBatch
from iresearch_tpu.exec.plancache import clear_plan_cache
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MemoryDirectory


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(9)
    d = MemoryDirectory()
    words = ["sun", "moon", "star", "rain", "wind", "snow"]
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(300):
            body = " ".join(
                words[int(x)] for x in rng.integers(0, len(words), size=8)
            )
            title = " ".join(
                words[int(x)] for x in rng.integers(0, len(words), size=3)
            )
            w.insert([
                Field("body", body, analyzer="segmentation"),
                Field("title", title, analyzer="segmentation"),
            ])
        w.commit()
    return DirectoryReader.open(d)


def _cmp(dev, orc):
    dv = [(int(d), float(v)) for v, d in zip(*dev) if np.isfinite(v)]
    assert [t[0] for t in orc[: len(dv)]] == [t[0] for t in dv], (orc[:4], dv[:4])
    np.testing.assert_allclose(
        [t[1] for t in orc[: len(dv)]], [t[1] for t in dv], rtol=1e-5
    )


def test_same_position_device_executed(reader):
    clear_plan_cache()
    sr = reader.segments[0]
    flt = F.BySamePosition([("body", "sun"), ("body", "rain")])
    dq = DeviceQuery(flt, [sr], BM25())
    p = dq.plan(0)
    assert p.device_aux, "same-position must compile to the device kernel"
    _cmp(dq.execute_segment(0, 10), HostQuery(flt, [sr], BM25()).top_k(10))


def test_same_position_cross_field(reader):
    clear_plan_cache()
    sr = reader.segments[0]
    flt = F.BySamePosition([("body", "sun"), ("title", "moon")])
    dq = DeviceQuery(flt, [sr], BM25())
    assert dq.plan(0).device_aux
    _cmp(dq.execute_segment(0, 10), HostQuery(flt, [sr], BM25()).top_k(10))


def test_ngram_aux_is_sparse_upload(reader):
    """The ngram-similarity aux leaf ships only (docs, scores)."""
    clear_plan_cache()
    sr = reader.segments[0]
    flt = F.And(
        F.ByTerm("body", "sun"),
        F.ByNgramSimilarity("body", ["sun", "rain"], threshold=0.5),
    )
    dq = DeviceQuery(flt, [sr], BM25())
    _cmp(dq.execute_segment(0, 10), HostQuery(flt, [sr], BM25()).top_k(10))
    # batched path too (sparse stacking)
    qb = QueryBatch([flt, F.ByTerm("body", "wind")], [sr], BM25())
    res = qb.execute_segment(0, 10)
    _cmp(res[0], HostQuery(flt, [sr], BM25()).top_k(10))


def test_nested_aux_sparse(reader):
    clear_plan_cache()
    sr = reader.segments[0]
    # parent = docs with title "sun"; child = docs with body "rain"
    flt = F.ByNested(
        parent=F.ByTerm("title", "sun"), child=F.ByTerm("body", "rain")
    )
    dq = DeviceQuery(flt, [sr], BM25())
    _cmp(dq.execute_segment(0, 10), HostQuery(flt, [sr], BM25()).top_k(10))
