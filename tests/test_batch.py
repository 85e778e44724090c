"""Batched execution must equal per-query device execution exactly."""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MemoryDirectory

WORDS = ["one", "two", "three", "four", "five", "six", "seven", "eight", "nine", "ten"]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(5)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(200):
            n = int(rng.integers(2, 15))
            idx = np.minimum(rng.zipf(1.6, size=n) - 1, len(WORDS) - 1)
            w.insert([Field("body", " ".join(WORDS[j] for j in idx), analyzer="segmentation")])
            if i == 120:
                w.commit()  # two segments
        w.commit()
    return DirectoryReader.open(d)


def test_batch_wand_equals_exact(reader):
    """Batched WAND (vmapped per-query θ) == exact batched execution."""
    from iresearch_tpu.exec.batch import QueryBatch
    from tests.topk_util import assert_topk_equiv

    filters = (
        [F.ByTerm("body", w) for w in WORDS[:4]]
        + [F.Or(F.ByTerm("body", "one"), F.ByTerm("body", "two"))]
        + [F.And(F.ByTerm("body", "one"), F.ByTerm("body", "three"))]
    )
    segs = list(reader.segments)
    exact = QueryBatch(filters, segs, BM25()).search(8)
    wand = QueryBatch(filters, segs, BM25(), wand=True, wand_sample=4).search(8)
    for e, g in zip(exact, wand):
        assert_topk_equiv(g, e)


def test_batch_multisegment_search(reader):
    """QueryBatch.search == per-query host search over the whole index."""
    from iresearch_tpu.exec.batch import QueryBatch
    from iresearch_tpu.search.host_eval import search as search_host
    from tests.topk_util import assert_topk_equiv

    filters = [F.ByTerm("body", w) for w in WORDS[:5]] + [
        F.Or(F.ByTerm("body", "one"), F.ByTerm("body", "nine"))
    ]
    qb = QueryBatch(filters, list(reader.segments), BM25())
    got = qb.search(7)
    for flt, g in zip(filters, got):
        want = search_host(reader, flt, BM25(), k=7)
        assert_topk_equiv(g, want)


def test_batch_equals_individual(reader):
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.exec.batch import QueryBatch

    filters = (
        [F.ByTerm("body", w) for w in WORDS]
        + [F.And(F.ByTerm("body", "one"), F.ByTerm("body", "two"))]
        + [F.Or(F.ByTerm("body", a), F.ByTerm("body", b)) for a, b in zip(WORDS, WORDS[1:])]
        + [F.ByTerms("body", [("one", 1.0), ("two", 1.0), ("ten", 1.0)], min_match=2)]
        + [F.ByPhrase("body", ["one", "two"])]
    )
    segs = list(reader.segments)
    qb = QueryBatch(filters, segs, BM25())
    batched = qb.execute_segment(0, 10)
    assert len(batched) == len(filters)
    for flt, (bv, bd) in zip(filters, batched):
        dq = DeviceQuery(flt, segs, BM25())
        vals, docs = dq.execute_segment(0, 10)
        np.testing.assert_allclose(bv, vals, rtol=1e-6)
        finite = np.isfinite(vals)
        np.testing.assert_array_equal(bd[finite], docs[finite])
