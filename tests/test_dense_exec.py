"""Dense-grid span execution (plan.DenseSpan + executor stream path).

Exactness gate for the high-df tier: the grid-order cache must produce
bit-equal match sets and rtol-equal scores to the host oracle — single
query, WAND pruned, and batched — and the plan must actually be using
dense spans (otherwise these tests silently degrade to the sparse path).
"""

import math

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory

WORDS = [
    "hot0", "hot1", "hot2", "warm0", "warm1", "mid0", "mid1", "mid2",
    "cool0", "cool1", "rare0", "rare1", "rare2", "rare3", "rare4",
]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(11)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(400):
            n = int(rng.integers(4, 20))
            idx = np.minimum(rng.zipf(1.3, size=n) - 1, len(WORDS) - 1)
            text = " ".join(WORDS[j] for j in idx)
            # guaranteed-sparse terms (df ~4-8, below the nd/16 dense bar)
            if i % 97 == 0:
                text += " zrare0"
            if i % 89 == 3:
                text += " zrare1"
            w.insert([
                Field("body", text, analyzer="segmentation"),
                Field("id", str(i), index=True, store=True),
            ])
        w.commit()
        w.remove(F.ByTerm("id", "13"))
        w.remove(F.ByTerm("id", "250"))
        w.commit()
    return DirectoryReader.open(d)


def _dense_terms(reader):
    sr = reader.segments[0]
    cache = sr.dense_cache("body")
    assert cache is not None and cache.spans, "fixture must have dense terms"
    tl = sr.terms("body")
    return [tl[t].decode() for t in sorted(cache.spans)]


def _sparse_terms(reader):
    """Terms present in the segment but NOT in the dense cache."""
    sr = reader.segments[0]
    cache = sr.dense_cache("body")
    tl = sr.terms("body")
    out = [
        tl[t].decode() for t in range(len(tl)) if t not in cache.spans
    ]
    assert out, "fixture must have sparse terms"
    return out


def _check(reader, flt, scorer, wand=False, want_dense=True):
    from iresearch_tpu.exec import DeviceQuery

    q = HostQuery(flt, list(reader.segments), scorer)
    dq = DeviceQuery(flt, list(reader.segments), scorer, wand=wand)
    used_dense = False
    for s in range(len(reader.segments)):
        hr = q.execute(s)
        plan = dq.plan(s)
        used_dense = used_dense or bool(plan.dense_spans)
        nmatch = int(hr.match.sum())
        k = min(plan.nd_pad, max(16, nmatch + 4))
        vals, docs = dq.execute_segment(s, k)
        got = {
            int(dd): float(v)
            for v, dd in zip(vals, docs)
            if not (math.isinf(v) and v < 0)
        }
        if wand:
            # WAND is top-k only: every returned doc must be a true match
            # with the oracle score, and the top ranks must agree
            for dd, v in got.items():
                assert hr.match[dd]
                assert v == pytest.approx(float(hr.score[dd]), rel=1e-5, abs=1e-6)
        else:
            want = set(np.flatnonzero(hr.match).tolist())
            assert set(got) == want
            for dd in want:
                assert got[dd] == pytest.approx(
                    float(hr.score[dd]), rel=1e-5, abs=1e-6
                )
    if want_dense:
        assert used_dense, "plan did not engage the dense-grid tier"


def test_fixture_has_dense_terms(reader):
    terms = _dense_terms(reader)
    assert "hot0" in terms


@pytest.mark.parametrize("scorer", [BM25(), TFIDF()], ids=["bm25", "tfidf"])
def test_single_dense_term(reader, scorer):
    _check(reader, F.ByTerm("body", _dense_terms(reader)[0]), scorer)


def test_or_dense_dense(reader):
    t = _dense_terms(reader)
    _check(reader, F.Or(F.ByTerm("body", t[0]), F.ByTerm("body", t[1])), BM25())


def test_or_dense_sparse(reader):
    t = _dense_terms(reader)[0]
    _check(reader, F.Or(F.ByTerm("body", t), F.ByTerm("body", "rare3")), BM25())


def test_or_min_match_with_dense(reader):
    t = _dense_terms(reader)
    flt = F.Or(
        F.ByTerm("body", t[0]),
        F.ByTerm("body", t[1]),
        F.ByTerm("body", "rare1"),
        min_match=2,
    )
    _check(reader, flt, BM25())


def test_not_dense_term(reader):
    # And with a sparse driver picks the join tier (driver=mid0), which
    # probes the hot span without its grid rep — exactness still holds
    t = _dense_terms(reader)[0]
    flt = F.And(F.ByTerm("body", "mid0"), F.Not(F.ByTerm("body", t)))
    _check(reader, flt, BM25(), want_dense=False)


def test_not_dense_term_dense_mode(reader):
    # Or with min_match=0-style coverage gap forces the dense tier; the
    # Not child's dense span must stream on the grid there
    t = _dense_terms(reader)[0]
    flt = F.Or(F.ByTerm("body", "mid0"), F.Not(F.ByTerm("body", t)))
    _check(reader, flt, BM25())


def test_wand_or_dense(reader):
    t = _dense_terms(reader)
    _check(
        reader,
        F.Or(F.ByTerm("body", t[0]), F.ByTerm("body", t[1])),
        BM25(),
        wand=True,
    )


def test_wand_topk_order_dense(reader):
    from iresearch_tpu.exec import DeviceQuery

    from tests.topk_util import assert_topk_equiv

    t = _dense_terms(reader)
    flt = F.Or(F.ByTerm("body", t[0]), F.ByTerm("body", t[1]))
    hq = HostQuery(flt, list(reader.segments), BM25())
    want = hq.top_k(10)
    got = DeviceQuery(flt, list(reader.segments), BM25(), wand=True).top_k(10)
    assert_topk_equiv(got, want)


def test_batched_mixed_dense(reader):
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.exec.batch import QueryBatch

    t = _dense_terms(reader)
    filters = [
        F.ByTerm("body", t[0]),
        F.ByTerm("body", t[1]),
        F.Or(F.ByTerm("body", t[0]), F.ByTerm("body", t[1])),
        F.Or(F.ByTerm("body", t[0]), F.ByTerm("body", "rare2")),
        F.ByTerm("body", "rare0"),
    ]
    qb = QueryBatch(filters, list(reader.segments), BM25(), wand=True)
    res = qb.search(k=8)
    for flt, got in zip(filters, res):
        dq = DeviceQuery(flt, list(reader.segments), BM25())
        want = dq.top_k(8)
        from tests.topk_util import assert_topk_equiv

        assert_topk_equiv(got, want)


def test_join_probes_dense(reader):
    """And(sparse driver, dense) takes the join tier with the dense span
    probed per candidate lane (single-word gathers)."""
    from iresearch_tpu.exec import DeviceQuery

    t = _dense_terms(reader)[0]
    sp = _sparse_terms(reader)[0]
    flt = F.And(F.ByTerm("body", sp), F.ByTerm("body", t))
    dq = DeviceQuery(flt, list(reader.segments), BM25())
    p = dq.plan(0)
    assert p.exec_mode == "join" and len(p.dense_spans) == 1, (
        p.exec_mode, len(p.dense_spans)
    )
    _check(reader, flt, BM25())


def test_join_cross_field_dense(reader):
    """A join whose dense span lives in a DIFFERENT field than the driver
    must gather the span's own norms (dl is per-(doc, field)), not reuse
    the driver's decoded doc lengths (ADVICE r2 high)."""
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.exec.batch import QueryBatch

    from tests.topk_util import assert_topk_equiv

    t = _dense_terms(reader)[0]
    hq = HostQuery(F.ByTerm("body", t), list(reader.segments), BM25())
    hits = np.flatnonzero(hq.execute(0).match)
    assert len(hits), "fixture must have a hot-term hit"
    # ids are insertion-order strings; the id field's dl is 1 for every
    # doc while body dls vary, so a wrongly reused driver dl skews BM25
    flt = F.And(F.ByTerm("id", str(int(hits[0]))), F.ByTerm("body", t))
    dq = DeviceQuery(flt, list(reader.segments), BM25())
    p = dq.plan(0)
    assert p.exec_mode == "join" and len(p.dense_spans) == 1, (
        p.exec_mode, len(p.dense_spans)
    )
    _check(reader, flt, BM25())
    # the batched path builds its own dense_static — check it too
    qb = QueryBatch([flt], list(reader.segments), BM25())
    want = HostQuery(flt, list(reader.segments), BM25()).top_k(8)
    assert_topk_equiv(qb.search(k=8)[0], want)


def test_gridmix_mixed_or(reader):
    """Or(dense, sparse) takes the dual-view gridmix tier."""
    from iresearch_tpu.exec import DeviceQuery

    t = _dense_terms(reader)[0]
    sp = _sparse_terms(reader)[0]
    flt = F.Or(F.ByTerm("body", t), F.ByTerm("body", sp))
    dq = DeviceQuery(flt, list(reader.segments), BM25())
    p = dq.plan(0)
    assert p.exec_mode == "gridmix" and len(p.dense_spans) == 1, (
        p.exec_mode, len(p.dense_spans)
    )
    _check(reader, flt, BM25())


def test_gridmix_collapsed_terms(reader):
    """ByTerms mixing dense and sparse terms collapses into one leaf and
    runs gridmix (the Fuzzy/Prefix expansion shape)."""
    t = _dense_terms(reader)
    sp = _sparse_terms(reader)
    flt = F.ByTerms(
        "body",
        [(t[0], 1.0), (t[1], 2.0), (sp[0], 1.0), (sp[-1], 1.5)],
    )
    _check(reader, flt, BM25())


def test_gridmix_min_match_mixed(reader):
    t = _dense_terms(reader)
    sp = _sparse_terms(reader)
    flt = F.Or(
        F.ByTerm("body", t[0]),
        F.ByTerm("body", "mid2"),
        F.ByTerm("body", sp[0]),
        min_match=2,
    )
    _check(reader, flt, BM25())


def test_gridmix_and_fallback(reader):
    """And with multiple sparse spans per leaf (no single-span driver)
    still evaluates exactly whatever tier is picked."""
    t = _dense_terms(reader)
    flt = F.And(
        F.Or(F.ByTerm("body", t[0]), F.ByTerm("body", "mid0")),
        F.Or(F.ByTerm("body", t[1]), F.ByTerm("body", "cool1")),
    )
    _check(reader, flt, BM25())


def test_dense_disabled_env_matches(reader, monkeypatch):
    """IRS_DENSE_TERMS=0 must give identical results (pure acceleration)."""
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.exec import plan as plan_mod

    t = _dense_terms(reader)
    flt = F.Or(F.ByTerm("body", t[0]), F.ByTerm("body", "mid1"))
    on = DeviceQuery(flt, list(reader.segments), BM25()).top_k(10)
    monkeypatch.setattr(plan_mod, "USE_DENSE_TERMS", False)
    off = DeviceQuery(flt, list(reader.segments), BM25()).top_k(10)
    assert [d for d, _ in on] == [d for d, _ in off]
    for (da, sa), (db, sb) in zip(on, off):
        assert sa == pytest.approx(sb, rel=1e-6)


def test_batched_and_dense_scan_conj(reader):
    """Batched conjunctive fused scan (ADVICE r3 #4): QueryBatch over
    And(dense, dense) trees must take the scan_conj=True rescore (fagg
    via minimum) and agree with the per-query device path exactly."""
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.exec.batch import QueryBatch
    from iresearch_tpu.exec.executor import scan_shape
    from tests.topk_util import assert_topk_equiv

    t = _dense_terms(reader)
    assert len(t) >= 3, "fixture must expose >=3 dense terms"
    filters = [
        F.And(F.ByTerm("body", t[0]), F.ByTerm("body", t[1])),
        F.And(F.ByTerm("body", t[1]), F.ByTerm("body", t[2])),
    ]
    # the plans really are the conjunctive fused-scan shape — otherwise
    # this test silently exercises some other tier
    for flt in filters:
        p = DeviceQuery(flt, list(reader.segments), BM25()).plan(0)
        assert scan_shape(p) == "and", (flt, p.exec_mode, p.tree)
    qb = QueryBatch(filters, list(reader.segments), BM25())
    res = qb.search(k=10)
    for flt, got in zip(filters, res):
        want = DeviceQuery(flt, list(reader.segments), BM25()).top_k(10)
        assert_topk_equiv(got, want)
        hq = HostQuery(flt, list(reader.segments), BM25())
        assert_topk_equiv(got, hq.top_k(10))
