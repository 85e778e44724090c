"""Scored-only multiterm execution (plan.py:_scored_only_ok).

With scored_terms_limit sampling, unscored terms contribute score 0; when
a scored term's df >= SCORED_ONLY_GUARD (and no deletes, positive
boosts), dropping the unscored band is exact for top-k <= GUARD. The
device result must still equal the exhaustive numpy oracle.
"""

import numpy as np
import pytest

from iresearch_tpu.exec import DeviceQuery
from iresearch_tpu.exec.plancache import clear_plan_cache
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.expand import expand_leaf
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory


def build(docs, deletes=()):
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, text in enumerate(docs):
            w.insert([
                Field("body", text, analyzer="segmentation"),
                Field("id", str(i), index=True),
            ])
        w.commit()
        for i in deletes:
            w.remove(F.ByTerm("id", str(i)))
        if deletes:
            w.commit()
    return DirectoryReader.open(d)


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(3)
    docs = []
    for i in range(400):
        toks = ["p_common"]  # df 400 >= guard 128
        # a rare band under the same prefix
        toks += [f"p_rare{int(x):03d}" for x in rng.integers(0, 50, size=3)]
        toks += [f"other{int(x)}" for x in rng.integers(0, 20, size=4)]
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    return build(docs)


def _cmp_topk(dev, orc, k):
    dv = [(int(d), float(v)) for v, d in zip(*dev) if np.isfinite(v)]
    assert [t[0] for t in orc[: len(dv)]] == [t[0] for t in dv]
    np.testing.assert_allclose(
        [t[1] for t in orc[: len(dv)]], [t[1] for t in dv], rtol=1e-5
    )


@pytest.mark.parametrize("scorer", [BM25(), TFIDF()])
def test_prefix_scored_only_exact(reader, scorer):
    clear_plan_cache()
    sr = reader.segments[0]
    flt = F.ByPrefix("body", "p_", scored_terms_limit=2)
    dq = DeviceQuery(flt, [sr], scorer)
    p = dq.plan(0)
    assert p.scored_only_kmax > 0  # guard active: unscored band dropped
    # the plan only carries the scored sample's spans
    spans = sum(g.real_rows or len(g.rows_d) for g in p.groups) + len(
        p.dense_spans
    )
    hq = HostQuery(flt, [sr], scorer)
    for k in (1, 5, 20):
        _cmp_topk(dq.execute_segment(0, k), hq.top_k(k), k)


def test_fallback_beyond_guard(reader):
    clear_plan_cache()
    sr = reader.segments[0]
    flt = F.ByPrefix("body", "p_", scored_terms_limit=2)
    dq = DeviceQuery(flt, [sr], BM25())
    p_so = dq.plan(0)
    assert p_so.scored_only_kmax > 0  # = max scored df
    p_full = dq.plan_for_k(0, p_so.scored_only_kmax + 1)  # beyond the bound
    assert p_full.scored_only_kmax == 0
    rows_full = sum(len(g.rows_d) for g in p_full.groups)
    rows_so = sum(len(g.rows_d) for g in p_so.groups)
    assert rows_full > rows_so or len(p_full.groups) > len(p_so.groups)


def test_deletes_disable_scored_only():
    rng = np.random.default_rng(5)
    docs = [
        " ".join(
            ["p_common"]
            + [f"p_r{int(x)}" for x in rng.integers(0, 30, size=2)]
        )
        for _ in range(300)
    ]
    r = build(docs, deletes=[7, 8])
    sr = r.segments[0]
    flt = F.ByPrefix("body", "p_", scored_terms_limit=1)
    dq = DeviceQuery(flt, [sr], BM25())
    assert dq.plan(0).scored_only_kmax == 0
    hq = HostQuery(flt, [sr], BM25())
    _cmp_topk(dq.execute_segment(0, 10), hq.top_k(10), 10)


def test_low_df_disables_guard():
    docs = [f"q_a{i % 40} filler" for i in range(200)]  # all dfs ~5 < 128
    r = build(docs)
    sr = r.segments[0]
    flt = F.ByPrefix("body", "q_", scored_terms_limit=3)
    dq = DeviceQuery(flt, [sr], BM25())
    assert dq.plan(0).scored_only_kmax == 0
    hq = HostQuery(flt, [sr], BM25())
    _cmp_topk(dq.execute_segment(0, 10), hq.top_k(10), 10)


def test_vectorized_sampling_matches_reference_order(reader):
    """_expand_ranges must pick exactly the (df, visit-order) top sample
    the TermHit-path _sample() picks."""
    sr = reader.segments[0]
    flt = F.ByPrefix("body", "p_", scored_terms_limit=7)
    exp = expand_leaf(flt, [sr])
    lo, hi = sr.term_prefix_range("body", b"p_")
    fp = sr.field("body")
    dfs = fp.entries[lo:hi, 0].astype(np.int64)
    order = sorted(
        range(hi - lo), key=lambda i: (dfs[i], i), reverse=True
    )
    expected = sorted(lo + i for i in order[:7])
    assert sorted(h.tid for h in exp.scored) == expected
    # unscored band = the complement, as one array
    un = exp.unscored_tids[0]
    assert sorted(un) == sorted(set(range(lo, hi)) - set(expected))
    assert not exp.unscored


def test_or_collapse_scored_only(reader):
    clear_plan_cache()
    sr = reader.segments[0]
    flt = F.Or(
        F.ByTerm("body", "p_common"),
        F.ByPrefix("body", "p_rare", scored_terms_limit=2),
    )
    dq = DeviceQuery(flt, [sr], BM25())
    assert dq.plan(0).scored_only_kmax > 0
    hq = HostQuery(flt, [sr], BM25())
    _cmp_topk(dq.execute_segment(0, 10), hq.top_k(10), 10)


def test_conjunction_never_scored_only(reader):
    clear_plan_cache()
    sr = reader.segments[0]
    flt = F.And(
        F.ByTerm("body", "other3"),
        F.ByPrefix("body", "p_", scored_terms_limit=1),
    )
    dq = DeviceQuery(flt, [sr], BM25())
    # dropping unscored spans of the prefix leaf would lose conjunction
    # matches that carry positive score from the other leaf
    assert dq.plan(0).scored_only_kmax == 0
    hq = HostQuery(flt, [sr], BM25())
    _cmp_topk(dq.execute_segment(0, 10), hq.top_k(10), 10)
