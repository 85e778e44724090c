"""Prepared-plan cache (exec/plancache.py): hit semantics + correctness.

The serving path creates fresh filter objects per request; the cache must
return the identical compiled plan for value-equal filters on the same
reader, keep WAND/non-WAND entries separate, skip Proxy, and never serve
a plan across different segment lists (index-wide stats differ).
"""

import numpy as np
import pytest

from iresearch_tpu.exec import DeviceQuery
from iresearch_tpu.exec.plancache import (
    _CACHE,
    clear_plan_cache,
    plan_cache_info,
)
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MemoryDirectory


def build_segment(docs):
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for text in docs:
            w.insert([Field("body", text, analyzer="segmentation")])
        w.commit()
    return DirectoryReader.open(d).segments[0]


@pytest.fixture
def seg(rng):
    docs = [
        " ".join(rng.choice(["aa", "bb", "cc", "dd", "ee"], size=12))
        for _ in range(300)
    ]
    return build_segment(docs)


def test_value_equal_filters_share_plan(seg):
    clear_plan_cache()
    q1 = DeviceQuery(F.ByTerm("body", "aa"), [seg], BM25())
    p1 = q1.plan(0)
    q2 = DeviceQuery(F.ByTerm("body", "aa"), [seg], BM25())
    p2 = q2.plan(0)
    assert p1 is p2
    # a different term is a different entry
    p3 = DeviceQuery(F.ByTerm("body", "bb"), [seg], BM25()).plan(0)
    assert p3 is not p1


def test_wand_flag_separates_entries(seg):
    clear_plan_cache()
    flt = F.Or(F.ByTerm("body", "aa"), F.ByTerm("body", "bb"))
    p_plain = DeviceQuery(flt, [seg], BM25(), wand=False).plan(0)
    p_wand = DeviceQuery(flt, [seg], BM25(), wand=True).plan(0)
    assert p_plain is not p_wand


def test_results_identical_across_instances(seg):
    clear_plan_cache()
    flt = F.And(F.ByTerm("body", "aa"), F.ByTerm("body", "cc"))
    v1, d1 = DeviceQuery(flt, [seg], BM25()).execute_segment(0, 10)
    v2, d2 = DeviceQuery(flt, [seg], BM25()).execute_segment(0, 10)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(v1, v2)
    # and vs the oracle
    hq = HostQuery(flt, [seg], BM25())
    top = hq.top_k(10)
    dev = [(int(d), float(v)) for v, d in zip(v1, d1) if np.isfinite(v)]
    assert [t[0] for t in top] == [t[0] for t in dev]
    np.testing.assert_allclose(
        [t[1] for t in top], [t[1] for t in dev], rtol=1e-5
    )


def test_proxy_not_cached(seg):
    clear_plan_cache()
    flt = F.Proxy(F.ByTerm("body", "aa"))
    DeviceQuery(flt, [seg], BM25()).plan(0)
    n, _mx = plan_cache_info()
    assert n == 0


def test_segment_list_identity_in_key(seg, rng):
    clear_plan_cache()
    docs = [" ".join(rng.choice(["aa", "ff"], size=6)) for _ in range(100)]
    seg2 = build_segment(docs)
    flt = F.ByTerm("body", "aa")
    p_single = DeviceQuery(flt, [seg], BM25()).plan(0)
    p_multi = DeviceQuery(flt, [seg, seg2], BM25()).plan(0)
    # same segment, same seg_idx — but index-wide idf differs
    assert p_single is not p_multi
    w_single = _weight_of(p_single)
    w_multi = _weight_of(p_multi)
    assert w_single != w_multi


def _weight_of(plan):
    if plan.groups:
        return float(plan.groups[0].weight[0])
    return float(plan.dense_spans[0].w)


def test_eviction_bound(seg, monkeypatch):
    import iresearch_tpu.exec.plancache as pc

    clear_plan_cache()
    monkeypatch.setattr(pc, "_CACHE_MAX", 4)
    terms = ["aa", "bb", "cc", "dd", "ee"]
    for t in terms:
        DeviceQuery(F.ByTerm("body", t), [seg], BM25()).plan(0)
    n, _ = plan_cache_info()
    assert n <= 4


def test_lazy_expansion_skipped_on_hit(seg):
    clear_plan_cache()
    flt1 = F.ByTerm("body", "aa")
    DeviceQuery(flt1, [seg], BM25()).plan(0)
    flt2 = F.ByTerm("body", "aa")
    q2 = DeviceQuery(flt2, [seg], BM25())
    q2.plan(0)
    # the second instance never expanded its leaf (plan came from cache)
    assert not q2.prepared._expansions._done
    # but the oracle path still works on demand (lazy expansion)
    r = q2.prepared.execute(0)
    assert r.match.any()
