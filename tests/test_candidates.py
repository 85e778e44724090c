"""Scale-proportional executor tiers (exec/candidates.py) vs the oracle.

The default thresholds only engage the direct/join/sort tiers when the
postings are small relative to the corpus; these tests force the
thresholds so every covering tree takes a candidate tier even on the
small test corpus, then demand oracle-exact results (the same gate as the
dense executor's fuzzer).
"""

import math

import numpy as np
import pytest

import iresearch_tpu.exec.plan as planmod
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory

WORDS = [f"t{i:02d}" for i in range(30)]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(31)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(800):
            n = int(rng.integers(2, 24))
            idx = np.minimum(rng.zipf(1.4, size=n) - 1, len(WORDS) - 1)
            w.insert([
                Field("body", " ".join(WORDS[j] for j in idx), analyzer="segmentation"),
                Field("id", str(i), index=True, store=True),
            ])
        w.commit()
        w.remove(F.ByTerm("id", "13"))
        w.remove(F.ByTerm("id", "400"))
        w.commit()
    return DirectoryReader.open(d)


@pytest.fixture()
def forced_tiers(monkeypatch):
    monkeypatch.setattr(planmod, "SORT_MAX_RATIO", 1e9)
    monkeypatch.setattr(planmod, "JOIN_MAX_RATIO", 1e9)
    # these tests pin specific candidate tiers; the dense-grid cache would
    # otherwise steal high-df spans into the dense tier (tested separately
    # in test_dense_exec.py)
    monkeypatch.setattr(planmod, "USE_DENSE_TERMS", False)


def _check(reader, flt, scorer, wand=False, expect_mode=None):
    from iresearch_tpu.exec import DeviceQuery

    segs = list(reader.segments)
    hq = HostQuery(flt, segs, scorer)
    dq = DeviceQuery(flt, segs, scorer, wand=wand)
    for s in range(len(segs)):
        p = dq.plan(s)
        if expect_mode is not None:
            assert p.exec_mode == expect_mode, (flt, p.exec_mode)
        hr = hq.execute(s)
        nmatch = int(hr.match.sum())
        k = min(p.nd_pad, max(16, nmatch + 4))
        vals, docs = dq.execute_segment(s, k)
        got = {int(d): float(v) for v, d in zip(vals, docs)
               if not (math.isinf(v) and v < 0)}
        want = set(np.flatnonzero(hr.match).tolist())
        assert set(got) == want, (flt, s, p.exec_mode)
        for d in want:
            assert got[d] == pytest.approx(
                float(hr.score[d]), rel=1e-4, abs=1e-5
            ), (flt, s, d, p.exec_mode)


def test_mode_selection(reader, forced_tiers):
    from iresearch_tpu.exec import DeviceQuery

    segs = list(reader.segments)
    cases = [
        (F.ByTerm("body", "t00"), "dslice"),
        (F.Or(F.ByTerm("body", "t00"), F.ByTerm("body", "t03")), "sort"),
        (F.And(F.ByTerm("body", "t00"), F.ByTerm("body", "t05")), "join"),
        # Not at root can match entry-less docs: must stay dense
        (F.Not(F.ByTerm("body", "t00")), "dense"),
        (F.Or(F.ByTerm("body", "t00"), F.All()), "dense"),
        # aux leaf: dense
        (F.And(F.ByTerm("body", "t00"), F.ByPhrase("body", ["t01", "t02"])), "dense"),
    ]
    for flt, mode in cases:
        dq = DeviceQuery(flt, segs)
        assert dq.plan(0).exec_mode == mode, (flt, dq.plan(0).exec_mode)


@pytest.mark.parametrize("scorer", [BM25(), TFIDF()], ids=["bm25", "tfidf"])
def test_direct_tier(reader, forced_tiers, scorer):
    _check(reader, F.ByTerm("body", "t00"), scorer, expect_mode="dslice")
    _check(reader, F.ByTerm("body", "t17"), scorer, expect_mode="dslice")


@pytest.mark.parametrize("wand", [False, True], ids=["plain", "wand"])
def test_direct_tier_wand(reader, forced_tiers, wand):
    _check(reader, F.ByTerm("body", "t00"), BM25(), wand=wand, expect_mode="dslice")


def test_join_tier(reader, forced_tiers):
    _check(
        reader,
        F.And(F.ByTerm("body", "t00"), F.ByTerm("body", "t04")),
        BM25(),
        expect_mode="join",
    )
    # nested Or collapses to a merged multi-span leaf: joiner, not driver
    _check(
        reader,
        F.And(
            F.Or(F.ByTerm("body", "t01"), F.ByTerm("body", "t06")),
            F.ByTerm("body", "t03"),
        ),
        BM25(),
        expect_mode="join",
    )
    # And with a Not child (exclusion is exact on candidates)
    _check(
        reader,
        F.And(F.ByTerm("body", "t02"), F.Not(F.ByTerm("body", "t00"))),
        BM25(),
        expect_mode="join",
    )


def test_sort_tier(reader, forced_tiers):
    # disjunctions and driver-less conjunctions take the sort tier
    _check(
        reader,
        F.Or(F.ByTerm("body", "t00"), F.ByTerm("body", "t01"), min_match=2),
        BM25(),
        expect_mode="sort",
    )
    _check(
        reader,
        F.And(
            F.Or(F.ByTerm("body", "t00"), F.ByTerm("body", "t04")),
            F.Or(F.ByTerm("body", "t02"), F.ByTerm("body", "t06")),
        ),
        BM25(),
        expect_mode="sort",
    )
    _check(
        reader,
        F.Or(
            F.ByTerms("body", [("t00", 1.0), ("t05", 2.0)]),
            F.ByPrefix("body", "t1", scored_terms_limit=5),
            min_match=1,
            merge="max",
        ),
        BM25(),
        expect_mode="sort",
    )


@pytest.mark.parametrize("wand", [False, True], ids=["plain", "wand"])
def test_sort_tier_wand(reader, forced_tiers, wand):
    # min_match=1 Or collapses into ONE merged leaf with multiple spans:
    # the sort tier (duplicate docs across spans combine via the
    # segmented scan), with WAND optional
    _check(
        reader,
        F.Or(F.ByTerm("body", "t00"), F.ByTerm("body", "t01"),
             F.ByTerm("body", "t07")),
        BM25(),
        wand=wand,
        expect_mode="sort",
    )


def test_deletes_respected(reader, forced_tiers):
    """Deleted docs (alive mask) must be excluded by every tier."""
    from iresearch_tpu.exec import DeviceQuery

    segs = list(reader.segments)
    # doc ids 13 and 400 were removed in the fixture
    for flt in [
        F.ByTerm("body", "t00"),
        F.And(F.ByTerm("body", "t00"), F.ByTerm("body", "t01")),
        F.Or(F.ByTerm("body", "t00"), F.ByTerm("body", "t02")),
    ]:
        dq = DeviceQuery(flt, segs)
        vals, docs = dq.execute_segment(0, segs[0].num_docs)
        got = {int(d) for v, d in zip(vals, docs) if not (math.isinf(v) and v < 0)}
        assert 13 not in got and 400 not in got


def test_fuzz_tiers(reader, forced_tiers):
    """Random positive trees under forced tiers stay oracle-exact."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_fuzz_queries import random_tree

    n_tiered = 0
    from iresearch_tpu.exec import DeviceQuery

    for seed in range(8):
        rng = np.random.default_rng(1000 + seed)
        flt = random_tree(rng)
        dq = DeviceQuery(flt, list(reader.segments))
        if dq.plan(0).exec_mode != "dense":
            n_tiered += 1
        _check(reader, flt, BM25())
    assert n_tiered >= 3, "fuzz should exercise candidate tiers"


def test_batch_uses_tiers(reader, forced_tiers):
    """QueryBatch must produce identical results through candidate tiers."""
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.exec.batch import QueryBatch

    filters = [
        F.ByTerm("body", "t00"),
        F.ByTerm("body", "t09"),
        F.And(F.ByTerm("body", "t00"), F.ByTerm("body", "t04")),
        F.Or(F.ByTerm("body", "t01"), F.ByTerm("body", "t05"), min_match=2),
    ]
    segs = list(reader.segments)
    qb = QueryBatch(filters, segs, BM25(), wand=True)
    res = qb.execute_segment(0, 12)
    for flt, (bv, bd) in zip(filters, res):
        dq = DeviceQuery(flt, segs, BM25(), wand=True)
        sv, sd = dq.execute_segment(0, 12)
        n = min(len(bv), len(sv))
        finite = np.isfinite(sv[:n])
        np.testing.assert_allclose(bv[:n][finite], sv[:n][finite], rtol=1e-6)
        np.testing.assert_array_equal(bd[:n][finite], sd[:n][finite])
