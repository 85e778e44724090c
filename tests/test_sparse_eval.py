"""Sparse host evaluation (eval_pairs) vs the dense oracle.

Round-3 VERDICT weak #7: aux leaves cost O(corpus) on host because
host_eval produced full-[nd] masks and SegmentPlan stored dense
[A, nd_pad] aux arrays. eval_pairs is the O(matches) twin; this suite
fuzzes its parity against the dense _eval oracle and proves the
sparse-native paths never densify (reference analog: iterators yield
only matching docs, nested_filter.cpp / ngram_similarity_query.cpp).
"""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory

WORDS = [f"t{i:02d}" for i in range(24)]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(1234)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(400):
            n = int(rng.integers(2, 20))
            idx = np.minimum(rng.zipf(1.4, size=n) - 1, len(WORDS) - 1)
            fields = [
                Field("body", " ".join(WORDS[j] for j in idx), analyzer="segmentation")
            ]
            if i % 3 == 0:
                m = int(rng.integers(1, 5))
                idx2 = rng.integers(0, len(WORDS), m)
                fields.append(
                    Field("title", " ".join(WORDS[j] for j in idx2), analyzer="segmentation")
                )
            if i % 7 == 0:  # every 7th doc is a "parent" with a column
                fields.append(Field("kind", "parent", analyzer="identity"))
                fields.append(Field("price", str(i), index=False, store=True))
            fields.append(Field("id", str(i), index=True, store=True))
            w.insert(fields)
            if i == 199:
                w.commit()
        w.commit()
        w.remove(F.ByTerm("id", "42"))
        w.commit()
    return DirectoryReader.open(d)


def random_leaf(rng):
    field = "body" if rng.random() < 0.8 else "title"
    r = rng.random()
    if r < 0.35:
        return F.ByTerm(field, WORDS[rng.integers(0, len(WORDS))])
    if r < 0.5:
        terms = [
            (WORDS[j], float(rng.integers(1, 3)))
            for j in rng.integers(0, len(WORDS), rng.integers(1, 4))
        ]
        return F.ByTerms(field, terms, min_match=int(rng.integers(1, len(terms) + 1)))
    if r < 0.62:
        return F.ByPrefix(field, f"t{rng.integers(0, 3)}", scored_terms_limit=int(rng.integers(2, 16)))
    if r < 0.7:
        lo, hi = sorted(WORDS[j] for j in rng.integers(0, len(WORDS), 2))
        return F.ByRange(field, low=lo, high=hi)
    if r < 0.78:
        return F.ByPhrase("body", [WORDS[j] for j in rng.integers(0, len(WORDS), rng.integers(2, 4))])
    if r < 0.84:
        return F.ByColumnExistence("price")
    if r < 0.9:
        return F.ByNested(
            parent=F.ByTerm("kind", "parent"),
            child=F.ByTerm("body", WORDS[rng.integers(0, 8)]),
            min_match=int(rng.integers(0, 2)),
        )
    if r < 0.96:
        return F.ByWildcard(field, f"t%{rng.integers(0, 10)}")
    return F.All()


def random_tree(rng, depth=0):
    if depth >= 3 or rng.random() < 0.4:
        return random_leaf(rng)
    n = int(rng.integers(2, 5))
    children = [random_tree(rng, depth + 1) for _ in range(n)]
    if rng.random() < 0.3:
        i = rng.integers(0, n)
        children[i] = F.Not(children[i])
    if all(isinstance(c, F.Not) for c in children):
        children[0] = random_leaf(rng)
    merge = ["sum", "sum", "max", "min"][rng.integers(0, 4)]
    boost = float(rng.choice([0.5, 1.0, 2.0]))
    if rng.random() < 0.5:
        return F.And(*children, boost=boost, merge=merge)
    # min_match 0 exercises the documented dense fallback
    mm = int(rng.integers(0, n + 1))
    return F.Or(*children, min_match=mm, boost=boost, merge=merge)


@pytest.mark.parametrize("seed", range(40))
@pytest.mark.parametrize("scorer", [BM25(), TFIDF()], ids=["bm25", "tfidf"])
def test_fuzz_pairs_equal_dense(reader, seed, scorer):
    rng = np.random.default_rng(seed)
    flt = random_tree(rng)
    segs = list(reader.segments)
    hq = HostQuery(flt, segs, scorer)
    for s in range(len(segs)):
        dense = hq._eval(flt, s, 1.0)
        pairs = hq.eval_pairs(flt, s, 1.0)
        assert np.all(np.diff(pairs.docs) > 0), (seed, s)  # sorted unique
        got = pairs.densify(segs[s].num_docs)
        assert np.array_equal(got.match, dense.match), (seed, s, flt)
        np.testing.assert_allclose(
            got.score, dense.score, rtol=1e-5, atol=1e-6, err_msg=str((seed, s, flt))
        )


SPARSE_NATIVE = [
    F.ByTerm("body", "t01"),
    F.ByTerms("body", [("t01", 1.0), ("t02", 1.0)], min_match=1),
    F.ByPhrase("body", ["t00", "t01"]),
    F.ByColumnExistence("price"),
    F.ByNgramSimilarity("body", ["t00", "t01", "t02"], threshold=0.5),
    F.ByNested(parent=F.ByTerm("kind", "parent"), child=F.ByTerm("body", "t01")),
    F.ByNested(
        parent=F.ByColumnExistence("price"),
        child=F.And(F.ByTerm("body", "t00"), F.ByTerm("body", "t01")),
        min_match=0,
    ),
    F.And(F.ByTerm("body", "t00"), F.Not(F.ByTerm("title", "t01"))),
    F.Or(F.ByTerm("body", "t03"), F.ByPhrase("body", ["t00", "t02"]), min_match=1),
]


@pytest.mark.parametrize("i", range(len(SPARSE_NATIVE)))
def test_native_paths_never_densify(reader, i, monkeypatch):
    """The sparse-native filter shapes must not touch the dense oracle
    (the [nd]-allocating path) — that is the O(matches) guarantee."""
    flt = SPARSE_NATIVE[i]
    segs = list(reader.segments)
    hq = HostQuery(flt, segs, BM25())
    want = [hq._eval(flt, s, 1.0) for s in range(len(segs))]

    def boom(self, flt, s, boost):
        raise AssertionError(f"dense _eval called for {flt!r}")

    monkeypatch.setattr(HostQuery, "_eval", boom)
    for s in range(len(segs)):
        pairs = hq.eval_pairs(flt, s, 1.0)
        got = pairs.densify(segs[s].num_docs)
        assert np.array_equal(got.match, want[s].match)
        np.testing.assert_allclose(got.score, want[s].score, rtol=1e-5, atol=1e-6)


def test_plan_stores_sparse_aux(reader):
    """SegmentPlan.aux_pairs holds O(matches) pairs, and the device
    executor reproduces the oracle from them."""
    from iresearch_tpu.exec import DeviceQuery

    flt = F.Or(
        F.ByNested(parent=F.ByTerm("kind", "parent"), child=F.ByTerm("body", "t02")),
        F.ByColumnExistence("price"),
        min_match=1,
    )
    segs = list(reader.segments)
    dq = DeviceQuery(flt, segs, BM25())
    hq = HostQuery(flt, segs, BM25())
    for s in range(len(segs)):
        plan = dq.plan(s)
        assert plan.aux_pairs is not None
        for docs, vals in plan.aux_pairs:
            assert docs.dtype == np.int32 and vals.dtype == np.float32
            assert len(docs) == len(vals) < segs[s].num_docs
        hr = hq.execute(s)
        nmatch = int(hr.match.sum())
        vals, docs = dq.execute_segment(s, max(16, nmatch + 4))
        got = {int(d) for v, d in zip(vals, docs) if np.isfinite(v)}
        assert got == set(np.flatnonzero(hr.match).tolist())
