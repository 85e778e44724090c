"""Device executor vs host oracle equivalence.

Reference analog: tests/search/filter_test_case_base.cpp checks every filter
against expected doc/score lists; wand_test.cpp checks pruned vs exhaustive.
Here the jitted executor must reproduce the numpy oracle exactly (same match
set, scores to float tolerance, same top-k order modulo float-tie jitter).
"""

import math

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25, TFIDF, BoostScore

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon",
]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    docs = []
    for _ in range(300):
        n = int(rng.integers(2, 30))
        # zipf-flavored pick so dfs vary widely
        idx = np.minimum(rng.zipf(1.4, size=n) - 1, len(WORDS) - 1)
        docs.append(" ".join(WORDS[i] for i in idx))
    return docs


@pytest.fixture(scope="module")
def reader(corpus):
    d = __import__("iresearch_tpu.store.directory", fromlist=["MemoryDirectory"]).MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, text in enumerate(corpus):
            w.insert([
                Field("body", text, analyzer="segmentation"),
                Field("id", str(i), index=True, store=True),
            ])
            if i == 150:
                w.commit()  # force a second segment
        w.commit()
        # some deletes so alive-mask filtering is exercised
        w.remove(F.ByTerm("id", "42"))
        w.remove(F.ByTerm("id", "217"))
        w.commit()
    return DirectoryReader.open(d)


FILTERS = [
    F.ByTerm("body", "alpha"),
    F.ByTerm("body", "upsilon"),
    F.ByTerm("body", "missingterm"),
    F.ByTerms("body", [("alpha", 1.0), ("gamma", 2.0), ("tau", 1.0)]),
    F.ByTerms("body", [("alpha", 1.0), ("beta", 1.0), ("gamma", 1.0)], min_match=2),
    F.ByPrefix("body", "e"),
    F.ByPrefix("body", "t", scored_terms_limit=2),
    F.ByRange("body", low="beta", high="eta"),
    F.ByWildcard("body", "%ta"),
    F.ByEditDistance("body", "alphaa", max_distance=1),
    F.And(F.ByTerm("body", "alpha"), F.ByTerm("body", "beta")),
    F.And(F.ByTerm("body", "alpha"), F.Not(F.ByTerm("body", "beta"))),
    F.Or(F.ByTerm("body", "alpha"), F.ByTerm("body", "theta"), boost=2.0),
    F.Or(
        F.ByTerm("body", "alpha"),
        F.ByTerm("body", "beta"),
        F.ByTerm("body", "gamma"),
        min_match=2,
    ),
    F.Or(F.ByTerm("body", "alpha"), F.Not(F.ByTerm("body", "pi"))),
    F.And(
        F.Or(F.ByTerm("body", "alpha"), F.ByTerm("body", "beta")),
        F.Or(F.ByTerm("body", "gamma"), F.ByTerm("body", "delta")),
    ),
    F.All(),
    F.Empty(),
    F.Not(F.ByTerm("body", "alpha")),
    F.ByPhrase("body", ["alpha", "beta"]),
    F.And(F.ByPhrase("body", ["alpha", "beta"]), F.ByTerm("body", "gamma")),
]


def host_full(reader, flt, scorer):
    """Oracle (match, score) arrays per segment."""
    q = HostQuery(flt, list(reader.segments), scorer)
    return [q.execute(s) for s in range(len(q.segments))]


@pytest.mark.parametrize("flt", FILTERS, ids=lambda f: type(f).__name__ + repr(id(f))[-4:])
@pytest.mark.parametrize("scorer", [BM25(), TFIDF(), BoostScore()], ids=["bm25", "tfidf", "boost"])
def test_device_matches_host(reader, flt, scorer):
    from iresearch_tpu.exec import DeviceQuery

    hres = host_full(reader, flt, scorer)
    dq = DeviceQuery(flt, list(reader.segments), scorer)
    for s, hr in enumerate(hres):
        nmatch = int(hr.match.sum())
        k = min(dq.plan(s).nd_pad, max(16, nmatch + 4))
        vals, docs = dq.execute_segment(s, k)
        got = {int(d): float(v) for v, d in zip(vals, docs) if not (math.isinf(v) and v < 0)}
        want_docs = set(np.flatnonzero(hr.match).tolist())
        assert set(got) == want_docs, f"segment {s} match set mismatch"
        for d in want_docs:
            assert got[d] == pytest.approx(float(hr.score[d]), rel=1e-5, abs=1e-6)


def test_device_topk_order(reader):
    from iresearch_tpu.exec import search_device
    from iresearch_tpu.search.host_eval import search as search_host

    flt = F.Or(F.ByTerm("body", "alpha"), F.ByTerm("body", "gamma"))
    h = search_host(reader, flt, BM25(), k=10)
    d = search_device(reader, flt, BM25(), k=10)
    assert [doc for doc, _ in h] == [doc for doc, _ in d]
    for (hd, hs), (dd, ds) in zip(h, d):
        assert ds == pytest.approx(hs, rel=1e-5, abs=1e-6)
