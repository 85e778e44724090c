"""Randomized query fuzzer: random boolean trees, device vs host oracle.

The reference covers filters with hand-written per-filter suites; this
fuzzer additionally sweeps the combinatorial space (nesting, Not
placement, min_match, merge types, mixed leaf kinds, multi-field) and
demands exact match sets + rtol scores between the jitted executor and
the numpy oracle on every generated tree.
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

WORDS = [f"t{i:02d}" for i in range(30)]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(99)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(500):
            n = int(rng.integers(2, 24))
            idx = np.minimum(rng.zipf(1.4, size=n) - 1, len(WORDS) - 1)
            fields = [Field("body", " ".join(WORDS[j] for j in idx), analyzer="segmentation")]
            if i % 3 == 0:
                m = int(rng.integers(1, 6))
                idx2 = rng.integers(0, len(WORDS), m)
                fields.append(
                    Field("title", " ".join(WORDS[j] for j in idx2), analyzer="segmentation")
                )
            fields.append(Field("id", str(i), index=True, store=True))
            w.insert(fields)
            if i == 240:
                w.commit()
        w.commit()
        w.remove(F.ByTerm("id", "77"))
        w.commit()
    return DirectoryReader.open(d)


def random_leaf(rng):
    field = "body" if rng.random() < 0.8 else "title"
    r = rng.random()
    if r < 0.45:
        return F.ByTerm(field, WORDS[rng.integers(0, len(WORDS))])
    if r < 0.6:
        terms = [(WORDS[j], float(rng.integers(1, 3))) for j in rng.integers(0, len(WORDS), rng.integers(1, 4))]
        mm = int(rng.integers(1, len(terms) + 1))
        return F.ByTerms(field, terms, min_match=mm)
    if r < 0.72:
        return F.ByPrefix(field, f"t{rng.integers(0, 3)}", scored_terms_limit=int(rng.integers(2, 20)))
    if r < 0.8:
        lo, hi = sorted(WORDS[j] for j in rng.integers(0, len(WORDS), 2))
        return F.ByRange(field, low=lo, high=hi)
    if r < 0.88:
        return F.ByPhrase("body", [WORDS[j] for j in rng.integers(0, len(WORDS), rng.integers(2, 4))])
    if r < 0.95:
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
    # ensure not all children are Not (host bare-Not semantics differ)
    if all(isinstance(c, F.Not) for c in children):
        children[0] = random_leaf(rng)
    merge = ["sum", "sum", "max", "min"][rng.integers(0, 4)]
    boost = float(rng.choice([0.5, 1.0, 2.0]))
    if rng.random() < 0.5:
        return F.And(*children, boost=boost, merge=merge)
    mm = int(rng.integers(1, n + 1))
    return F.Or(*children, min_match=mm, boost=boost, merge=merge)


@pytest.mark.parametrize(
    "seed",
    # every tree is a fresh jit signature, so each case costs a compile;
    # 12 seeds in the default run, the full sweep behind --runslow
    list(range(12))
    + [pytest.param(s, marks=pytest.mark.slow) for s in range(12, 40)],
)
@pytest.mark.parametrize("scorer", [BM25(), TFIDF()], ids=["bm25", "tfidf"])
def test_fuzz_device_equals_host(reader, seed, scorer):
    from iresearch_tpu.exec import DeviceQuery

    rng = np.random.default_rng(seed)
    flt = random_tree(rng)
    segs = list(reader.segments)
    hq = HostQuery(flt, segs, scorer)
    dq = DeviceQuery(flt, segs, scorer)
    for s in range(len(segs)):
        hr = hq.execute(s)
        nmatch = int(hr.match.sum())
        k = min(dq.plan(s).nd_pad, max(16, nmatch + 4))
        vals, docs = dq.execute_segment(s, k)
        got = {int(d): float(v) for v, d in zip(vals, docs)
               if not (math.isinf(v) and v < 0)}
        want = set(np.flatnonzero(hr.match).tolist())
        assert set(got) == want, (seed, s, flt)
        for d in want:
            assert got[d] == pytest.approx(
                float(hr.score[d]), rel=1e-4, abs=1e-5
            ), (seed, s, d, flt)
