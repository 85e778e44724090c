"""End-to-end verification on the REAL TPU chip vs brute-force oracles.

Run from the repo root (keeps /root/.axon_site on PYTHONPATH):
    python scripts/verify_tpu.py

Covers: term/OR/AND-NOT top-k vs a from-raw-documents BM25 oracle, device
phrase vs a position-scan oracle, merge types vs the host evaluator, WAND
vs exhaustive, and 10 random boolean trees (wand-enabled) vs the oracle.
The CPU test suite covers the same ground on the virtual mesh; this script
proves the real-chip path.
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def build(docs, analyzer="segmentation"):
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
    from iresearch_tpu.store.directory import MemoryDirectory

    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, t in enumerate(docs):
            w.insert([
                Field("body", t, analyzer=analyzer),
                Field("id", str(i), index=True, store=True),
            ])
        w.commit()
    return DirectoryReader.open(d)


def check_bm25_oracle():
    from iresearch_tpu.exec import search_device
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25

    rng = np.random.default_rng(3)
    words = ["red", "blue", "fox", "dog", "sun", "sky", "run", "sit"]
    docs = [
        " ".join(words[i] for i in np.minimum(rng.zipf(1.5, rng.integers(3, 25)) - 1, 7))
        for _ in range(500)
    ]
    r = build(docs)
    toks = [t.split() for t in docs]
    N = sum(1 for t in toks if t)
    avgdl = sum(len(t) for t in toks) / N

    def df(term):
        return sum(1 for t in toks if term in t)

    def bm25(i, term, k=1.2, b=0.75):
        tf = toks[i].count(term)
        if tf == 0:
            return 0.0
        w_ = (k + 1) * math.log1p((N - df(term) + 0.5) / (df(term) + 0.5))
        return w_ * tf / (tf + k * (1 - b + b * len(toks[i]) / avgdl))

    for term in ("fox", "sun"):
        got = search_device(r, F.ByTerm("body", term), BM25(), k=10)
        want = sorted(
            ((i, bm25(i, term)) for i in range(len(docs)) if term in toks[i]),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        assert [g[0] for g in got] == [w[0] for w in want], term
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-4 * max(1, abs(ws))
    print("BM25 top-k vs raw-document oracle: OK")


def check_phrase():
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25

    rng = np.random.default_rng(5)
    W = ["red", "fox", "ran", "far", "dog"]
    docs = [" ".join(W[i] for i in rng.integers(0, 5, rng.integers(4, 30))) for _ in range(600)]
    r = build(docs)
    flt = F.ByPhrase("body", ["red", "fox"])
    dq = DeviceQuery(flt, list(r.segments), BM25())
    assert dq.plan(0).device_aux, "device phrase must engage"
    vals, ds = dq.execute_segment(0, 600)
    got = {int(x) for v, x in zip(vals, ds) if np.isfinite(v)}
    want = set()
    for i, t in enumerate(docs):
        toks = t.split()
        if any(a == "red" and i2 + 1 < len(toks) and toks[i2 + 1] == "fox"
               for i2, a in enumerate(toks)):
            want.add(i)
    assert got == want
    print(f"device phrase vs position-scan oracle: OK ({len(got)} hits)")


def check_wand_and_fuzz():
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.host_eval import HostQuery
    from iresearch_tpu.search.scorers import BM25
    from test_fuzz_queries import WORDS, random_tree

    rng0 = np.random.default_rng(99)
    docs = []
    for _ in range(400):
        n = int(rng0.integers(2, 24))
        idx = np.minimum(rng0.zipf(1.4, size=n) - 1, len(WORDS) - 1)
        docs.append(" ".join(WORDS[j] for j in idx))
    r = build(docs)
    segs = list(r.segments)
    for seed in range(200, 210):
        rng = np.random.default_rng(seed)
        flt = random_tree(rng)
        hq = HostQuery(flt, segs, BM25())
        hr = hq.execute(0)
        dq = DeviceQuery(flt, segs, BM25(), wand=True)
        nm = int(hr.match.sum())
        k = min(dq.plan(0).nd_pad, max(16, nm + 4))
        vals, ds = dq.execute_segment(0, k)
        got = {int(x): float(v) for v, x in zip(vals, ds)
               if not (math.isinf(v) and v < 0)}
        assert set(got) == set(np.flatnonzero(hr.match).tolist()), seed
        for x in got:
            assert abs(got[x] - hr.score[x]) <= 1e-4 * max(1, abs(hr.score[x]))
    print("10 random boolean trees (wand where eligible) vs oracle: OK")


def check_segmerge():
    """Fused device cross-segment merge == host merge (exec/segmerge.py)."""
    from iresearch_tpu.exec.batch import QueryBatch
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rng = np.random.default_rng(7)
    docs = []
    for i in range(300):
        n = int(rng.integers(2, 12))
        idx = np.minimum(rng.zipf(1.5, size=n) - 1, len(words) - 1)
        docs.append(" ".join(words[j] for j in idx))
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
    from iresearch_tpu.store.directory import MemoryDirectory

    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, t in enumerate(docs):
            w.insert([Field("body", t, analyzer="segmentation")])
            if i == 140:
                w.commit()  # two segments
        w.commit()
    r = DirectoryReader.open(d)
    filters = [F.ByTerm("body", w) for w in words[:4]] + [
        F.Or(F.ByTerm("body", "alpha"), F.ByTerm("body", "zeta")),
        F.And(F.ByTerm("body", "alpha"), F.ByTerm("body", "gamma")),
    ]
    qb = QueryBatch(filters, list(r.segments), BM25(), wand=True)
    got = qb.prepare_all(8).search(8)
    ref = qb.search(8)
    for g, rf in zip(got, ref):
        assert len(g) == len(rf), (g, rf)
        for (gd, gv), (rd, rv) in zip(g, rf):
            assert gd == rd and abs(gv - rv) <= 1e-5 * max(1, abs(rv))
    print(f"device cross-segment merge vs host merge: OK ({len(got)} queries)")


def check_min_match_skyline():
    """min_match skyline pruning (exec/skyline.py mm path) on-chip vs
    the host oracle — count-threshold survivors + host-rescored θ."""
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.exec import skyline as sky
    from iresearch_tpu.exec.skyline import skyline_spec
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.host_eval import HostQuery
    from iresearch_tpu.search.scorers import BM25

    rng = np.random.default_rng(29)
    words = [f"w{i:03d}" for i in range(300)]
    docs = []
    for _ in range(3000):
        n = int(rng.integers(5, 40))
        idx = np.minimum(rng.zipf(1.25, size=n) - 1, len(words) - 1)
        docs.append(" ".join(words[j] for j in idx))
    r = build(docs)
    ratio = sky.SKYLINE_SCAN_RATIO
    sky.SKYLINE_SCAN_RATIO = 0.0  # tiny grid: force the survivor path
    try:
        flt = F.Or(*[F.ByTerm("body", w) for w in words[:4]], min_match=2)
        dq = DeviceQuery(flt, list(r.segments), BM25())
        spec = skyline_spec(dq.plan(0), r.segments[0], BM25(), 10)
        assert spec is not None and spec.min_match == 2, "mm skyline engages"
        got = dq.top_k(10)
        want = HostQuery(flt, list(r.segments), BM25()).top_k(10)
        assert [d for d, _ in got] == [d for d, _ in want], (got, want)
        for (gd, gv), (wd, wv) in zip(got, want):
            assert abs(gv - wv) <= 1e-4 * max(1, abs(wv))
    finally:
        sky.SKYLINE_SCAN_RATIO = ratio
    print("min_match skyline vs oracle: OK")


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices())
    check_bm25_oracle()
    check_phrase()
    check_wand_and_fuzz()
    check_segmerge()
    check_min_match_skyline()
    print("VERIFY_TPU PASS on", jax.devices()[0].platform)
