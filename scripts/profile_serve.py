"""Profile the HOST cost of the serving path (prepare + plan + pack).

Runs on CPU jax: builds the 50k bench corpus, then profiles serve_batch
(fresh filter objects each round, warm jit cache) with cProfile so the
per-query Python cost is visible function by function. Device dispatch is
excluded by stubbing run_grouped when IRS_PROFILE_HOST_ONLY=1.

Run: python scripts/profile_serve.py [ntotal]
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

NUM_DOCS = int(os.environ.get("BENCH_DOCS", 50_000))
VOCAB = 30_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from iresearch_tpu.formats.postings import encode_field_postings
    from iresearch_tpu.formats.spec import IndexFeatures
    from iresearch_tpu.index.invert import invert_numpy
    from iresearch_tpu.index.segment import SegmentData, SegmentReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.exec.batch import QueryBatch

    t0 = time.time()
    rng = np.random.default_rng(42)
    lens = rng.integers(32, 96, size=NUM_DOCS)
    total = int(lens.sum())
    tids = np.minimum(rng.zipf(1.25, size=total) - 1, VOCAB - 1).astype(np.int64)
    doc_of_tok = np.repeat(np.arange(NUM_DOCS), lens)
    starts = np.cumsum(lens) - lens
    pos_of_tok = (
        np.arange(len(tids), dtype=np.int64) - np.repeat(starts, lens)
    ).astype(np.uint32)
    inv = invert_numpy(tids, doc_of_tok, pos_of_tok, VOCAB, NUM_DOCS)
    present = np.flatnonzero(np.diff(inv.term_ptr) > 0)
    terms_l = [b"t%06d" % t for t in present]
    blob = b"".join(terms_l)
    offs = np.zeros(len(terms_l) + 1, np.uint64)
    offs[1:] = np.cumsum([len(t) for t in terms_l])
    tp = np.concatenate([inv.term_ptr[present], [inv.term_ptr[-1]]])
    fp = encode_field_postings(
        inv.e_doc, inv.e_freq, tp, blob, offs, inv.norms, inv.pos_flat,
        IndexFeatures.FREQ | IndexFeatures.POS,
    )
    data = SegmentData(NUM_DOCS, {"body": fp}, {})
    sr = SegmentReader("bench", data)
    log(f"index built ({time.time()-t0:.1f}s)")

    tv = sr.terms("body")
    terms = [tv[i] for i in range(len(tv))]
    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return terms[order[min(rank, len(order) - 1)]].decode()

    scorer = BM25()
    K = 10

    def serve_batch(rot, execute=True):
        fresh = []
        for j in range(25):
            a = term_at(2 + (rot + j) % 600)
            b = term_at(200 + (rot + j) % 1200)
            fresh.append(F.ByTerm("body", a))
            fresh.append(F.And(F.ByTerm("body", a), F.ByTerm("body", b)))
        qb2 = QueryBatch(fresh, [sr], scorer, wand=True)
        pb = qb2.prepare(0, K)
        if execute:
            res2 = pb.run_grouped()
            float(np.asarray(res2[-1][0][0]).reshape(-1)[0])
        return len(fresh)

    rots = [0, 37, 74, 111]
    for r in rots:
        serve_batch(r)
    log("warm done")

    host_only = os.environ.get("IRS_PROFILE_HOST_ONLY", "1") == "1"

    # timed (no profiler overhead)
    t1 = time.time()
    n = 0
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    for i in range(reps):
        n += serve_batch(rots[i % 4], execute=not host_only)
    dt = time.time() - t1
    log(
        f"{'host-only' if host_only else 'end-to-end'}: {n} queries in "
        f"{dt:.2f}s -> {n/dt:.0f} QPS ({dt/n*1e6:.0f} us/query)"
    )

    pr = cProfile.Profile()
    pr.enable()
    for i in range(reps):
        serve_batch(rots[i % 4], execute=not host_only)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
