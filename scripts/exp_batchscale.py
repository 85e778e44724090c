"""Experiment: honest QPS vs queries-per-dispatch (batch replication).

Builds the bench corpus, then measures completion-synced QPS with the
task mix replicated x1/x2/x4/x8 into one fused dispatch. Identifies
whether throughput is dispatch-overhead-bound or compute-bound.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_DOCS = int(os.environ.get("BENCH_DOCS", 50_000))
VOCAB = 30_000
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from iresearch_tpu.formats.postings import encode_field_postings
    from iresearch_tpu.formats.spec import IndexFeatures
    from iresearch_tpu.index.invert import invert_numpy
    from iresearch_tpu.index.segment import SegmentData, SegmentReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.exec.batch import QueryBatch

    rng = np.random.default_rng(42)
    lens = rng.integers(32, 96, size=NUM_DOCS)
    total = int(lens.sum())
    tids = np.minimum(rng.zipf(1.25, size=total) - 1, VOCAB - 1).astype(np.int64)
    doc_of_tok = np.repeat(np.arange(NUM_DOCS), lens)
    pos_of_tok = np.concatenate([np.arange(n) for n in lens]).astype(np.uint32)

    inv = invert_numpy(tids, doc_of_tok, pos_of_tok, VOCAB, NUM_DOCS)
    present = np.flatnonzero(np.diff(inv.term_ptr) > 0)
    terms = [b"t%06d" % t for t in present]
    blob = b"".join(terms)
    offs = np.zeros(len(terms) + 1, np.uint64)
    offs[1:] = np.cumsum([len(t) for t in terms])
    tp = np.concatenate([inv.term_ptr[present], [inv.term_ptr[-1]]])
    fp = encode_field_postings(
        inv.e_doc, inv.e_freq, tp, blob, offs, inv.norms, inv.pos_flat,
        IndexFeatures.FREQ | IndexFeatures.POS,
    )
    sr = SegmentReader("bench", SegmentData(NUM_DOCS, {"body": fp}, {}))
    log(f"index ready: {NUM_DOCS} docs")

    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return terms[order[min(rank, len(order) - 1)]].decode()

    high = [term_at(i) for i in range(2, 22)]
    med = [term_at(i) for i in range(200, 220)]
    low = [term_at(i) for i in range(2000, 2020)]
    base_tasks = []
    base_tasks += [F.ByTerm("body", t) for t in high]
    base_tasks += [F.ByTerm("body", t) for t in med]
    base_tasks += [F.ByTerm("body", t) for t in low]
    base_tasks += [
        F.And(F.ByTerm("body", h), F.ByTerm("body", m)) for h, m in zip(high, med)
    ]
    base_tasks += [
        F.Or(F.ByTerm("body", h), F.ByTerm("body", m)) for h, m in zip(high, med)
    ]

    scorer = BM25()

    def sync(arr):
        return float(np.asarray(arr.reshape(-1)[0]))

    tiny = jnp.zeros(8, jnp.float32) + 1.0
    sync(tiny)

    for rep in (1, 2, 4, 8):
        tasks = base_tasks * rep
        qb = QueryBatch(tasks, [sr], scorer, wand=True)
        prep = qb.prepare(0, K)
        res = prep.run_grouped()
        sync(res[-1][0][0])  # compile
        # timed: enqueue blocks, sync
        t1 = time.time()
        nq = 0
        while True:
            for _ in range(max(1, 25 // rep)):
                res = prep.run_grouped()
                nq += len(tasks)
            sync(res[-1][0][0])
            elapsed = time.time() - t1
            if elapsed >= 2.0 or nq >= 40000:
                break
        log(
            f"rep={rep}: Q={len(tasks)}/dispatch, {nq} queries in "
            f"{elapsed:.2f}s -> {nq/elapsed:.0f} QPS "
            f"({elapsed/ (nq/len(tasks)) *1000:.2f} ms/dispatch)"
        )


if __name__ == "__main__":
    main()
