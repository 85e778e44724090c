"""Experiment: is the per-lane norms[docs] random gather the bottleneck?

Runs the rep=8 batch with (a) the real scorer, (b) norms gather replaced
by a constant (wrong scores, perf signal only), (c) plus no freq unpack.
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
    from iresearch_tpu.search.scorers import BM25, score_block
    from iresearch_tpu.exec.batch import QueryBatch
    from iresearch_tpu.exec import executor as ex

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
    tasks = base_tasks * 8

    def sync(arr):
        return float(np.asarray(arr.reshape(-1)[0]))

    tiny = jnp.zeros(8, jnp.float32) + 1.0
    sync(tiny)

    from iresearch_tpu.formats.bitpack import unpack_jnp

    def contrib_nonorm(pool, rows_d, rows_f, w, bd, bf, avgdl, scorer):
        doc_words, freq_words, base, norms = pool
        d = unpack_jnp(doc_words[rows_d], bd).astype(jnp.int32)
        docs = base[rows_d][:, None] + jnp.cumsum(d, axis=1)
        f = unpack_jnp(freq_words[rows_f], bf).astype(jnp.float32)
        dl = jnp.full_like(f, 64.0)  # WRONG scores; perf probe only
        sc = score_block(scorer, w[:, None], f, dl, avgdl, xp=jnp)
        return docs, sc, f > 0

    def contrib_nofreq(pool, rows_d, rows_f, w, bd, bf, avgdl, scorer):
        doc_words, freq_words, base, norms = pool
        d = unpack_jnp(doc_words[rows_d], bd).astype(jnp.int32)
        docs = base[rows_d][:, None] + jnp.cumsum(d, axis=1)
        f = jnp.ones_like(d, dtype=jnp.float32)
        sc = w[:, None] * f
        return docs, sc, f > 0

    scorer = BM25()
    for name, fn in (
        ("real", None),
        ("no-norms-gather", contrib_nonorm),
        ("no-freq-no-norm", contrib_nofreq),
    ):
        if fn is not None:
            ex._group_contrib = fn  # module-global lookup at trace time
        jax.clear_caches()  # force retrace with the patched contrib
        qb = QueryBatch(tasks, [sr], scorer, wand=True)
        prep = qb.prepare(0, K)
        res = prep.run_grouped()
        sync(res[-1][0][0])
        t1 = time.time()
        nq = 0
        for _ in range(12):
            res = prep.run_grouped()
            nq += len(tasks)
        sync(res[-1][0][0])
        el = time.time() - t1
        log(f"{name}: {nq/el:.0f} QPS ({el/12*1000:.1f} ms/dispatch of {len(tasks)})")


if __name__ == "__main__":
    main()
