"""Per-category batched profiling at BENCH_DOCS scale (default 5M).

Loads the cached bench segment and times each luceneutil category's
80-query batch separately, plus sub-batch sizes, to locate where the
batched QPS goes. Completion-synced like bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_DOCS = int(os.environ.get("BENCH_DOCS", 5_000_000))
VOCAB = 30_000
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from iresearch_tpu.formats.segment_io import read_segment
    from iresearch_tpu.index.segment import SegmentReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.exec.batch import QueryBatch

    cache_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", f"seg_{NUM_DOCS}_{VOCAB}_v5.bin",
    )
    t0 = time.time()
    with open(cache_file, "rb") as f:
        data = read_segment(f.read())
    sr = SegmentReader("bench", data)
    fp = data.fields["body"]
    tv = sr.terms("body")
    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return tv[int(order[min(rank, len(order) - 1)])].decode()

    log(f"loaded ({time.time()-t0:.1f}s)")

    def sync(arr):
        return float(np.asarray(arr.reshape(-1)[0]))

    import jax.numpy as jnp
    tiny = jnp.zeros(8, jnp.float32) + 1.0
    sync(tiny)

    high = [term_at(i) for i in range(2, 82)]
    med = [term_at(i) for i in range(200, 280)]
    low = [term_at(i) for i in range(2000, 2080)]
    cats = {
        "HighTerm": [F.ByTerm("body", t) for t in high],
        "MedTerm": [F.ByTerm("body", t) for t in med],
        "LowTerm": [F.ByTerm("body", t) for t in low],
        "AndHighMed": [
            F.And(F.ByTerm("body", h), F.ByTerm("body", m))
            for h, m in zip(high, med)
        ],
        "OrHighMed": [
            F.Or(F.ByTerm("body", h), F.ByTerm("body", m))
            for h, m in zip(high, med)
        ],
    }
    scorer = BM25()
    for name, filters in cats.items():
        for q in (80,):
            qb = QueryBatch(filters[:q], [sr], scorer, wand=True)
            t1 = time.time()
            prep = qb.prepare(0, K)
            prep_s = time.time() - t1
            res = prep.run_grouped()
            sync(res[-1][0][0])
            t2 = time.time()
            passes = 5
            for _ in range(passes):
                res = prep.run_grouped()
            sync(res[-1][0][0])
            dt = (time.time() - t2) / passes
            modes = {}
            for qq in qb.queries:
                p = qq.plan(0)
                key = (p.exec_mode, len(p.dense_spans), len(p.groups))
                modes[key] = modes.get(key, 0) + 1
            log(
                f"{name:11s} Q={q}: {dt*1000:8.2f} ms/pass = "
                f"{dt/q*1000:6.3f} ms/query ({q/dt:8.0f} QPS) "
                f"prep {prep_s:.1f}s groups={len(prep._calls)} modes={modes}"
            )


if __name__ == "__main__":
    main()
