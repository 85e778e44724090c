"""Per-dispatch-group timing of the bench batched pass on the real chip.

Loads the cached bench segment (.bench_cache), builds the bench.py task
mix, prepares the QueryBatch, then times (a) each signature group
unfused and (b) the fused whole-batch program, completion-synced.
Points at where a 400-query pass spends its time.

Run: MALLOC_MMAP_MAX_=0 MALLOC_TRIM_THRESHOLD_=-1 \
     BENCH_DOCS=5000000 python scripts/profile_batch5m.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_DOCS = int(os.environ.get("BENCH_DOCS", 5_000_000))
VOCAB = 30_000


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
        ".bench_cache",
        f"seg_{NUM_DOCS}_{VOCAB}_v5.bin",
    )
    t0 = time.time()
    with open(cache_file, "rb") as f:
        data = read_segment(f.read())
    fp = data.fields["body"]
    sr = SegmentReader("bench", data)
    log(f"segment loaded ({time.time()-t0:.1f}s)")

    tv = sr.terms("body")
    terms = [tv[i] for i in range(len(tv))]
    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return terms[order[min(rank, len(order) - 1)]].decode()

    high = [term_at(i) for i in range(2, 82)]
    med = [term_at(i) for i in range(200, 280)]
    low = [term_at(i) for i in range(2000, 2080)]
    names = {}
    tasks = []
    for nm, lst in (("HighTerm", high), ("MedTerm", med), ("LowTerm", low)):
        for t in lst:
            names[len(tasks)] = nm
            tasks.append(F.ByTerm("body", t))
    for h, m in zip(high, med):
        names[len(tasks)] = "AndHighMed"
        tasks.append(F.And(F.ByTerm("body", h), F.ByTerm("body", m)))
    for h, m in zip(high, med):
        names[len(tasks)] = "OrHighMed"
        tasks.append(F.Or(F.ByTerm("body", h), F.ByTerm("body", m)))

    scorer = BM25()
    K = 10

    def sync(arr):
        return float(np.asarray(arr.reshape(-1)[0]))

    qb = QueryBatch(tasks, [sr], scorer, wand=True)
    t1 = time.time()
    prep = qb.prepare(0, K)
    log(f"prepare: {time.time()-t1:.2f}s, {len(prep._calls)} groups")

    # describe groups
    for gi, (qis, args, kwargs, fn) in enumerate(prep._calls):
        cats = sorted({names[qi] for qi in qis})
        log(
            f"  group {gi}: {len(qis)} queries {cats} fn={fn.__name__} "
            f"kw={ {k: v for k, v in kwargs.items() if isinstance(v, (int, tuple))} }"
        )

    # warm fused
    res = prep.run_grouped()
    sync(res[-1][0][0])

    import jax.numpy as jnp
    tiny = jnp.zeros(8, jnp.float32) + 1.0
    sync(tiny)
    rtts = []
    for _ in range(5):
        t2 = time.time()
        sync(tiny * 1.0)
        rtts.append(time.time() - t2)
    rtt = sorted(rtts)[2]
    log(f"rtt {rtt*1000:.1f} ms")

    # fused timing
    REPS = 20
    t2 = time.time()
    for _ in range(REPS):
        res = prep.run_grouped()
    sync(res[-1][0][0])
    fused_ms = (time.time() - t2 - rtt) / REPS * 1000
    log(f"FUSED whole-batch: {fused_ms:.2f} ms/pass "
        f"({len(tasks)/fused_ms*1000:.0f} QPS)")

    # unfused per-group timing: dispatch only group gi repeatedly
    from iresearch_tpu.exec.batch import _materialize

    for gi, (qis, args, kwargs, fn) in enumerate(prep._templates):
        margs = _materialize(args, prep._dev_args, prep._buffers, prep._sections)
        out = fn(*margs, **dict(kwargs))
        sync(out[0])
        t2 = time.time()
        for _ in range(REPS):
            out = fn(*margs, **dict(kwargs))
        sync(out[0])
        ms = (time.time() - t2 - rtt) / REPS * 1000
        cats = sorted({names[qi] for qi in qis})
        log(f"  group {gi} [{len(qis)}q {cats}]: {ms:.2f} ms")


if __name__ == "__main__":
    main()
