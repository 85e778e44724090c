"""Profile the 5M-doc dense-scan path on the real TPU.

Breaks the batched term-query cost into components so round-3 pruning
work attacks the real bottleneck. Run: python scripts/profile_scan.py
(needs the 5M bench cache; builds it via bench.py logic otherwise).
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
    import jax.numpy as jnp

    from iresearch_tpu.formats.segment_io import read_segment
    from iresearch_tpu.index.segment import SegmentData, SegmentReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25

    t0 = time.time()
    cache_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"seg_{NUM_DOCS}_{VOCAB}_v5.bin",
    )
    with open(cache_file, "rb") as f:
        data = read_segment(f.read())
    sr = SegmentReader("bench", data)
    fp = data.fields["body"]
    log(f"segment loaded ({time.time()-t0:.1f}s), {fp.num_terms} terms")

    tv = sr.terms("body")
    terms = [tv[i] for i in range(len(tv))]
    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return terms[order[min(rank, len(order) - 1)]].decode()

    def sync(arr):
        return float(np.asarray(arr.reshape(-1)[0]))

    tiny = jnp.zeros(8, jnp.float32) + 1.0
    sync(tiny)
    rtts = []
    for _ in range(5):
        t2 = time.time()
        sync(tiny * 1.0)
        rtts.append(time.time() - t2)
    rtt = sorted(rtts)[2]
    log(f"relay rtt {rtt*1000:.1f} ms")

    scorer = BM25()
    K = 10

    def timed(label, fn, reps=20):
        fn()  # warm/compile
        sync(tiny * 1.0)
        t = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        sync(out if out is not None else tiny)
        dt = (time.time() - t - rtt) / reps
        log(f"{label}: {dt*1000:.3f} ms")
        return dt

    # ---- batched category runs (the bench shape) -----------------------
    from iresearch_tpu.exec.batch import QueryBatch

    high = [term_at(i) for i in range(2, 82)]
    med = [term_at(i) for i in range(200, 280)]
    low = [term_at(i) for i in range(2000, 2080)]

    cats = {
        "HighTerm80": [F.ByTerm("body", t) for t in high],
        "MedTerm80": [F.ByTerm("body", t) for t in med],
        "LowTerm80": [F.ByTerm("body", t) for t in low],
        "AndHighMed80": [
            F.And(F.ByTerm("body", h), F.ByTerm("body", m))
            for h, m in zip(high, med)
        ],
        "OrHighMed80": [
            F.Or(F.ByTerm("body", h), F.ByTerm("body", m))
            for h, m in zip(high, med)
        ],
    }
    for name, filters in cats.items():
        qb = QueryBatch(filters, [sr], scorer, wand=True)
        prep = qb.prepare(0, K)
        dq0 = qb.queries[0]
        p0 = dq0.plan(0)
        log(
            f"  {name}: mode={p0.exec_mode} dense={len(p0.dense_spans)} "
            f"groups={[(g.dcls, g.fcls, len(g.rows_d)) for g in p0.groups]}"
        )

        def run():
            return prep.run_grouped()[-1][0][0]

        dt = timed(name, run, reps=5)
        log(f"  -> {dt*1000/len(filters):.4f} ms/query")

    # ---- raw component costs at this scale ----------------------------
    cache = sr.dense_cache("body")
    dfield = sr.device_field("body")
    ndrows = cache.ndrows
    log(f"dense cache: ndrows={ndrows}, terms={len(cache.spans)}")

    # dense pool stream read (lower bound for a scan over one span class)
    from iresearch_tpu.formats.bitpack import BITS

    for c, pool_np in enumerate(cache.pools):
        if pool_np.shape[0] <= 1:
            continue
        pool = dfield.dense_words(cache, c)
        log(
            f"class {c} (bits {BITS[c]}): pool {pool.shape} "
            f"{pool.nbytes/1e6:.1f} MB"
        )

    nrm = dfield.norms_u16
    nrm_grid = nrm.reshape(ndrows, 128)

    @jax.jit
    def stream_norms():
        return jnp.sum(nrm_grid.astype(jnp.int32), axis=1)[:8].astype(
            jnp.float32
        )

    timed("stream norms u16 [nd] reduce", stream_norms)

    # one span's rows: slice + rowmax scan (the current per-query cost)
    import iresearch_tpu.ops.dense_scan as dsc

    # pick a high-df dense term
    tid_high = None
    for r in range(2, 200):
        t = order[r]
        if t in cache.spans:
            tid_high = int(t)
            break
    cls, start = cache.spans[tid_high]
    pool = dfield.dense_words(cache, cls)

    @jax.jit
    def slice_only():
        w = jax.lax.dynamic_slice(
            pool, (start, 0), (ndrows, pool.shape[1])
        )
        return jnp.sum(w, axis=1)[:8].astype(jnp.float32)

    timed(f"dynamic_slice span (bits {BITS[cls]}) + reduce", slice_only)

    span_words = (
        jax.lax.dynamic_slice(pool, (start, 0), (ndrows, pool.shape[1])),
    )
    span_words = jax.tree_util.tree_map(lambda x: x, span_words)

    def rowmax():
        v, a = dsc.dense_scan_rowmax_xla(
            span_words, (jnp.float32(1.5),), nrm_grid, jnp.float32(64.0),
            scorer=scorer, span_bits=(BITS[cls],),
        )
        return v[:8]

    timed("rowmax_xla 1 span (pre-sliced)", rowmax)

    def scan_topk():
        v, d = dsc.dense_scan_topk(
            span_words, (jnp.float32(1.5),), nrm_grid, jnp.float32(64.0),
            scorer=scorer, span_bits=(BITS[cls],), k=K,
        )
        return v

    timed("dense_scan_topk 1 span (pre-sliced)", scan_topk)

    # wide_top_k over [ndrows]
    from iresearch_tpu.ops.topk import wide_top_k

    bv = jnp.zeros(ndrows, jnp.float32) + 1.0

    @jax.jit
    def wtk():
        return wide_top_k(bv, 20)[0]

    timed("wide_top_k over [ndrows] m=20", wtk)

    # norms-free rowmax (how much of the scan is norms traffic?)
    ones_nrm = jnp.ones((ndrows, 128), jnp.float32)

    def rowmax_nonorm():
        v, a = dsc.dense_scan_rowmax_xla(
            span_words, (jnp.float32(1.5),), ones_nrm, jnp.float32(64.0),
            scorer=scorer, span_bits=(BITS[cls],),
        )
        return v[:8]

    timed("rowmax_xla 1 span, f32 ones norms", rowmax_nonorm)


if __name__ == "__main__":
    main()
