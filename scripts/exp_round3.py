"""Round-3 experiments on the real 5M segment: validate the two planned
optimizations before building them.

(a) direct-tier decode: contiguous dynamic_slice vs the current row
    gather, batched 80 queries (the MedTerm shape).
(b) "skyline" dense execution: gather M survivor rows + exact rescore +
    top-k, batched 80 (the HighTerm replacement for the full fused scan).

Run: python scripts/exp_round3.py
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

    from iresearch_tpu.formats.bitpack import BITS, unpack_jnp, words_per_block
    from iresearch_tpu.formats.segment_io import read_segment
    from iresearch_tpu.index.segment import SegmentReader
    from iresearch_tpu.formats.spec import TermCols

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
    log(f"segment loaded ({time.time()-t0:.1f}s)")

    dfs = fp.entries[:, TermCols.DF].astype(np.int64)
    order = np.argsort(-dfs)

    tiny = jnp.zeros(8, jnp.float32) + 1.0

    def sync(arr):
        return float(np.asarray(arr.reshape(-1)[0]))

    sync(tiny)
    rtts = []
    for _ in range(5):
        t2 = time.time()
        sync(tiny * 1.0)
        rtts.append(time.time() - t2)
    rtt = sorted(rtts)[2]
    log(f"relay rtt {rtt*1000:.1f} ms")

    def timed(label, fn, reps=10):
        fn()
        sync(tiny * 1.0)
        t = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        sync(out if out is not None else tiny)
        dt = (time.time() - t - rtt) / reps
        log(f"{label}: {dt*1000:.3f} ms")
        return dt

    dfield = sr.device_field("body")
    Q = 80

    # ---------------- (a) direct decode: gather vs slice ----------------
    # med terms: rank 200..280
    med_tids = [int(order[r]) for r in range(200, 200 + Q)]

    def term_rows(t):
        e = fp.entries[t]
        nb = int(e[TermCols.NBLOCKS])
        rd = np.arange(int(e[TermCols.DSTART]), int(e[TermCols.DSTART]) + nb, dtype=np.int32)
        rf = np.arange(int(e[TermCols.FSTART]), int(e[TermCols.FSTART]) + nb, dtype=np.int32)
        rn = np.arange(int(e[TermCols.NSTART]), int(e[TermCols.NSTART]) + nb, dtype=np.int32)
        return rd, rf, rn

    Rmax = 0
    for t in med_tids:
        rd, rf, rn = term_rows(t)
        Rmax = max(Rmax, len(rd))
    R = 1
    while R < Rmax:
        R <<= 1
    log(f"med Rmax={Rmax} bucket R={R}")
    dcls = int(fp.entries[med_tids[0], TermCols.DCLS])
    fcls = int(fp.entries[med_tids[0], TermCols.FCLS])
    ncls = int(fp.entries[med_tids[0], TermCols.NCLS])
    log(f"classes d={dcls}({BITS[dcls]}b) f={fcls}({BITS[fcls]}b) n={ncls}")
    # per-query padded row arrays (gather variant)
    rows_db = np.zeros((Q, R, 3), np.int32)
    starts = np.zeros((Q, 3), np.int32)
    nrows_real = np.zeros(Q, np.int32)
    for qi, t in enumerate(med_tids):
        rd, rf, rn = term_rows(t)
        rows_db[qi, : len(rd), 0] = rd
        rows_db[qi, : len(rf), 1] = rf
        rows_db[qi, : len(rn), 2] = rn
        starts[qi] = (rd[0], rf[0], rn[0])
        nrows_real[qi] = len(rd)
    rows_db_j = jnp.asarray(rows_db)
    starts_j = jnp.asarray(starts)
    nreal_j = jnp.asarray(nrows_real)

    doc_pool = dfield.doc_words[dcls]
    freq_pool = dfield.freq_words[fcls]
    nrm_pool = dfield.nrm_words[ncls]
    base = dfield.base[dcls]
    wpb_d = words_per_block(BITS[dcls])
    wpb_f = words_per_block(BITS[fcls])
    wpb_n = words_per_block(BITS[ncls])

    k = 10
    from iresearch_tpu.ops.topk import wide_top_k

    def score_lanes(dwords, fwords, nwords, base_rows, nrl):
        # [R, wpb] -> docs/score/match, then topk over R*128
        deltas = unpack_jnp(dwords, BITS[dcls]).astype(jnp.int32)
        docs = base_rows.astype(jnp.int32)[:, None] + jnp.cumsum(deltas, axis=1)
        f = unpack_jnp(fwords, BITS[fcls]).astype(jnp.int32).astype(jnp.float32)
        dl = unpack_jnp(nwords, BITS[ncls]).astype(jnp.int32).astype(jnp.float32)
        w = jnp.float32(1.5)
        sc = w * f / jnp.maximum(f + 0.3 + 0.0140625 * dl, 1e-9)
        rowix = jnp.arange(R, dtype=jnp.int32)
        live = (rowix < nrl)[:, None] & (f > 0)
        masked = jnp.where(live, sc, -jnp.inf)
        return wide_top_k(masked.reshape(-1), k)

    @jax.jit
    def direct_gather(dp, fp_, np_, bs, rows_b, nreal):
        def one(rows, nrl):
            dwords = dp[rows[:, 0]]
            fwords = fp_[rows[:, 1]]
            nwords = np_[rows[:, 2]]
            return score_lanes(dwords, fwords, nwords, bs[rows[:, 0]], nrl)

        return jax.vmap(one)(rows_b, nreal)

    @jax.jit
    def direct_slice(dp, fp_, np_, bs, st, nreal):
        def one(s, nrl):
            dwords = jax.lax.dynamic_slice(dp, (s[0], 0), (R, wpb_d))
            fwords = jax.lax.dynamic_slice(fp_, (s[1], 0), (R, wpb_f))
            nwords = jax.lax.dynamic_slice(np_, (s[2], 0), (R, wpb_n))
            base_r = jax.lax.dynamic_slice(bs, (s[0],), (R,))
            return score_lanes(dwords, fwords, nwords, base_r, nrl)

        return jax.vmap(one)(st, nreal)

    P4 = (doc_pool, freq_pool, nrm_pool, base)
    timed("med direct GATHER x80", lambda: direct_gather(*P4, rows_db_j, nreal_j)[0])
    timed("med direct SLICE  x80", lambda: direct_slice(*P4, starts_j, nreal_j)[0])
    # agreement
    va = np.asarray(direct_gather(*P4, rows_db_j, nreal_j)[0])
    vb = np.asarray(direct_slice(*P4, starts_j, nreal_j)[0])
    log(f"agree: {np.allclose(va, vb)}")

    # ---------------- (b) skyline: M-row gather + rescore ----------------
    cache = sr.dense_cache("body")
    # high terms rank 2..82 restricted to dense cache
    high_tids = [int(order[r]) for r in range(2, 300) if int(order[r]) in cache.spans][:Q]
    cls0, _ = cache.spans[high_tids[0]]
    same = [t for t in high_tids if cache.spans[t][0] == cls0][:Q]
    log(f"skyline terms in class {cls0} (bits {BITS[cls0]}): {len(same)}")
    pool = dfield.dense_words(cache, cls0)
    ndrows = cache.ndrows
    nrm_grid = (dfield.norms_u16 if dfield.norms_u16 is not None else dfield.norms).reshape(ndrows, 128)
    bits0 = BITS[cls0]
    wpb0 = words_per_block(bits0)

    # host-side: fake survivor rows = top-M rows by bmaxf (stand-in for the
    # real ub permutation; cost shape is identical)
    Ms = [32, 256, 1024]
    span_starts = np.asarray([cache.spans[t][1] for t in same], np.int32)
    perm_rows = {}
    for M in Ms:
        pr = np.zeros((len(same), M), np.int32)
        for qi, t in enumerate(same):
            c, s0 = cache.spans[t]
            bm = cache.bmaxf[c][s0 : s0 + ndrows]
            pr[qi] = np.argsort(-bm.astype(np.int64), kind="stable")[:M]
        perm_rows[M] = jnp.asarray(pr)
    starts_sk = jnp.asarray(span_starts)

    def make_skyline(M):
        @jax.jit
        def skyline(pool, nrm_grid, rows_b, st):
            def one(rows, s):
                w32 = pool[s + rows]  # [M, wpb]
                f = unpack_jnp(w32, bits0).astype(jnp.int32).astype(jnp.float32)
                dl = nrm_grid[rows].astype(jnp.int32).astype(jnp.float32)
                w = jnp.float32(1.5)
                sc = w * f / jnp.maximum(f + 0.3 + 0.0140625 * dl, 1e-9)
                masked = jnp.where(f > 0, sc, -jnp.inf)
                docs = rows[:, None] * 128 + jnp.arange(128, dtype=jnp.int32)[None, :]
                vals, ix = wide_top_k(masked.reshape(-1), k)
                return vals, docs.reshape(-1)[ix]

            return jax.vmap(one)(rows_b, st)

        return skyline

    for M in Ms:
        fn = make_skyline(M)
        pr = perm_rows[M]
        timed(f"skyline M={M} x80", lambda: fn(pool, nrm_grid, pr, starts_sk)[0])

    # reference: current full fused scan per query (batch) on same terms
    from iresearch_tpu.ops.dense_scan import dense_scan_topk

    @jax.jit
    def full_scan(pool, nrm_grid, st):
        def one(s):
            words = jax.lax.dynamic_slice(pool, (s, jnp.int32(0)), (ndrows, wpb0))
            return dense_scan_topk(
                (words,), (jnp.float32(1.5),), nrm_grid, jnp.float32(64.0),
                scorer=__import__("iresearch_tpu.search.scorers", fromlist=["BM25"]).BM25(),
                span_bits=(bits0,), k=k,
            )

        return jax.vmap(one)(st)

    timed("full fused scan x80", lambda: full_scan(pool, nrm_grid, starts_sk)[0], reps=3)

    # ------------- (c) host-side cost of theta/count per query -----------
    c, s0 = cache.spans[same[0]]
    bm = cache.bmaxf[c][s0 : s0 + ndrows].astype(np.float32)
    t = time.time()
    REPS = 200
    for _ in range(REPS):
        srt = np.sort(bm)[::-1]
    log(f"host argsort 41k: {(time.time()-t)/REPS*1000:.3f} ms")
    t = time.time()
    for _ in range(REPS):
        np.searchsorted(-srt, -3.0)
    log(f"host searchsorted: {(time.time()-t)/REPS*1e6:.1f} us")


if __name__ == "__main__":
    main()
