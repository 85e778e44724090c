"""Experiment: where does the batched dense scan's time go at 5M?

Times on the real chip, for the OrHighMed 69-query scan shape
(S=2 spans, 4+2 bit classes, ndrows=40960):
  (a) current per-query vmap (dynamic_slice + dense_scan_rowmax_xla)
  (b) same but constant dl (no norms read) — isolates norms traffic
  (c) q-minor tiled scan: flat row gather per tile, norms read ONCE
  (d) (c) with bf16 norms

Run: BENCH_DOCS=5000000 python scripts/exp_scanshare.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_DOCS = int(os.environ.get("BENCH_DOCS", 5_000_000))
VOCAB = 30_000
Q = 69
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
    import jax.numpy as jnp
    from jax import lax

    from iresearch_tpu.formats.segment_io import read_segment
    from iresearch_tpu.index.segment import SegmentReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.formats.bitpack import unpack_jnp, words_per_block
    from iresearch_tpu.formats.spec import BLOCK

    cache_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"seg_{NUM_DOCS}_{VOCAB}_v5.bin",
    )
    t0 = time.time()
    with open(cache_file, "rb") as f:
        data = read_segment(f.read())
    sr = SegmentReader("bench", data)
    fp = data.fields["body"]
    log(f"segment loaded ({time.time()-t0:.1f}s)")

    tv = sr.terms("body")
    terms = [tv[i] for i in range(len(tv))]
    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return terms[order[min(rank, len(order) - 1)]].decode()

    scorer = BM25()
    # collect the real OrHighMed dense spans, keep the MODAL class pair
    from collections import Counter

    allsp = []
    for j in range(80):
        flt = F.Or(
            F.ByTerm("body", term_at(2 + j)),
            F.ByTerm("body", term_at(200 + j)),
        )
        p = DeviceQuery(flt, [sr], scorer).plan_for_k(0, K)
        sp = sorted(
            [d for d in p.dense_spans if d.w > 0], key=lambda d: d.cls
        )
        if len(sp) == 2:
            allsp.append(sp)
    cls_pair = Counter(
        (sp[0].cls, sp[1].cls) for sp in allsp
    ).most_common(1)[0][0]
    starts_a, starts_b, ws_a, ws_b = [], [], [], []
    for sp in allsp:
        if (sp[0].cls, sp[1].cls) != cls_pair:
            continue
        starts_a.append(sp[0].start)
        starts_b.append(sp[1].start)
        ws_a.append(sp[0].w)
        ws_b.append(sp[1].w)
        if len(starts_a) >= Q:
            break
    ca, cb = cls_pair
    ndrows = p.dense_spans[0].ndrows
    avgdl = p.dense_spans[0].avgdl
    log(f"classes {cls_pair}, {len(starts_a)} queries, ndrows={ndrows}")

    dfield = sr.device_field("body")
    cache = sr.dense_cache("body")
    pool_a = dfield.dense_words(cache, ca)
    pool_b = dfield.dense_words(cache, cb)
    norms_g = dfield.norms_grid().reshape(ndrows, BLOCK)
    sa = jnp.asarray(np.asarray(starts_a, np.int32))
    sb = jnp.asarray(np.asarray(starts_b, np.int32))
    wa = jnp.asarray(np.asarray(ws_a, np.float32))
    wb = jnp.asarray(np.asarray(ws_b, np.float32))
    ba, bb = 2, 2  # placeholder; real bits from class table
    from iresearch_tpu.formats.bitpack import BITS

    ba, bb = BITS[ca], BITS[cb]
    wpa, wpb_ = words_per_block(ba), words_per_block(bb)
    qn = len(starts_a)

    def sync(x):
        return float(np.asarray(x.reshape(-1)[0]))

    dpool_a = jax.device_put(pool_a)
    dpool_b = jax.device_put(pool_b)
    dnorms = jax.device_put(norms_g)

    def timeit(fn, *args, reps=20):
        out = fn(*args)
        sync(out if isinstance(out, jnp.ndarray) else out[0])
        t1 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out if isinstance(out, jnp.ndarray) else out[0])
        return (time.time() - t1) / reps * 1000

    from iresearch_tpu.search.scorers import score_block

    # (a) current shape: vmap over queries of dynamic_slice + fused scan
    @jax.jit
    def cur(pool_a, pool_b, norms_g, sa, sb, wa, wb):
        def one(s0, s1, w0, w1):
            f0 = unpack_jnp(
                lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa)), ba
            ).astype(jnp.int32).astype(jnp.float32)
            f1 = unpack_jnp(
                lax.dynamic_slice(pool_b, (s1, 0), (ndrows, wpb_)), bb
            ).astype(jnp.int32).astype(jnp.float32)
            dl = norms_g.astype(jnp.int32).astype(jnp.float32)
            sc = score_block(scorer, w0, f0, dl, avgdl, xp=jnp) + score_block(
                scorer, w1, f1, dl, avgdl, xp=jnp
            )
            m = (f0 + f1) > 0
            return jnp.max(jnp.where(m, sc, -jnp.inf), axis=1)

        return jax.vmap(one)(sa, sb, wa, wb)

    log(f"(a) current vmap scan: {timeit(cur, dpool_a, dpool_b, dnorms, sa, sb, wa, wb):.2f} ms")

    # (b) no norms (constant dl)
    @jax.jit
    def nonorm(pool_a, pool_b, sa, sb, wa, wb):
        def one(s0, s1, w0, w1):
            f0 = unpack_jnp(
                lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa)), ba
            ).astype(jnp.int32).astype(jnp.float32)
            f1 = unpack_jnp(
                lax.dynamic_slice(pool_b, (s1, 0), (ndrows, wpb_)), bb
            ).astype(jnp.int32).astype(jnp.float32)
            sc = score_block(
                scorer, w0, f0, jnp.float32(64.0), avgdl, xp=jnp
            ) + score_block(scorer, w1, f1, jnp.float32(64.0), avgdl, xp=jnp)
            m = (f0 + f1) > 0
            return jnp.max(jnp.where(m, sc, -jnp.inf), axis=1)

        return jax.vmap(one)(sa, sb, wa, wb)

    log(f"(b) no-norms vmap scan: {timeit(nonorm, dpool_a, dpool_b, sa, sb, wa, wb):.2f} ms")

    # (c) q-minor tiled: loop over row tiles, norms read once per tile,
    # flat row gather of all queries' span rows for the tile
    TILE = 2048

    @jax.jit
    def tiled(pool_a, pool_b, norms_g, sa, sb, wa, wb):
        dl0 = norms_g.reshape(ndrows // TILE, TILE, BLOCK)

        def body(carry, xs):
            dl_t, base = xs
            dl = dl_t.astype(jnp.int32).astype(jnp.float32)  # [TILE,128]
            rows = base + jnp.arange(TILE, dtype=jnp.int32)
            ia = (sa[:, None] + rows[None, :]).reshape(-1)
            ib = (sb[:, None] + rows[None, :]).reshape(-1)
            f0 = unpack_jnp(pool_a[ia], ba).reshape(
                qn, TILE, BLOCK
            ).astype(jnp.int32).astype(jnp.float32)
            f1 = unpack_jnp(pool_b[ib], bb).reshape(
                qn, TILE, BLOCK
            ).astype(jnp.int32).astype(jnp.float32)
            sc = score_block(
                scorer, wa[:, None, None], f0, dl[None], avgdl, xp=jnp
            ) + score_block(
                scorer, wb[:, None, None], f1, dl[None], avgdl, xp=jnp
            )
            m = (f0 + f1) > 0
            rm = jnp.max(jnp.where(m, sc, -jnp.inf), axis=2)  # [Q, TILE]
            return carry, rm

        bases = jnp.arange(0, ndrows, TILE, dtype=jnp.int32)
        _, rms = lax.scan(body, 0, (dl0, bases))
        return jnp.moveaxis(rms, 0, 1).reshape(qn, ndrows)

    log(f"(c) q-minor tiled scan (TILE={TILE}): {timeit(tiled, dpool_a, dpool_b, dnorms, sa, sb, wa, wb):.2f} ms")




    # (e) single-span scan (span A only): is cost ∝ spans?
    @jax.jit
    def single(pool_a, norms_g, sa, wa):
        def one(s0, w0):
            f0 = unpack_jnp(
                lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa)), ba
            ).astype(jnp.int32).astype(jnp.float32)
            dl = norms_g.astype(jnp.int32).astype(jnp.float32)
            sc = score_block(scorer, w0, f0, dl, avgdl, xp=jnp)
            return jnp.max(jnp.where(f0 > 0, sc, -jnp.inf), axis=1)

        return jax.vmap(one)(sa, wa)

    log(f"(e) single-span vmap scan: {timeit(single, dpool_a, dnorms, sa, wa):.2f} ms")

    # (f) no unpack: score the raw words as if they were f (wrong math,
    # right traffic) — isolates unpack cost. Note output is [Q, ndrows*wpa/128...]
    @jax.jit
    def nounpack(pool_a, norms_g, sa, wa):
        def one(s0, w0):
            words = lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa))
            f0 = (words & np.uint32(3)).astype(jnp.int32).astype(jnp.float32)
            dl = norms_g[:, :wpa].astype(jnp.int32).astype(jnp.float32)
            sc = score_block(scorer, w0, f0, dl, avgdl, xp=jnp)
            return jnp.max(jnp.where(f0 > 0, sc, -jnp.inf), axis=1)

        return jax.vmap(one)(sa, wa)

    log(f"(f) word-space single span (1/{128//wpa} lanes): {timeit(nounpack, dpool_a, dnorms, sa, wa):.2f} ms")

    # (g) word-space FULL unpack: reshape words to [ndrows*wpa/128, 128],
    # loop g slots, keep (8,128)-efficient shapes, no repeat/tile
    ga = 128 // wpa  # slots per word

    @jax.jit
    def wordspace(pool_a, norms_g, sa, wa):
        rows_fold = ndrows * wpa // 128  # [rows_fold, 128] word view
        fold = 128 // wpa  # grid rows per folded row

        def one(s0, w0):
            words = lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa))
            wv = words.reshape(rows_fold, 128)
            acc = jnp.full((rows_fold, 128), -jnp.inf)
            mask = np.uint32((1 << ba) - 1)
            for j in range(ga):
                f = ((wv >> np.uint32(j * ba)) & mask).astype(
                    jnp.int32
                ).astype(jnp.float32)
                # dl for slot j: lanes j*wpa..j*wpa+wpa-1 of each grid row,
                # folded the same way
                dl = norms_g[:, j * wpa : (j + 1) * wpa].reshape(
                    rows_fold, 128
                ).astype(jnp.int32).astype(jnp.float32)
                sc = score_block(scorer, w0, f, dl, avgdl, xp=jnp)
                acc = jnp.maximum(acc, jnp.where(f > 0, sc, -jnp.inf))
            # fold word-level max back to grid rows: each grid row r maps
            # to folded row r//fold, word cols (r%fold)*wpa..+wpa
            return jnp.max(
                acc.reshape(ndrows // fold, fold, fold, wpa), axis=3
            ).transpose(0, 2, 1).max(axis=2).reshape(-1)  # placeholder fold

        return jax.vmap(one)(sa, wa)

    try:
        log(f"(g) word-space full scan single span: {timeit(wordspace, dpool_a, dnorms, sa, wa):.2f} ms")
    except Exception as e:
        log(f"(g) failed: {type(e).__name__} {str(e)[:200]}")

    # (h) precomputed C-grid: denom constant C = c0 + c1*dl materialized
    # once device-side; per query: f + C, div, mul
    kb = scorer.k * scorer.b
    c0 = scorer.k - kb
    Cg = (
        np.maximum(np.asarray(norms_g, np.float32), 1.0) * (kb / avgdl) + c0
    ).astype(np.float32)
    dC = jax.device_put(jnp.asarray(Cg))

    @jax.jit
    def cgrid(pool_a, pool_b, Cr, sa, sb, wa, wb):
        def one(s0, s1, w0, w1):
            f0 = unpack_jnp(
                lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa)), ba
            ).astype(jnp.int32).astype(jnp.float32)
            f1 = unpack_jnp(
                lax.dynamic_slice(pool_b, (s1, 0), (ndrows, wpb_)), bb
            ).astype(jnp.int32).astype(jnp.float32)
            sc = w0 * f0 / (f0 + Cr) + w1 * f1 / (f1 + Cr)
            return jnp.max(jnp.where(sc > 0, sc, -jnp.inf), axis=1)

        return jax.vmap(one)(sa, sb, wa, wb)

    log(f"(h) C-grid 2-span scan: {timeit(cgrid, dpool_a, dpool_b, dC, sa, sb, wa, wb):.2f} ms")



    # (j) single-division fused 2-span score: sc = (w0 f0 d1 + w1 f1 d0)
    # / (d0 d1), mask = sc > 0 (positive scorer, disjunctive)
    @jax.jit
    def onediv(pool_a, pool_b, norms_g, sa, sb, wa, wb):
        def one(s0, s1, w0, w1):
            f0 = unpack_jnp(
                lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa)), ba
            ).astype(jnp.int32).astype(jnp.float32)
            f1 = unpack_jnp(
                lax.dynamic_slice(pool_b, (s1, 0), (ndrows, wpb_)), bb
            ).astype(jnp.int32).astype(jnp.float32)
            dl = norms_g.astype(jnp.int32).astype(jnp.float32)
            kb = scorer.k * scorer.b
            C = (scorer.k - kb) + (kb / avgdl) * dl
            d0 = f0 + C
            d1 = f1 + C
            num = w0 * f0 * d1 + w1 * f1 * d0
            sc = num / (d0 * d1)
            return jnp.max(jnp.where(num > 0, sc, -jnp.inf), axis=1)

        return jax.vmap(one)(sa, sb, wa, wb)

    log(f"(j) single-div 2-span scan: {timeit(onediv, dpool_a, dpool_b, dnorms, sa, sb, wa, wb):.2f} ms")

    # (k) bf16 compute everything except final: just to see the VPU rate
    @jax.jit
    def bf16s(pool_a, pool_b, norms_g, sa, sb, wa, wb):
        def one(s0, s1, w0, w1):
            f0 = unpack_jnp(
                lax.dynamic_slice(pool_a, (s0, 0), (ndrows, wpa)), ba
            ).astype(jnp.int32).astype(jnp.bfloat16)
            f1 = unpack_jnp(
                lax.dynamic_slice(pool_b, (s1, 0), (ndrows, wpb_)), bb
            ).astype(jnp.int32).astype(jnp.bfloat16)
            dl = norms_g.astype(jnp.int32).astype(jnp.bfloat16)
            kb = scorer.k * scorer.b
            C = jnp.bfloat16(scorer.k - kb) + jnp.bfloat16(kb / avgdl) * dl
            d0 = f0 + C
            d1 = f1 + C
            num = w0.astype(jnp.bfloat16) * f0 * d1 + w1.astype(jnp.bfloat16) * f1 * d0
            sc = num / (d0 * d1)
            return jnp.max(jnp.where(num > 0, sc, jnp.bfloat16(-jnp.inf)), axis=1)

        return jax.vmap(one)(sa, sb, wa, wb)

    log(f"(k) bf16 2-span scan: {timeit(bf16s, dpool_a, dpool_b, dnorms, sa, sb, wa, wb):.2f} ms")


if __name__ == "__main__":
    main()
