"""Driver benchmark: BM25 top-10 query throughput on the real chip.

Mirrors the reference harness shape (scripts/search-benchmark.sh +
utils/index-search.cpp task categories): build an index over a Zipf
synthetic corpus, run a luceneutil-style task mix (High/Med/LowTerm,
AndHighMed, OrHighMed, Prefix), report aggregate QPS.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is QPS / 10_000 (the BASELINE.json >=10k QPS/chip north star;
the reference publishes no absolute numbers to compare against, see
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

# glibc heap-reuse tuning: this CI host's kernel zeroes anonymous pages at
# ~0.1 GB/s (folio_zero_user; host-level), while rewrites of already-faulted
# pages run at ~8 GB/s. With default malloc, every large numpy buffer is a
# fresh mmap -> freed back to the OS -> re-faulted at 0.1 GB/s next time.
# Forcing all allocations onto the brk heap (never mmap, never trim) pays
# first-touch once for the peak resident set instead of for the total
# allocation traffic (~25 GB for the 5M-doc build). Harmless on healthy
# hosts; opt out with BENCH_NO_MALLOC_TUNE=1.
if (
    os.environ.get("MALLOC_MMAP_MAX_") is None
    and not os.environ.get("BENCH_NO_MALLOC_TUNE")
):
    _env = dict(
        os.environ, MALLOC_MMAP_MAX_="0", MALLOC_TRIM_THRESHOLD_="-1"
    )
    os.execve(sys.executable, [sys.executable] + sys.argv, _env)

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# default corpus = the reference's CANONICAL 5M-doc run
# (scripts/index-benchmark.sh:9-29); BENCH_DOCS=50000 is the quick
# smoke-test escape hatch. The segment build caches under .bench_cache
# (one-time ~10-15 min host build), and the jit cache under .jax_cache
# makes repeat runs start in seconds.
NUM_DOCS = int(__import__("os").environ.get("BENCH_DOCS", 5_000_000))
# Corpora beyond SEG_DOCS split into segments of SEG_DOCS docs each —
# the shape a real index has after tiered consolidation (the reference
# caps segments via ConsolidateTier; a 25M-doc reference index is also
# several segments), and the shape that keeps doc*pos_cap positional
# keys inside int31 (CLAUDE.md) at 10M+ docs.
SEG_DOCS = int(__import__("os").environ.get("BENCH_SEG_DOCS", 5_000_000))
VOCAB = 30_000
K = 10


def build_corpus(num_docs=NUM_DOCS, seed=42):
    """Zipf(1.25) token ids clipped to VOCAB, sampled by inverse CDF.

    The clipped zipf IS a finite categorical (P(k) ∝ k^-1.25 for k <
    VOCAB, the whole tail mass on the last id), so searchsorted over its
    CDF samples the identical distribution ~100x faster than
    ``rng.zipf`` rejection sampling (45 min for the 317M-token corpus on
    a 1-vCPU host; ~20 s this way). Same law as the round-1/2 corpora;
    sample paths differ.
    """
    rng = np.random.default_rng(seed)
    lens = rng.integers(32, 96, size=num_docs)
    total = int(lens.sum())
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    pmf = ranks ** -1.25
    try:
        from scipy.special import zeta

        tail = float(zeta(1.25)) - float(pmf.sum())
    except Exception:  # integral upper bound of the zeta tail
        tail = (VOCAB ** -0.25) / 0.25
    pmf[-1] += max(tail, 0.0)
    cdf = np.cumsum(pmf)
    cdf /= cdf[-1]
    tids = np.searchsorted(cdf, rng.random(total)).astype(np.int64)
    return lens, tids


def main():
    t0 = time.time()
    # persistent jit cache: repeat bench runs skip the 15-60s compile phase
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            __import__("os").path.join(
                __import__("os").path.dirname(__file__) or ".", ".jax_cache"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    from iresearch_tpu.formats.postings import encode_field_postings
    from iresearch_tpu.formats.spec import IndexFeatures
    from iresearch_tpu.index.invert import invert_numpy
    from iresearch_tpu.index.segment import SegmentData, SegmentReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.exec import DeviceQuery

    # index cache: the host build of the synthetic index is O(minutes) at
    # 5M docs on one CPU; cache the encoded segment so repeat bench runs
    # (and the timed QPS phase, which never includes build time) skip it
    cache_dir = __import__("os").path.join(
        __import__("os").path.dirname(__file__) or ".", ".bench_cache"
    )
    seg_sizes = [
        min(SEG_DOCS, NUM_DOCS - i * SEG_DOCS)
        for i in range(-(-NUM_DOCS // SEG_DOCS))
    ]

    def build_segment(si: int, n: int):
        """Load-or-build one segment of n docs (seed 42+si). Segment 0's
        cache name matches the legacy single-segment file so a 10M-doc
        run reuses the 5M-doc run's build."""
        suffix = "" if si == 0 else f"_s{42 + si}"
        cache_file = __import__("os").path.join(
            cache_dir, f"seg_{n}_{VOCAB}_v5{suffix}.bin"
        )
        if __import__("os").path.exists(cache_file):
            from iresearch_tpu.formats.segment_io import read_segment

            with open(cache_file, "rb") as f:
                data = read_segment(f.read())
            log(f"segment {si} loaded from cache ({time.time()-t0:.1f}s)")
            return data
        lens, tids = build_corpus(n, seed=42 + si)
        doc_of_tok = np.repeat(np.arange(n), lens)
        # vectorized within-doc positions (a per-doc loop crawls at 5M docs)
        starts = np.cumsum(lens) - lens
        pos_of_tok = (
            np.arange(len(tids), dtype=np.int64) - np.repeat(starts, lens)
        ).astype(np.uint32)
        log(
            f"segment {si} corpus: {n} docs, {len(tids)} tokens "
            f"({time.time()-t0:.1f}s)"
        )

        # vocab: term id t spelled as zero-padded decimal so order is stable
        inv = invert_numpy(tids, doc_of_tok, pos_of_tok, VOCAB, n)
        present = np.flatnonzero(np.diff(inv.term_ptr) > 0)
        terms_l = [b"t%06d" % t for t in present]
        blob = b"".join(terms_l)
        offs = np.zeros(len(terms_l) + 1, np.uint64)
        offs[1:] = np.cumsum([len(t) for t in terms_l])
        # compact term_ptr to present terms only
        tp = np.concatenate([inv.term_ptr[present], [inv.term_ptr[-1]]])
        fpn = encode_field_postings(
            inv.e_doc, inv.e_freq, tp, blob, offs, inv.norms, inv.pos_flat,
            IndexFeatures.FREQ | IndexFeatures.POS,
        )
        data = SegmentData(n, {"body": fpn}, {})
        try:
            from iresearch_tpu.formats.segment_io import write_segment

            __import__("os").makedirs(cache_dir, exist_ok=True)
            with open(cache_file, "wb") as f:
                f.write(write_segment(data))
        except Exception as e:  # cache is best-effort
            log(f"cache write skipped: {e}")
        return data

    seg_data = [build_segment(si, n) for si, n in enumerate(seg_sizes)]
    srs = [SegmentReader(f"bench{si}", d) for si, d in enumerate(seg_data)]
    sr = srs[0]
    fp = seg_data[0].fields["body"]
    ntokens = sum(d.fields["body"].total_term_freq for d in seg_data)
    tv = sr.terms("body")
    terms = [tv[i] for i in range(len(tv))]
    # honest all-in memory ledger: postings + positions + term dict + meta
    pool_bytes = nrm_bytes = pos_bytes = dict_bytes = meta_bytes = 0
    for d in seg_data:
        f_ = d.fields["body"]
        pool_bytes += sum(a.nbytes for a in f_.doc_words + f_.freq_words)
        nrm_bytes += sum(a.nbytes for a in f_.nrm_words) if f_.nrm_words else 0
        pos_bytes += sum(a.nbytes for a in f_.pos_words) if f_.pos_words else 0
        dict_bytes += len(f_.term_blob) + f_.term_offsets.nbytes
        meta_bytes += sum(
            a.nbytes for a in f_.base + f_.bmax + f_.bmaxf
        ) + f_.entries.nbytes + f_.norms.nbytes
    total_bytes = pool_bytes + nrm_bytes + pos_bytes + dict_bytes + meta_bytes
    log(
        f"index built ({time.time()-t0:.1f}s): {len(srs)} segment(s), "
        f"postings {pool_bytes/1e6:.1f}MB + inline norms {nrm_bytes/1e6:.1f}MB "
        f"+ positions {pos_bytes/1e6:.1f}MB "
        f"+ dict {dict_bytes/1e6:.1f}MB + meta {meta_bytes/1e6:.1f}MB "
        f"= {total_bytes/1e6:.1f}MB all-in "
        f"({8*total_bytes/max(1,ntokens):.2f} bits/token; "
        f"postings-only {8*pool_bytes/max(1,ntokens):.2f})"
    )

    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return terms[order[min(rank, len(order) - 1)]].decode()

    # 80 distinct queries per category (400 total per batch pass): the
    # throughput serving shape — one fused dispatch amortizes launch and
    # relay overhead across the whole batch
    high = [term_at(i) for i in range(2, 82)]
    med = [term_at(i) for i in range(200, 280)]
    low = [term_at(i) for i in range(2000, 2080)]
    tasks = []
    tasks += [("HighTerm", F.ByTerm("body", t)) for t in high]
    tasks += [("MedTerm", F.ByTerm("body", t)) for t in med]
    tasks += [("LowTerm", F.ByTerm("body", t)) for t in low]
    tasks += [
        ("AndHighMed", F.And(F.ByTerm("body", h), F.ByTerm("body", m)))
        for h, m in zip(high, med)
    ]
    tasks += [
        ("OrHighMed", F.Or(F.ByTerm("body", h), F.ByTerm("body", m)))
        for h, m in zip(high, med)
    ]

    scorer = BM25()

    # The dev-relay acks dispatches at ENQUEUE: block_until_ready returns
    # before compute completes, so honest timing must end with a real d2H
    # sync (fetching a scalar forces completion of everything enqueued).
    # Measure the fixed fetch round-trip first so per-query numbers can be
    # reported with and without it (a PCIe-local host has ~us RTT).
    def sync(arr):
        return float(np.asarray(arr.reshape(-1)[0]))

    import jax.numpy as jnp
    tiny = jnp.zeros(8, jnp.float32) + 1.0
    sync(tiny)
    rtts = []
    for _ in range(5):
        t2 = time.time()
        sync(tiny * 1.0)
        rtts.append(time.time() - t2)
    rtt = sorted(rtts)[2]
    log(f"relay d2h round-trip: {rtt*1000:.1f} ms (excluded where noted)")

    nseg = len(srs)
    from iresearch_tpu.exec.batch import QueryBatch

    def prep_single(flt, wand=False):
        """A run() enqueuing the FULL global query: every segment's
        dispatch plus the fused device merge for multi-segment indexes
        (ADVICE r4 item 2: latency loops must include the merge), or the
        single-segment DeviceQuery fast path."""
        if nseg == 1:
            dq_ = DeviceQuery(flt, srs, scorer, wand=wand)
            return lambda: dq_.execute_segment_async(0, K)[0]
        mb_ = QueryBatch([flt], srs, scorer, wand=wand).prepare_all(K)
        return lambda: mb_.run()[0]

    # single-query serving latency, amortized over a completion-synced
    # run (per query = all segments + device merge)
    run_single = prep_single(F.ByTerm("body", high[0]))
    sync(run_single())  # compile + warm
    t2 = time.time()
    n_lat = 100
    for _ in range(n_lat):
        v = run_single()
    sync(v)
    lat = (time.time() - t2 - rtt) / n_lat
    log(
        f"single-query device time (completion-synced, amortized over "
        f"{n_lat}): {lat*1000:.3f} ms (HighTerm)"
    )

    # latency percentiles (BASELINE north-star row "p99 tracked"): each
    # query individually completion-synced, so every sample carries one
    # full relay d2h fetch — report raw and rtt-subtracted. On a
    # PCIe-local host the raw percentiles ARE the serving latency; through
    # the relay the subtracted column is the engine-side bound and the
    # raw column is dominated by relay fetch variance.
    samples = []
    for _ in range(60):
        t2 = time.time()
        v = run_single()
        sync(v)
        samples.append(time.time() - t2)
    qs = np.quantile(np.array(samples), [0.5, 0.95, 0.99])
    log(
        "single-query latency percentiles (per-query sync, HighTerm): "
        f"p50 {qs[0]*1000:.1f} / p95 {qs[1]*1000:.1f} / p99 {qs[2]*1000:.1f} ms raw; "
        f"rtt-subtracted p50 {(qs[0]-rtt)*1000:.2f} / p99 {(qs[2]-rtt)*1000:.2f} ms"
    )

    # breadth categories: phrase on device, prefix/fuzzy expansions, wand.
    # Prefix matches luceneutil Prefix3 selectivity: a 3-char prefix over
    # a RARE term band ("t01" = ranks 10k-20k). Prefixing the hottest ids
    # ("t00") would cover ~95% of all corpus postings — a tail workload no
    # engine serves fast (the reference's bitset union walks the same
    # postings); it is reported separately as PrefixHot.
    # scored_terms_limit=16 mirrors the reference's canonical search run
    # (scripts/search-benchmark.sh:10-25 --scored-terms-limit 16)
    extras = [
        ("Phrase", F.ByPhrase("body", [term_at(30), term_at(31)])),
        # conjunction tail (VERDICT r4 item 1: the 5M table must include
        # AndHigh*): skyline-And / conj fused scan territory
        (
            "AndHighHigh",
            F.And(F.ByTerm("body", term_at(3)), F.ByTerm("body", term_at(5))),
        ),
        (
            "AndHighMed",
            F.And(F.ByTerm("body", high[1]), F.ByTerm("body", med[1])),
        ),
        (
            "AndHighLow",
            F.And(F.ByTerm("body", high[2]), F.ByTerm("body", low[2])),
        ),
        ("Prefix", F.ByPrefix("body", "t01", scored_terms_limit=16)),
        (
            "Fuzzy1",
            F.ByEditDistance(
                "body", term_at(50), max_distance=1, scored_terms_limit=16
            ),
        ),
        ("OrHigh4+WAND", F.Or(*[F.ByTerm("body", t) for t in high[:4]])),
        # luceneutil MinMatch2High2Med (index-search.cpp:93-143): skyline
        # min_match pruning (count>=2 survivor rows + host-rescored θ)
        (
            "MinMatch2High2Med",
            F.Or(
                F.ByTerm("body", high[3]), F.ByTerm("body", high[4]),
                F.ByTerm("body", med[3]), F.ByTerm("body", med[4]),
                min_match=2,
            ),
        ),
    ]
    if NUM_DOCS >= 1_000_000:
        extras.append(
            ("PrefixHot", F.ByPrefix("body", "t00", scored_terms_limit=16))
        )
    for name, flt in extras:
        reps = 3 if name == "PrefixHot" else 20
        try:
            run_x = prep_single(flt, wand=(name == "OrHigh4+WAND"))
            sync(run_x())
            t2 = time.time()
            for _ in range(reps):
                v = run_x()
            sync(v)
            log(f"{name}: {(time.time()-t2-rtt)/reps*1000:.3f} ms/query (completion-synced)")
        except Exception as e:  # a tail category must not kill the QPS phases
            log(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})")

    qb = QueryBatch([flt for _, flt in tasks], srs, scorer, wand=True)

    # multi-segment batched execution: dispatch every segment's fused
    # program per pass, then ONE fused assemble+merge dispatch producing
    # the global [Q,k] top-k ON DEVICE (exec/segmerge.py) — nothing
    # crosses to host until the block sync.
    if nseg == 1:
        prep = qb.prepare(0, K)
        ngroups = len(prep._calls)

        def run_pass():
            return prep.run_grouped()[-1][0]
    else:
        mb = qb.prepare_all(K)
        ngroups = len(mb.preps[0]._calls)
        run_pass = mb.run

    # warmup: compile every batch signature
    tw = time.time()
    res_v, res_d = run_pass()
    sync(res_v)
    log(
        f"warmup/compile done ({time.time()-tw:.1f}s, "
        f"{nseg}x{ngroups} dispatch groups)"
    )

    if nseg > 1 and os.environ.get("BENCH_VERIFY_MERGE"):
        # opt-in exactness check of the fused device merge against the
        # host-merge reference path (QueryBatch.search): same docs in
        # order, scores to 1e-5. Off by default: search() fetches every
        # per-query array (hundreds of relay round-trips).
        ref = qb.search(K)
        got_v = np.asarray(res_v)
        got_d = np.asarray(res_d)
        for qi, ref_q in enumerate(ref):
            n_ref = len(ref_q)
            finite = np.isfinite(got_v[qi])
            assert int(finite.sum()) == n_ref, (qi, int(finite.sum()), n_ref)
            for j, (rd, rv) in enumerate(ref_q):
                assert int(got_d[qi, j]) == rd, (qi, j, int(got_d[qi, j]), rd)
                assert abs(got_v[qi, j] - rv) <= 1e-5 * max(1.0, abs(rv)), (
                    qi, j, float(got_v[qi, j]), rv
                )
        log(f"device merge verified vs host merge over {len(ref)} queries")

    # timed run (batched dispatch, the TPU-native serving shape): enqueue
    # blocks of passes, then force completion with a real sync — queries
    # only count once their top-k exists on device. Periodic syncs also
    # bound the relay queue (a huge unsynced backlog can wedge the relay).
    # The enqueue depth adapts to the measured relay d2h RTT: the fetch is
    # a FIXED relay artifact (µs on a PCIe-local host; 5-180 ms observed
    # through the dev relay depending on its health), so each block must
    # carry enough real work that the artifact stays a small fraction of
    # elapsed — otherwise the loop measures the relay, not the engine.
    # One synced 8-pass block calibrates per-pass cost; depth is then
    # sized so the RTT is ≤ ~1/8 of block wall, capped at 64 passes
    # (≈ 10^3 dispatches) to bound the unsynced backlog.
    tc = time.time()
    for _ in range(8):
        res_v, _res_d = run_pass()
    sync(res_v)
    per_pass = max((time.time() - tc - rtt) / 8, 1e-4)
    BLOCK_PASSES = int(min(64, max(8, round(7 * rtt / per_pass))))
    log(
        f"calibration: {per_pass*1000:.1f} ms/pass enqueue+compute, "
        f"rtt {rtt*1000:.1f} ms -> BLOCK_PASSES={BLOCK_PASSES}"
    )
    t1 = time.time()
    nq = 0
    while True:
        for _ in range(BLOCK_PASSES):
            res_v, _res_d = run_pass()
            nq += len(tasks)
        sync(res_v)
        elapsed = time.time() - t1
        log(f"  {nq} queries complete at {elapsed:.2f}s")
        if elapsed >= 2.0 or nq >= 500 * len(tasks):
            break
    qps = nq / elapsed
    log(f"{nq} queries in {elapsed:.2f}s -> {qps:.1f} QPS (completion-synced)")

    # serving-shaped bench (VERDICT r1 item 7): FRESH query strings each
    # round — filter build + prepare (host term lookup, stats, plan
    # compile) + row upload + dispatch + completion. The batched number
    # above is the dispatch-only hot path; the gap is host prepare cost
    # (Python; amortizable by caching prepared queries server-side).
    def serve_batch(rot, do_sync=True):
        fresh = []
        for j in range(25):
            a = term_at(2 + (rot + j) % 600)
            b = term_at(200 + (rot + j) % 1200)
            fresh.append(F.ByTerm("body", a))
            fresh.append(F.And(F.ByTerm("body", a), F.ByTerm("body", b)))
        qb2 = QueryBatch(fresh, srs, scorer, wand=True)
        if nseg == 1:
            res2 = qb2.prepare(0, K).run_grouped()
            last = res2[-1][0][0]
        else:  # prepare + dispatch + fused device merge across segments
            last, _ld = qb2.prepare_all(K).run()
        if do_sync:
            sync(last)
        return len(fresh), last

    # warm the rotation set's jit signatures once (steady-state server),
    # then time fresh filter objects over the same term shapes: prepare,
    # plan, packed upload, dispatch, completion all inside the loop.
    # Completion is forced once per rotation cycle: the d2h fetch is a
    # fixed ~30-180 ms RELAY artifact per call (µs on a PCIe-local host),
    # so syncing per batch would measure the relay, not the engine —
    # queries still only count once their cycle's results exist on device.
    rots = [0, 37, 74, 111]
    for r in rots:
        serve_batch(r)
    t3 = time.time()
    nserve = 0
    while time.time() - t3 < 3.0:
        pend = 0
        for _ in range(4):  # bounded enqueue depth, like the batched phase
            for r in rots:
                n, last2 = serve_batch(r, do_sync=False)
                pend += n
        sync(last2)
        nserve += pend
    serve_el = time.time() - t3
    log(
        f"serving-shaped (new query strings end-to-end incl. prepare, warm "
        f"jit cache): {nserve} queries in {serve_el:.2f}s -> "
        f"{nserve/serve_el:.1f} QPS"
    )

    # no-silent-caps: surface every bounded behavior hit during the run
    from iresearch_tpu.utils.metrics import registry

    for (name, labels), v in sorted(registry()._counters.items()):
        log(f"cap counter {name}{dict(labels) or ''}: {v:g}")

    print(json.dumps({
        "metric": "bm25_top10_qps_single_chip",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / 10_000.0, 4),
    }))


if __name__ == "__main__":
    main()
