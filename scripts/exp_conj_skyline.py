"""Host-only: would a conjunctive skyline prune AndHighMed at 5M docs?

For a sample of AndHighMed pairs (the bench mix), compute the TRUE k-th
conjunction score (numpy oracle) and count grid rows whose summed
per-span upper bounds clear it (plus the both-spans-present row mask).
If the survivor counts are O(100s), a device conj-skyline (θ from a
top-ub-row sample pass, survivor gather + exact rescore) replaces the
14 ms full conj scan; if they are O(10k), the scan stays.

Run: MALLOC_MMAP_MAX_=0 MALLOC_TRIM_THRESHOLD_=-1 \
     JAX_PLATFORMS=cpu python scripts/exp_conj_skyline.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

NUM_DOCS = int(os.environ.get("BENCH_DOCS", 5_000_000))
VOCAB = 30_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from iresearch_tpu.formats.segment_io import read_segment
    from iresearch_tpu.index.segment import SegmentReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.host_eval import HostQuery
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.exec import DeviceQuery

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

    tv = sr.terms("body")
    terms = [tv[i] for i in range(len(tv))]
    dfs = fp.entries[:, 0].astype(np.int64)
    order = np.argsort(-dfs)

    def term_at(rank):
        return terms[order[min(rank, len(order) - 1)]].decode()

    scorer = BM25()
    K = 10
    for j in range(0, 80, 10):
        h, m = term_at(2 + j), term_at(200 + j)
        flt = F.And(F.ByTerm("body", h), F.ByTerm("body", m))
        t1 = time.time()
        hits = HostQuery(flt, [sr], scorer).top_k(K)
        theta = hits[-1][1] if len(hits) >= K else 0.0
        t_oracle = time.time() - t1
        # plan gives the dense spans (cls/start/w per term)
        dq = DeviceQuery(flt, [sr], scorer)
        plan = dq.plan_for_k(0, K)
        spans = plan.dense_spans
        if len(spans) != 2:
            log(f"{h} AND {m}: not 2 dense spans ({len(spans)}) — skip")
            continue
        ski = sr.skyline_index("body", scorer, spans[0].avgdl)
        ndrows = spans[0].ndrows
        ub_sum = np.zeros(ndrows, np.float64)
        present = np.ones(ndrows, bool)
        for ds in spans:
            ub_c = ski.ub[ds.cls]
            seg_ub = ub_c[ds.start : ds.start + ndrows]
            ub_sum += float(ds.w) * seg_ub
            present &= seg_ub > 0.0
        te = theta * (1.0 - 1e-5)
        surv = int(np.count_nonzero((ub_sum >= te) & present))
        both = int(np.count_nonzero(present))
        # how good is a theta from the top-T ub rows only?
        for T in (512, 2048):
            top_rows = np.argpartition(-ub_sum, T)[:T]
            # exact conj scores on those rows via the oracle's doc sets
            log(f"  (T={T} top-ub rows contain {np.count_nonzero(np.isin(top_rows, np.array([d // 128 for d, _s in hits])))}/{K} true winners' rows)")
        log(
            f"{h} AND {m}: theta={theta:.4f} survivors={surv} rows "
            f"(both-present {both}/{ndrows}) oracle={t_oracle:.1f}s"
        )


if __name__ == "__main__":
    main()
