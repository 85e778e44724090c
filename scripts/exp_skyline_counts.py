"""Host-only: measure skyline survivor counts on the real 5M segment.

Prints per-category survivor rows (of ndrows) at k=10 so the pruning
gate can be calibrated. Run: python scripts/exp_skyline_counts.py
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
    from iresearch_tpu.formats.spec import TermCols
    from iresearch_tpu.index.segment import SegmentReader
    from iresearch_tpu.search.scorers import BM25, TFIDF

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

    t0 = time.time()
    cache = sr.dense_cache("body")
    log(
        f"dense cache: {len(cache.spans)} terms, ndrows={cache.ndrows} "
        f"({time.time()-t0:.1f}s)"
    )
    avgdl = fp.total_term_freq / max(1, fp.docs_with_field)
    t0 = time.time()
    ski = sr.skyline_index("body", BM25(), avgdl)
    log(f"skyline index built ({time.time()-t0:.1f}s)")

    dfs = fp.entries[:, TermCols.DF].astype(np.int64)
    order = np.argsort(-dfs)
    in_dense = [int(t) for t in order if int(t) in cache.spans]
    log(f"dense terms by df: {len(in_dense)}")

    for k in (10, 100):
        for label, ranks in (
            ("High", range(2, 12)),
            ("Mid", range(40, 50)),
            ("Tail", range(len(in_dense) - 10, len(in_dense))),
        ):
            counts = []
            for r in ranks:
                if r >= len(in_dense):
                    continue
                tid = in_dense[r]
                c, start = cache.spans[tid]
                top = ski.lb_top.get(tid)
                if top is None or k > len(top):
                    counts.append(-1)
                    continue
                w = 1.0
                theta = float(top[k - 1]) * w
                theta_eps = theta * (1.0 - 1e-5) - 1e-30
                cnt = ski.count(c, start, cache.ndrows, theta_eps / w)
                counts.append(cnt)
            log(
                f"k={k} {label}: counts={counts} "
                f"(ndrows={cache.ndrows})"
            )


if __name__ == "__main__":
    main()


def exact_ub_counts():
    """Counts if ub = champion score (exact row max for default BM25)."""
    from iresearch_tpu.formats.segment_io import read_segment
    from iresearch_tpu.formats.spec import TermCols
    from iresearch_tpu.index.segment import SegmentReader
    from iresearch_tpu.search.scorers import BM25, score_block

    cache_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        f"seg_{NUM_DOCS}_{VOCAB}_v5.bin",
    )
    with open(cache_file, "rb") as f:
        data = read_segment(f.read())
    sr = SegmentReader("bench", data)
    fp = data.fields["body"]
    cache = sr.dense_cache("body")
    avgdl = fp.total_term_freq / max(1, fp.docs_with_field)
    sc = BM25()
    dfs = fp.entries[:, TermCols.DF].astype(np.int64)
    order = np.argsort(-dfs)
    in_dense = [int(t) for t in order if int(t) in cache.spans]
    nd = cache.ndrows
    for k in (10, 100):
        for label, ranks in (
            ("High", range(2, 12)),
            ("Mid", range(40, 50)),
        ):
            counts = []
            for r in ranks:
                tid = in_dense[r]
                c, start = cache.spans[tid]
                seg = slice(start, start + nd)
                f_c = cache.f_c[c][seg].astype(np.float32)
                dl_c = np.maximum(cache.dl_c[c][seg].astype(np.float32), 1.0)
                champ = score_block(sc, np.float32(1.0), f_c, dl_c, avgdl, xp=np)
                top = -np.partition(-champ, k - 1)[:k]
                theta = float(np.sort(top)[0])
                theta_eps = theta * (1 - 1e-5) - 1e-30
                counts.append(int((champ >= theta_eps).sum()))
            log(f"EXACT-UB k={k} {label}: counts={counts} (ndrows={nd})")


if os.environ.get("EXACT_UB"):
    exact_ub_counts()
    sys.exit(0)
