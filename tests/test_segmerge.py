"""Device-side cross-segment merge (exec/segmerge.py) vs host merge.

MergedBatch.run() must equal the host-merge reference
(QueryBatch.search) exactly: same global docs in deterministic
(score desc, doc asc) order, scores to float tolerance. Covers the
multi-segment bench path (bench.py BENCH_SEG_DOCS) through library
code.
"""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory

WORDS = [
    "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "ten",
]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(11)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(300):
            n = int(rng.integers(2, 15))
            idx = np.minimum(rng.zipf(1.5, size=n) - 1, len(WORDS) - 1)
            w.insert([
                Field(
                    "body",
                    " ".join(WORDS[j] for j in idx),
                    analyzer="segmentation",
                )
            ])
            if i in (90, 210):
                w.commit()  # three segments of different sizes
        w.commit()
    return DirectoryReader.open(d)


def _filters():
    return (
        [F.ByTerm("body", w) for w in WORDS[:6]]
        + [F.Or(F.ByTerm("body", "one"), F.ByTerm("body", "nine"))]
        + [F.And(F.ByTerm("body", "one"), F.ByTerm("body", "three"))]
        + [F.Or(*[F.ByTerm("body", w) for w in WORDS[:4]])]
    )


@pytest.mark.parametrize("scorer", [BM25(), TFIDF()])
def test_merged_batch_equals_host_merge(reader, scorer):
    from iresearch_tpu.exec.batch import QueryBatch

    segs = list(reader.segments)
    assert len(segs) == 3
    k = 7
    qb = QueryBatch(_filters(), segs, scorer, wand=True)
    got = qb.prepare_all(k).search(k)
    ref = qb.search(k)
    for qi, (g, r) in enumerate(zip(got, ref)):
        assert len(g) == len(r), (qi, g, r)
        for j, ((gd, gv), (rd, rv)) in enumerate(zip(g, r)):
            assert gd == rd, (qi, j, g, r)
            assert gv == pytest.approx(rv, rel=1e-5), (qi, j, g, r)


def test_merged_batch_deterministic_tie_order(reader):
    """Equal-score docs must come out (score desc, doc asc) — the
    per-segment top-k emits survivor-row order, the merge restores the
    engine-wide deterministic order."""
    from iresearch_tpu.exec.batch import QueryBatch

    segs = list(reader.segments)
    qb = QueryBatch(_filters(), segs, BM25(), wand=True)
    res = qb.prepare_all(10).search(10)
    for q in res:
        for (d0, v0), (d1, v1) in zip(q, q[1:]):
            assert v0 > v1 or (v0 == v1 and d0 < d1), q


def test_merged_batch_rejects_int32_overflow():
    from iresearch_tpu.exec.segmerge import MergedBatch

    with pytest.raises(ValueError):
        MergedBatch([object(), object()], [2**30, 2**30 + 7])
