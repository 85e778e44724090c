"""Cross-segment merged term dictionary (index/multidict.py).

One DFA intersect against the merged view must produce the SAME
expansion (hit sets, dfs, boosts) as S per-segment intersections —
the amortized-multiterm-prepare path of VERDICT r4 item 2 (reference:
cached multiterm state, multiterm_query.hpp).
"""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.expand import expand_leaf
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MemoryDirectory

from tests.topk_util import assert_topk_equiv


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(17)
    words = [f"term{i:04d}" for i in range(400)] + [
        "apple", "apply", "appel", "ample", "maple",
    ]
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(900):
            n = int(rng.integers(3, 20))
            idx = rng.integers(0, len(words), n)
            w.insert([
                Field("body", " ".join(words[j] for j in idx),
                      analyzer="segmentation")
            ])
            if i in (300, 600):
                w.commit()  # 3 segments with overlapping dictionaries
        w.commit()
    return DirectoryReader.open(d)


def test_merged_dict_structure(reader):
    from iresearch_tpu.index.multidict import merged_dict

    segs = list(reader.segments)
    assert len(segs) == 3
    md = merged_dict(segs, "body")
    assert md is not None
    # every merged term maps back to the right per-segment tid
    for mid in range(0, md.num_terms, 37):
        term = md.term(mid)
        for s, sr in enumerate(segs):
            tid = int(md.seg_tid[s, mid])
            want = sr.lookup_term("body", term)
            assert tid == (-1 if want is None else want)
    # cached: same object on re-request
    assert merged_dict(segs, "body") is md
    # prefix range matches a brute scan
    lo, hi = md.prefix_range(b"term01")
    terms = [md.term(i) for i in range(md.num_terms)]
    want = [t for t in terms if t.startswith(b"term01")]
    assert [md.term(i) for i in range(lo, hi)] == want


def _expansion_key(exp):
    scored = sorted(
        (h.seg, h.tid, h.df, round(h.boost, 9), h.key) for h in exp.scored
    )
    unscored = sorted(
        (h.seg, h.tid) for h in exp.unscored
    )
    return scored, unscored, dict(exp.stats_df)


@pytest.mark.parametrize(
    "flt",
    [
        F.ByEditDistance("body", b"apple", max_distance=1),
        F.ByEditDistance("body", b"apple", max_distance=2,
                         with_transpositions=True),
        F.ByEditDistance("body", b"term0101", max_distance=1),
        F.ByWildcard("body", b"%ppl%"),
        F.ByWildcard("body", b"term0_0%"),
    ],
    ids=["fuzzy1", "fuzzy2t", "fuzzy-num", "wc-infix", "wc-mixed"],
)
def test_merged_expansion_matches_per_segment(reader, flt, monkeypatch):
    segs = list(reader.segments)
    merged = expand_leaf(flt, segs)
    from iresearch_tpu.index import multidict

    monkeypatch.setattr(multidict, "MERGED_DICT_MAX", 0)
    per_seg = expand_leaf(flt, segs)
    # scored sets may tie-break differently (visit-order policy); the
    # HIT sets, per-hit dfs and boosts must agree exactly
    def all_hits(exp):
        return sorted(
            (h.seg, h.tid, h.df, round(h.boost, 9))
            for h in exp.scored + exp.unscored
        )

    assert all_hits(merged) == all_hits(per_seg)


def test_fuzzy_query_exact_with_merged_dict(reader):
    """End-to-end: fuzzy search over 3 segments with the merged-dict
    expansion matches the oracle."""
    from iresearch_tpu.exec.batch import QueryBatch

    segs = list(reader.segments)
    flt = F.ByEditDistance("body", b"apple", max_distance=1)
    qb = QueryBatch([flt], segs, BM25())
    got_v, got_d = qb.prepare_all(10).run()
    got = [
        (int(d), float(v))
        for v, d in zip(np.asarray(got_v)[0], np.asarray(got_d)[0])
        if np.isfinite(v)
    ]
    want = HostQuery(flt, segs, BM25()).top_k(10)
    assert_topk_equiv(got, want)


def test_size_cap_counter(reader, monkeypatch):
    from iresearch_tpu.index import multidict
    from iresearch_tpu.utils.metrics import registry

    monkeypatch.setattr(multidict, "MERGED_DICT_MAX", 1)
    multidict._cache.clear()
    before = registry()._counters.get(("irs_merged_dict_skipped", ()), 0)
    assert multidict.merged_dict(list(reader.segments), "body") is None
    after = registry()._counters.get(("irs_merged_dict_skipped", ()), 0)
    assert after == before + 1
