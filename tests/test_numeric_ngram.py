"""Granular numeric ranges + ngram similarity vs brute-force oracles.

Reference analogs: tests/search/granular_range_filter_tests.cpp,
ngram_similarity_filter_tests.cpp.
"""

import math

import numpy as np
import pytest

from iresearch_tpu.analysis.numeric import (
    granular_term_ranges,
    numeric_terms,
    sortable_u64,
    split_granular_range,
)
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery, search
from iresearch_tpu.search.scorers import BM25, BoostScore
from iresearch_tpu.store.directory import MemoryDirectory


class TestSortable:
    def test_int_order(self):
        vals = [-(2**62), -5, -1, 0, 1, 7, 2**62]
        keys = [sortable_u64(v) for v in vals]
        assert keys == sorted(keys)

    def test_float_order(self):
        vals = [-1e300, -2.5, -0.0, 0.0, 1e-10, 3.14, 1e300]
        keys = [sortable_u64(v) for v in vals]
        assert keys == sorted(keys)


class TestSplit:
    @pytest.mark.parametrize("seed", range(8))
    def test_covers_exactly(self, seed):
        """Every u64 in [lo, hi] is covered by exactly one level range
        (checked on a small universe with step=4 for tractability)."""
        rng = np.random.default_rng(seed)
        lo, hi = sorted(int(x) for x in rng.integers(0, 4096, 2))
        ranges = split_granular_range(lo, hi, step=4)
        # value v is covered by range (s, a, b) iff its level-s cell
        # (v with low s bits zeroed) lies in [a, b] — the bounds are
        # s-aligned by construction
        for v in range(max(0, lo - 20), min(4096, hi + 21)):
            hits = 0
            for shift, a, b in ranges:
                cell = (v >> shift) << shift
                if a <= cell <= b:
                    hits += 1
            assert hits == (1 if lo <= v <= hi else 0), (v, lo, hi, ranges)

    def test_range_count_logarithmic(self):
        ranges = split_granular_range(3, 2**63 + 11, step=16)
        assert len(ranges) <= 3 * (64 // 16)


@pytest.fixture(scope="module")
def num_reader():
    rng = np.random.default_rng(9)
    vals = rng.integers(-1000, 1000, size=300).tolist()
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, v in enumerate(vals):
            w.insert([
                Field("price", int(v), analyzer="numeric"),
                Field("id", str(i), index=True, store=True),
            ])
        w.commit()
    return DirectoryReader.open(d), vals


@pytest.mark.parametrize("lo,hi,il,ih", [
    (-100, 100, True, True),
    (-100, 100, False, False),
    (0, 999, True, False),
    (None, 0, True, True),
    (-5, None, True, True),
    (7, 7, True, True),
])
def test_granular_range_matches_linear_scan(num_reader, lo, hi, il, ih):
    reader, vals = num_reader
    flt = F.ByGranularRange("price", low=lo, high=hi, include_low=il, include_high=ih)
    q = HostQuery(flt, list(reader.segments), BoostScore())
    got = set()
    base = 0
    for s in range(len(q.segments)):
        r = q.execute(s)
        got |= {base + int(d) for d in np.flatnonzero(r.match)}
        base += q.segments[s].num_docs

    def ok(v):
        if lo is not None and (v < lo or (not il and v == lo)):
            return False
        if hi is not None and (v > hi or (not ih and v == hi)):
            return False
        return True

    want = {i for i, v in enumerate(vals) if ok(v)}
    assert got == want


def test_granular_range_device(num_reader):
    from iresearch_tpu.exec import search_device

    reader, vals = num_reader
    flt = F.ByGranularRange("price", low=-50, high=200, scored_terms_limit=4)
    want = search(reader, flt, BM25(), k=15)
    got = search_device(reader, flt, BM25(), k=15)
    from tests.topk_util import assert_topk_equiv

    assert_topk_equiv(got, want)


@pytest.fixture(scope="module")
def text_reader():
    docs = [
        "abc bcd cde def",        # full chain of 4
        "abc cde",                # subsequence len 2
        "def cde bcd abc",        # reversed: chain len 1
        "abc bcd xxx cde def",    # chain 4 with gap
        "xxx yyy zzz",            # nothing
        "abc bcd abc bcd cde def",  # repeated: 2 disjoint chains? at least one
    ]
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, t in enumerate(docs):
            w.insert([Field("body", t, analyzer="segmentation"),
                      Field("id", str(i), index=True, store=True)])
        w.commit()
    return DirectoryReader.open(d), docs


def brute_longest_chain(doc_tokens, ngrams):
    """Oracle: longest subsequence of ngrams at increasing positions."""
    best = 0
    n = len(doc_tokens)

    def rec(qi, pos, ln):
        nonlocal best
        best = max(best, ln)
        if qi >= len(ngrams):
            return
        for q2 in range(qi, len(ngrams)):
            for p in range(pos + 1, n):
                if doc_tokens[p] == ngrams[q2]:
                    rec(q2 + 1, p, ln + 1)

    rec(0, -1, 0)
    return best


@pytest.mark.parametrize("threshold", [0.25, 0.5, 0.75, 1.0])
def test_ngram_similarity_matches_oracle(text_reader, threshold):
    reader, docs = text_reader
    ngrams = ["abc", "bcd", "cde", "def"]
    flt = F.ByNgramSimilarity("body", ngrams, threshold=threshold)
    q = HostQuery(flt, list(reader.segments), BM25())
    r = q.execute(0)
    mm = min(max(math.ceil(len(ngrams) * threshold), 1), len(ngrams))
    for i, text in enumerate(docs):
        L = brute_longest_chain(text.split(), ngrams)
        assert bool(r.match[i]) == (L >= mm), (i, text, L, mm)
        if r.match[i]:
            assert r.score[i] > 0
