"""Fused dense-scan kernel vs the straightforward numpy computation."""

import numpy as np
import pytest

import jax

from iresearch_tpu.formats.bitpack import BITS, pack_blocks
from iresearch_tpu.formats.spec import BLOCK
from iresearch_tpu.ops.dense_scan import dense_scan_rowmax, dense_scan_topk
from iresearch_tpu.search.scorers import BM25, TFIDF

INTERP = jax.default_backend() == "cpu"


def _mk_span(rng, ndrows, bits):
    freqs = rng.integers(0, 1 << bits, size=(ndrows, BLOCK)).astype(np.uint32)
    # make some rows empty so -inf rows are exercised
    freqs[rng.integers(0, ndrows, size=max(1, ndrows // 4))] = 0
    return freqs, pack_blocks(freqs, bits)


@pytest.mark.parametrize("scorer", [BM25(), TFIDF()], ids=["bm25", "tfidf"])
@pytest.mark.parametrize("span_bits", [(4,), (8, 4), (2, 8, 16)])
def test_rowmax_matches_numpy(scorer, span_bits):
    rng = np.random.default_rng(5)
    ndrows = 64
    spans = [_mk_span(rng, ndrows, b) for b in span_bits]
    ws = [1.0 + 0.5 * i for i in range(len(span_bits))]
    norms = rng.integers(1, 90, size=(ndrows, BLOCK)).astype(np.float32)
    avgdl = 47.3

    from iresearch_tpu.search.scorers import score_block

    total = np.zeros((ndrows, BLOCK), np.float32)
    fsum = np.zeros((ndrows, BLOCK), np.float32)
    for (freqs, _), w in zip(spans, ws):
        f = freqs.astype(np.float32)
        total += score_block(scorer, np.float32(w), f, norms, avgdl, xp=np)
        fsum += f
    expect = np.where(fsum > 0, total, -np.inf)
    want_max = expect.max(axis=1)
    want_arg = expect.argmax(axis=1)

    got_max, got_arg = dense_scan_rowmax(
        tuple(p for _, p in spans),
        tuple(np.float32(w) for w in ws),
        norms,
        np.float32(avgdl),
        scorer=scorer,
        span_bits=span_bits,
        interpret=INTERP,
    )
    np.testing.assert_allclose(
        np.asarray(got_max), want_max, rtol=1e-5, atol=1e-6
    )
    finite = np.isfinite(want_max)
    np.testing.assert_array_equal(np.asarray(got_arg)[finite], want_arg[finite])


@pytest.mark.parametrize("k", [1, 10, 40])
def test_topk_matches_sorted(k):
    rng = np.random.default_rng(9)
    ndrows = 32
    span_bits = (8, 4)
    spans = [_mk_span(rng, ndrows, b) for b in span_bits]
    ws = [1.0, 2.5]
    norms = rng.integers(1, 90, size=(ndrows, BLOCK)).astype(np.float32)
    avgdl = 31.0

    from iresearch_tpu.search.scorers import score_block

    total = np.zeros((ndrows, BLOCK), np.float32)
    fsum = np.zeros((ndrows, BLOCK), np.float32)
    for (freqs, _), w in zip(spans, ws):
        f = freqs.astype(np.float32)
        total += score_block(scorer=BM25(), weights=np.float32(w), freqs=f,
                             dl=norms, avgdl=avgdl, xp=np)
        fsum += f
    flat = np.where(fsum > 0, total, -np.inf).reshape(-1)
    order = sorted(range(len(flat)), key=lambda i: (-flat[i], i))
    want = [(flat[i], i) for i in order[:k] if np.isfinite(flat[i])]

    vals, docs = dense_scan_topk(
        tuple(p for _, p in spans),
        tuple(np.float32(w) for w in ws),
        norms,
        np.float32(avgdl),
        scorer=BM25(),
        span_bits=span_bits,
        k=k,
        interpret=INTERP,
    )
    vals = np.asarray(vals)
    docs = np.asarray(docs)
    for i, (wv, wd) in enumerate(want):
        assert vals[i] == pytest.approx(wv, rel=1e-6), i
        assert docs[i] == wd, (i, docs[i], wd)
    for i in range(len(want), k):
        assert not np.isfinite(vals[i])
