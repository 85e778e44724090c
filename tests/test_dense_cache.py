"""Dense grid cache (formats/dense.py) must reproduce decode_term exactly."""

import numpy as np

from iresearch_tpu.formats.bitpack import BITS, unpack_blocks
from iresearch_tpu.formats.dense import DENSE_MIN_RATIO, build_dense_cache
from iresearch_tpu.formats.postings import decode_term, encode_field_postings
from iresearch_tpu.formats.spec import BLOCK, IndexFeatures, pad_docs


def _zipf_field(nd=1000, vocab=60, seed=3):
    rng = np.random.default_rng(seed)
    lens = rng.integers(8, 24, nd)
    tids = np.minimum(rng.zipf(1.3, size=int(lens.sum())) - 1, vocab - 1)
    doc = np.repeat(np.arange(nd), lens)
    starts = np.cumsum(lens) - lens
    pos = (np.arange(len(tids)) - np.repeat(starts, lens)).astype(np.uint32)
    from iresearch_tpu.index.invert import invert_numpy

    inv = invert_numpy(tids, doc, pos, vocab, nd)
    present = np.flatnonzero(np.diff(inv.term_ptr) > 0)
    terms = [b"w%03d" % t for t in present]
    blob = b"".join(terms)
    offs = np.zeros(len(terms) + 1, np.uint64)
    offs[1:] = np.cumsum([len(t) for t in terms])
    tp = np.concatenate([inv.term_ptr[present], [inv.term_ptr[-1]]])
    fp = encode_field_postings(
        inv.e_doc, inv.e_freq, tp, blob, offs, inv.norms, inv.pos_flat,
        IndexFeatures.FREQ | IndexFeatures.POS,
    )
    return fp, nd


def test_grid_matches_decode_term():
    fp, nd = _zipf_field()
    cache = build_dense_cache(fp, nd)
    assert cache is not None, "zipf corpus must have dense terms"
    nd_pad = pad_docs(nd)
    assert cache.ndrows * BLOCK == nd_pad
    df = fp.entries[:, 0].astype(np.int64)
    checked = 0
    for tid, (c, start) in cache.spans.items():
        assert df[tid] >= max(4, nd // DENSE_MIN_RATIO)
        rows = unpack_blocks(
            cache.pools[c][start : start + cache.ndrows], BITS[c]
        )
        grid = rows.reshape(-1)
        docs, freqs = decode_term(fp, tid)
        expect = np.zeros(nd_pad, np.uint32)
        expect[docs.astype(np.int64)] = freqs
        np.testing.assert_array_equal(grid, expect)
        np.testing.assert_array_equal(
            cache.bmaxf[c][start : start + cache.ndrows],
            expect.reshape(cache.ndrows, BLOCK).max(axis=1),
        )
        checked += 1
    assert checked >= 2


def test_every_qualifying_term_selected():
    fp, nd = _zipf_field()
    cache = build_dense_cache(fp, nd)
    df = fp.entries[:, 0].astype(np.int64)
    want = set(np.flatnonzero(df >= max(32, nd // DENSE_MIN_RATIO)).tolist())
    assert set(cache.spans) == want


def test_sentinel_row_zero():
    fp, nd = _zipf_field()
    cache = build_dense_cache(fp, nd)
    for c, pool in enumerate(cache.pools):
        assert not unpack_blocks(pool[:1], BITS[c]).any()


def test_tiny_segment_skipped():
    fp, _ = _zipf_field(nd=40)
    assert build_dense_cache(fp, 40) is None  # pad_docs(40)=64, not /128
