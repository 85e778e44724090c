"""Native one-pass dense-grid builder vs the numpy builder.

The DenseCache (formats/dense.py) must be ELEMENT-IDENTICAL between the
native kernel (iresearch_native.cpp:irs_dense_build) and the numpy
reference path — packed pools, row maxima, and every skyline summary
(champion-lane tie-breaks included).
"""

import numpy as np
import pytest

from iresearch_tpu import native
from iresearch_tpu.formats.dense import build_dense_cache
from iresearch_tpu.formats.postings import encode_field_postings
from iresearch_tpu.formats.spec import IndexFeatures
from iresearch_tpu.index.invert import invert_numpy

pytestmark = pytest.mark.skipif(
    native.load() is None
    or getattr(native.load(), "irs_dense_build", None) is None,
    reason="native library unavailable",
)


def _mk_field(seed, nd=5000, vocab=40, ntok=60_000):
    rng = np.random.default_rng(seed)
    tids = rng.integers(0, vocab, ntok)
    doc = np.sort(rng.integers(0, nd, ntok))
    pos = (np.arange(ntok) % 50).astype(np.uint32)
    inv = invert_numpy(tids, doc, pos, vocab, nd)
    present = np.flatnonzero(np.diff(inv.term_ptr) > 0)
    terms = [b"t%03d" % t for t in present]
    blob = b"".join(terms)
    offs = np.zeros(len(terms) + 1, np.uint64)
    offs[1:] = np.cumsum([len(t) for t in terms])
    tp = np.concatenate([inv.term_ptr[present], [inv.term_ptr[-1]]])
    return encode_field_postings(
        inv.e_doc, inv.e_freq, tp, blob, offs, inv.norms, inv.pos_flat,
        IndexFeatures.FREQ | IndexFeatures.POS,
    ), nd


def _assert_same(a, b):
    assert a is not None and b is not None
    assert a.ndrows == b.ndrows
    assert a.spans == b.spans
    assert a.avgdl == pytest.approx(b.avgdl)
    for fa, fb in zip(a.pools, b.pools):
        np.testing.assert_array_equal(fa, fb)
    for name in ("bmaxf", "dl_min", "f_c", "dl_c", "f_mdl"):
        for fa, fb in zip(getattr(a, name), getattr(b, name)):
            np.testing.assert_array_equal(fa, fb, err_msg=name)


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_native_equals_numpy(seed, monkeypatch):
    fp, nd = _mk_field(seed)
    monkeypatch.setenv("IRS_DENSE_NATIVE", "1")
    got = build_dense_cache(fp, nd)
    monkeypatch.setenv("IRS_DENSE_NATIVE", "0")
    want = build_dense_cache(fp, nd)
    _assert_same(got, want)


def test_native_equals_numpy_with_deletes(monkeypatch):
    fp, nd = _mk_field(7)
    rng = np.random.default_rng(1)
    alive = rng.random(nd) > 0.3
    monkeypatch.setenv("IRS_DENSE_NATIVE", "1")
    got = build_dense_cache(fp, nd, alive)
    monkeypatch.setenv("IRS_DENSE_NATIVE", "0")
    want = build_dense_cache(fp, nd, alive)
    _assert_same(got, want)


def test_wide_freqs(monkeypatch):
    """High-frequency terms exercise the wide width classes and the u16
    clipping paths of the summaries."""
    rng = np.random.default_rng(5)
    nd, vocab = 2000, 6
    ntok = 400_000  # very heavy repetition -> large freqs
    tids = rng.integers(0, vocab, ntok)
    doc = np.sort(rng.integers(0, nd, ntok))
    pos = (np.arange(ntok) % 64).astype(np.uint32)
    inv = invert_numpy(tids, doc, pos, vocab, nd)
    present = np.flatnonzero(np.diff(inv.term_ptr) > 0)
    terms = [b"t%01d" % t for t in present]
    blob = b"".join(terms)
    offs = np.zeros(len(terms) + 1, np.uint64)
    offs[1:] = np.cumsum([len(t) for t in terms])
    tp = np.concatenate([inv.term_ptr[present], [inv.term_ptr[-1]]])
    fp = encode_field_postings(
        inv.e_doc, inv.e_freq, tp, blob, offs, inv.norms, inv.pos_flat,
        IndexFeatures.FREQ | IndexFeatures.POS,
    )
    monkeypatch.setenv("IRS_DENSE_NATIVE", "1")
    got = build_dense_cache(fp, nd)
    monkeypatch.setenv("IRS_DENSE_NATIVE", "0")
    want = build_dense_cache(fp, nd)
    _assert_same(got, want)
