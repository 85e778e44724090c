"""Native consolidation merge vs the numpy reference path.

index/merge._merge_field_native (iresearch_native.cpp:irs_merge_decode +
irs_merge_gather_pos) must produce BYTE-IDENTICAL FieldPostings to the
numpy decode->lexsort->re-encode path for every feature combination —
deletes, positions, offsets, payloads, multi-class pools — and the
custom-sort case must keep routing to the numpy path (non-monotone doc
maps make the no-sort placement invalid).
"""

import os

import numpy as np
import pytest

from iresearch_tpu.formats.postings import encode_field_postings
from iresearch_tpu.formats.spec import IndexFeatures
from iresearch_tpu.index.merge import merge_segments
from iresearch_tpu.index.segment import SegmentData, SegmentReader


def _rand_field(rng, num_docs, vocab, avg_len, with_offs=False, with_pays=False):
    lens = rng.integers(2, 2 * avg_len, size=num_docs)
    total = int(lens.sum())
    tids = rng.integers(0, vocab, size=total)
    doc_of = np.repeat(np.arange(num_docs), lens)
    starts = np.cumsum(lens) - lens
    pos_of = (np.arange(total) - np.repeat(starts, lens)).astype(np.uint32)
    # invert: sort by (tid, doc, pos)
    order = np.lexsort((pos_of, doc_of, tids))
    t_s, d_s, p_s = tids[order], doc_of[order], pos_of[order]
    # entries = unique (tid, doc)
    bnd = np.ones(total, bool)
    bnd[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
    e_idx = np.flatnonzero(bnd)
    e_tid = t_s[e_idx]
    e_doc = d_s[e_idx].astype(np.uint32)
    e_freq = np.diff(np.append(e_idx, total)).astype(np.uint32)
    present = np.unique(e_tid)
    remap = np.zeros(vocab, np.int64)
    remap[present] = np.arange(len(present))
    term_ptr = np.zeros(len(present) + 1, np.int64)
    np.add.at(term_ptr, remap[e_tid] + 1, 1)
    np.cumsum(term_ptr, out=term_ptr)
    terms = [b"w%05d" % t for t in present]
    blob = b"".join(terms)
    offsets = np.zeros(len(terms) + 1, np.uint64)
    offsets[1:] = np.cumsum([len(t) for t in terms])
    norms = np.bincount(doc_of, minlength=num_docs).astype(np.uint32)
    feats = IndexFeatures.FREQ | IndexFeatures.POS
    offs = pays = None
    if with_offs:
        offs = (p_s * 5, p_s * 5 + 4)
        feats |= IndexFeatures.OFFS
    if with_pays:
        pay_len = (p_s % 3).astype(np.uint32)
        pay = bytes(rng.integers(0, 256, size=int(pay_len.sum()), dtype=np.uint8))
        pays = (pay_len, pay)
        feats |= IndexFeatures.PAY
    return encode_field_postings(
        e_doc, e_freq, term_ptr, blob, offsets, norms,
        pos_flat=p_s, features=feats, offs=offs, pays=pays,
    )


def _mk_reader(name, num_docs, fp, deleted=()):
    data = SegmentData(num_docs, {"body": fp}, {})
    masked = np.asarray(list(deleted), np.int64) if len(deleted) else None
    return SegmentReader(name, data, masked_docs=masked)


def _assert_fp_equal(a, b):
    np.testing.assert_array_equal(a.entries, b.entries)
    assert a.term_blob == b.term_blob
    np.testing.assert_array_equal(a.term_offsets, b.term_offsets)
    for pa, pb in zip(a.doc_words, b.doc_words):
        np.testing.assert_array_equal(pa, pb)
    for pa, pb in zip(a.freq_words, b.freq_words):
        np.testing.assert_array_equal(pa, pb)
    for pa, pb in zip(a.base, b.base):
        np.testing.assert_array_equal(pa, pb)
    for pa, pb in zip(a.bmax, b.bmax):
        np.testing.assert_array_equal(pa, pb)
    for pa, pb in zip(a.bmaxf, b.bmaxf):
        np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(a.norms, b.norms)
    if a.nrm_words is not None or b.nrm_words is not None:
        for pa, pb in zip(a.nrm_words, b.nrm_words):
            np.testing.assert_array_equal(pa, pb)
    assert (a.pos_words is None) == (b.pos_words is None)
    if a.pos_words is not None:
        for pa, pb in zip(a.pos_words, b.pos_words):
            np.testing.assert_array_equal(pa, pb)
    for attr in ("offs_start", "offs_end", "pay_len"):
        va, vb = getattr(a, attr), getattr(b, attr)
        assert (va is None) == (vb is None), attr
        if va is not None:
            np.testing.assert_array_equal(va, vb)
    assert a.pay_blob == b.pay_blob
    assert a.features == b.features
    assert a.docs_with_field == b.docs_with_field
    assert a.total_term_freq == b.total_term_freq


def _both_paths(readers, **kw):
    from iresearch_tpu import native

    if native.load() is None:
        pytest.skip("native library unavailable")
    got = merge_segments(readers, **kw)
    os.environ["IRS_MERGE_NATIVE"] = "0"
    try:
        want = merge_segments(readers, **kw)
    finally:
        del os.environ["IRS_MERGE_NATIVE"]
    return got, want


@pytest.mark.parametrize("with_offs,with_pays", [
    (False, False), (True, False), (True, True),
])
def test_native_merge_byte_identical(with_offs, with_pays):
    rng = np.random.default_rng(42)
    readers = []
    for s, nd in enumerate((137, 89, 211)):
        fp = _rand_field(
            rng, nd, vocab=60, avg_len=9,
            with_offs=with_offs, with_pays=with_pays,
        )
        deleted = rng.choice(nd, size=nd // 7, replace=False) if s != 1 else ()
        readers.append(_mk_reader(f"s{s}", nd, fp, deleted))
    got, want = _both_paths(readers)
    assert got.num_docs == want.num_docs
    _assert_fp_equal(got.fields["body"], want.fields["body"])


def test_native_merge_wide_classes():
    """Docs spanning several delta-width classes + freqs > 255 exercise
    every planar reader width."""
    rng = np.random.default_rng(7)
    readers = []
    for s, nd in enumerate((4000, 2500)):
        fp = _rand_field(rng, nd, vocab=1500, avg_len=6)
        deleted = rng.choice(nd, size=nd // 11, replace=False)
        readers.append(_mk_reader(f"s{s}", nd, fp, deleted))
    got, want = _both_paths(readers)
    _assert_fp_equal(got.fields["body"], want.fields["body"])


def test_native_merge_all_docs_of_a_term_masked():
    """A term whose every posting is masked must vanish from the merged
    dictionary on both paths."""
    fp0 = encode_field_postings(
        np.array([0, 1], np.uint32),
        np.array([1, 1], np.uint32),
        np.array([0, 1, 2], np.int64),
        b"aabb",
        np.array([0, 2, 4], np.uint64),
        np.array([1, 1], np.uint32),
        pos_flat=np.array([0, 0], np.uint32),
    )
    fp1 = encode_field_postings(
        np.array([0], np.uint32),
        np.array([2], np.uint32),
        np.array([0, 1], np.int64),
        b"bb",
        np.array([0, 2], np.uint64),
        np.array([2], np.uint32),
        pos_flat=np.array([0, 1], np.uint32),
    )
    r0 = _mk_reader("s0", 2, fp0, deleted=(1,))  # kills term "bb" in s0
    r1 = _mk_reader("s1", 1, fp1)
    got, want = _both_paths([r0, r1])
    _assert_fp_equal(got.fields["body"], want.fields["body"])
    assert got.fields["body"].terms() == [b"aa", b"bb"]


def test_custom_sort_uses_numpy_path():
    """A primary-sort merge produces non-monotone doc maps; the native
    placement would be wrong there, so _merge_field must route to the
    lexsort path — results must match the numpy-forced run exactly."""
    from iresearch_tpu.formats.columnstore import column_from_parts
    from iresearch_tpu.index.writer import SortSpec

    rng = np.random.default_rng(3)
    readers = []
    for s, nd in enumerate((40, 30)):
        fp = _rand_field(rng, nd, vocab=20, avg_len=5)
        data = SegmentData(nd, {"body": fp}, {})
        docs = np.arange(nd, dtype=np.uint32)
        vals = [b"%03d" % int(v) for v in rng.integers(0, 999, size=nd)]
        lens = np.array([len(v) for v in vals], np.int64)
        data.columns["k"] = column_from_parts(
            docs, lens, b"".join(vals), nd
        )
        readers.append(SegmentReader(f"s{s}", data))
    sort = SortSpec(field="k", descending=False)
    got, want = _both_paths(readers, sort=sort)
    _assert_fp_equal(got.fields["body"], want.fields["body"])
