"""Postings codec + inversion tests.

Model-based verification in the style of tests/index/assert_format.cpp:
build an expected in-memory index with brute-force python, compare the
encoded pools term-by-term / posting-by-posting.
"""

import numpy as np
import pytest

from iresearch_tpu.formats.postings import (
    decode_positions,
    decode_term,
    encode_field_postings,
)
from iresearch_tpu.formats.spec import BLOCK, TermCols
from iresearch_tpu.index.invert import invert_device, invert_numpy


def random_corpus(rng, num_docs=200, vocab=50, avg_len=30):
    """Token stream (doc-ascending, pos-ascending) + brute-force truth."""
    tok_tid, tok_doc, tok_pos = [], [], []
    truth = {}  # tid -> {doc: [positions]}
    for d in range(num_docs):
        n = int(rng.poisson(avg_len))
        tids = rng.integers(0, vocab, size=n)
        for p, t in enumerate(tids):
            tok_tid.append(t)
            tok_doc.append(d)
            tok_pos.append(p)
            truth.setdefault(int(t), {}).setdefault(d, []).append(p)
    return (
        np.array(tok_tid, np.int64),
        np.array(tok_doc, np.int64),
        np.array(tok_pos, np.uint32),
        truth,
    )


def check_entries_against_truth(inv, truth, vocab, num_docs):
    for t in range(vocab):
        lo, hi = inv.term_ptr[t], inv.term_ptr[t + 1]
        docs = inv.e_doc[lo:hi]
        freqs = inv.e_freq[lo:hi]
        expected = sorted(truth.get(t, {}).items())
        assert list(docs) == [d for d, _ in expected]
        assert list(freqs) == [len(ps) for _, ps in expected]


class TestInvert:
    def test_numpy_against_truth(self, rng):
        tid, doc, pos, truth = random_corpus(rng)
        inv = invert_numpy(tid, doc, pos, 50, 200)
        check_entries_against_truth(inv, truth, 50, 200)
        # norms = tokens per doc
        np.testing.assert_array_equal(
            inv.norms, np.bincount(doc, minlength=200).astype(np.uint32)
        )

    def test_device_matches_numpy(self, rng):
        tid, doc, pos, _ = random_corpus(rng, num_docs=97, vocab=31)
        a = invert_numpy(tid, doc, pos, 31, 97)
        b = invert_device(tid, doc, pos, 31, 97)
        np.testing.assert_array_equal(a.e_doc, b.e_doc)
        np.testing.assert_array_equal(a.e_freq, b.e_freq)
        np.testing.assert_array_equal(a.term_ptr, b.term_ptr)
        np.testing.assert_array_equal(a.pos_flat, b.pos_flat)
        np.testing.assert_array_equal(a.norms, b.norms)

    def test_empty(self):
        inv = invert_numpy(np.zeros(0), np.zeros(0), np.zeros(0, np.uint32), 5, 10)
        assert inv.term_ptr.tolist() == [0] * 6
        assert len(inv.e_doc) == 0


def encode_corpus(rng, **kw):
    vocab = kw.pop("vocab", 50)
    num_docs = kw.pop("num_docs", 200)
    tid, doc, pos, truth = random_corpus(rng, num_docs=num_docs, vocab=vocab, **kw)
    inv = invert_numpy(tid, doc, pos, vocab, num_docs)
    terms = [f"term{t:05d}".encode() for t in range(vocab)]
    # drop terms with no postings (encoder requires df > 0)
    keep = np.flatnonzero(np.diff(inv.term_ptr) > 0)
    remap_ptr = np.concatenate([[0], np.cumsum(np.diff(inv.term_ptr)[keep])])
    blob = b"".join(terms[i] for i in keep)
    offsets = np.cumsum([0] + [len(terms[i]) for i in keep]).astype(np.uint64)
    fp = encode_field_postings(
        inv.e_doc,
        inv.e_freq,
        remap_ptr,
        blob,
        offsets,
        inv.norms,
        pos_flat=inv.pos_flat,
    )
    truth_kept = {new: truth.get(int(old), {}) for new, old in enumerate(keep)}
    return fp, truth_kept


class TestPostingsCodec:
    def test_roundtrip_against_truth(self, rng):
        fp, truth = encode_corpus(rng)
        for t in range(fp.num_terms):
            docs, freqs = decode_term(fp, t)
            expected = sorted(truth[t].items())
            assert list(docs) == [d for d, _ in expected]
            assert list(freqs) == [len(ps) for _, ps in expected]
            poss = decode_positions(fp, t)
            for (d, ps), got in zip(expected, poss):
                assert list(got) == ps

    def test_sentinel_rows(self, rng):
        from iresearch_tpu.formats.spec import NUM_CLASSES

        fp, _ = encode_corpus(rng)
        for c in range(NUM_CLASSES):
            assert fp.doc_words[c][0].max() == 0
            assert fp.freq_words[c][0].max() == 0
            assert fp.base[c][0] == 0
            # every real list starts at row >= 1
        assert (fp.entries[:, TermCols.DSTART] >= 1).all()
        assert (fp.entries[:, TermCols.FSTART] >= 1).all()

    def test_block_metadata(self, rng):
        fp, truth = encode_corpus(rng, num_docs=1000, vocab=5, avg_len=20)
        for t in range(fp.num_terms):
            e = fp.entries[t]
            dc, d0 = int(e[TermCols.DCLS]), int(e[TermCols.DSTART])
            fc, f0 = int(e[TermCols.FCLS]), int(e[TermCols.FSTART])
            nb = int(e[TermCols.NBLOCKS])
            docs, freqs = decode_term(fp, t)
            # per-block max doc / max freq are exact
            for bi in range(nb):
                blk_docs = docs[bi * BLOCK : (bi + 1) * BLOCK]
                blk_freqs = freqs[bi * BLOCK : (bi + 1) * BLOCK]
                assert fp.bmax[dc][d0 + bi] == blk_docs.max()
                assert fp.bmaxf[fc][f0 + bi] == blk_freqs.max()
                assert fp.base[dc][d0 + bi] == blk_docs[0]
            assert e[TermCols.MAX_FREQ] == freqs.max()
            assert e[TermCols.DF] == len(docs)
            assert e[TermCols.TTF] == freqs.sum()

    def test_width_classes(self):
        # doc gaps force 16- and 32-bit doc classes; freqs stay 1-bit
        e_doc = np.array([0, 1000, 2000, 5, 200000, 400000], np.uint32)
        e_freq = np.array([1, 1, 1, 1, 1, 1], np.uint32)
        term_ptr = np.array([0, 3, 6], np.int64)
        norms = np.ones(400001, np.uint32)
        fp = encode_field_postings(
            e_doc, e_freq, term_ptr, b"ab", np.array([0, 1, 2], np.uint64), norms
        )
        from iresearch_tpu.formats.bitpack import BITS

        assert BITS[fp.entries[0, TermCols.DCLS]] == 16  # gaps of 1000
        assert BITS[fp.entries[1, TermCols.DCLS]] == 32  # gaps of 200000
        assert BITS[fp.entries[0, TermCols.FCLS]] == 1  # freq 1
        for t in [0, 1]:
            docs, freqs = decode_term(fp, t)
            np.testing.assert_array_equal(docs, e_doc[term_ptr[t] : term_ptr[t + 1]])

    def test_multi_block_boundaries(self, rng):
        # one term with df spanning several blocks exactly and with remainder
        for df in [BLOCK, BLOCK + 1, 3 * BLOCK - 1, 4 * BLOCK]:
            docs = np.sort(rng.choice(100000, size=df, replace=False)).astype(np.uint32)
            freqs = rng.integers(1, 10, size=df).astype(np.uint32)
            fp = encode_field_postings(
                docs,
                freqs,
                np.array([0, df], np.int64),
                b"x",
                np.array([0, 1], np.uint64),
                np.ones(100000, np.uint32),
            )
            d2, f2 = decode_term(fp, 0)
            np.testing.assert_array_equal(d2, docs)
            np.testing.assert_array_equal(f2, freqs)

    def test_empty_field(self):
        fp = encode_field_postings(
            np.zeros(0, np.uint32),
            np.zeros(0, np.uint32),
            np.zeros(1, np.int64),
            b"",
            np.zeros(1, np.uint64),
            np.zeros(10, np.uint32),
        )
        assert fp.num_terms == 0
        assert fp.total_term_freq == 0
