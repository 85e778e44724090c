"""OFFS/PAY features: token offsets and payloads through write, read,
serialize, and merge (reference: IndexFeatures OFFS/PAY,
index_features.hpp:40; .pos/.pay streams)."""

import numpy as np
import pytest

from iresearch_tpu.analysis import Analyzer, Token, register
from iresearch_tpu.formats.postings import (
    decode_offsets,
    decode_payloads,
    decode_positions,
    decode_term,
)
from iresearch_tpu.formats.spec import IndexFeatures
from iresearch_tpu.index.consolidate import consolidate_count
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.store.directory import MemoryDirectory

ALL = IndexFeatures.FREQ | IndexFeatures.POS | IndexFeatures.OFFS | IndexFeatures.PAY


class PayloadAnalyzer(Analyzer):
    """Splits on spaces; payload = upper-cased token bytes."""

    name = "paytest"

    def tokenize(self, text):
        out = []
        off = 0
        for pos, w in enumerate(text.split()):
            start = text.index(w, off)
            end = start + len(w)
            off = end
            out.append(Token(w.encode(), pos, start, end, w.upper().encode()))
        return out


register("paytest", lambda a: PayloadAnalyzer())

DOCS = ["red fox ran", "fox fox den", "red den"]


def build(breaks=()):
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, t in enumerate(DOCS):
            w.insert([
                Field("body", t, analyzer="paytest", features=ALL),
                Field("id", str(i), index=True, store=True),
            ])
            if i in breaks:
                w.commit()
        w.commit()
    return d


def check_field(fp):
    assert fp.features & IndexFeatures.OFFS
    assert fp.features & IndexFeatures.PAY
    tid = None
    for t in range(fp.num_terms):
        if fp.term_bytes(t) == b"fox":
            tid = t
    docs, freqs = decode_term(fp, tid)
    offs = decode_offsets(fp, tid)
    pays = decode_payloads(fp, tid)
    poss = decode_positions(fp, tid)
    for d, f, o, p, ps in zip(docs, freqs, offs, pays, poss):
        text = DOCS[
            int(d)
        ]  # doc ids match insertion order in this single/merged segment
        assert len(o) == f and len(p) == f
        for (s, e), pay, pos in zip(o, p, ps):
            assert text[s:e] == "fox"
            assert pay == b"FOX"


def test_offsets_payloads_roundtrip():
    d = build()
    r = DirectoryReader.open(d)
    fp = list(r.segments)[0].field("body")
    check_field(fp)


def test_survive_merge():
    d = build(breaks=(0, 1))
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        assert w.consolidate(consolidate_count(1))
        w.commit()
    r = DirectoryReader.open(d)
    assert len(r.segments) == 1
    check_field(list(r.segments)[0].field("body"))


def test_mixed_bulk_then_offs_raises():
    d = MemoryDirectory()
    with pytest.raises(ValueError):
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            # first doc via native bulk path (no aux), then OFFS requested
            w.insert([Field("body", "plain ascii doc", analyzer="segmentation")])
            w.insert([
                Field("body", "now with offsets", analyzer="paytest", features=ALL)
            ])
            w.commit()
