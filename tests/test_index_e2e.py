"""End-to-end: writer -> commit -> reader -> host search vs brute force.

Model-based verification (reference: tests/index/assert_format.cpp +
filter_test_case_base.cpp): an independent pure-python oracle computes
expected matches and BM25 scores straight from the raw documents.
"""

import math

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery, search
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox",
    "a lazy brown dog sleeps",
    "quick quick quick foxes everywhere",
    "dogs and foxes are friends",
    "nothing relevant here at all",
    "the fox the dog the fox",
    "brown bears eat honey",
]


def tokenize(text):
    return text.lower().split()


class BruteForce:
    """Independent scoring oracle over raw docs."""

    def __init__(self, docs, k=1.2, b=0.75):
        self.docs = [tokenize(d) for d in docs]
        self.k = k
        self.b = b
        self.N = sum(1 for d in self.docs if d)
        self.avgdl = sum(len(d) for d in self.docs) / self.N

    def df(self, term):
        return sum(1 for d in self.docs if term in d)

    def idf(self, term):
        df = self.df(term)
        return math.log1p((self.N - df + 0.5) / (df + 0.5))

    def bm25(self, doc_idx, term, boost=1.0):
        d = self.docs[doc_idx]
        tf = d.count(term)
        if tf == 0:
            return 0.0
        w = boost * (self.k + 1) * self.idf(term)
        c1 = self.k * (1 - self.b + self.b * len(d) / self.avgdl)
        return w * tf / (tf + c1)

    def matching(self, term):
        return [i for i, d in enumerate(self.docs) if term in d]


@pytest.fixture(scope="module")
def index():
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, text in enumerate(DOCS):
            w.insert(
                [
                    Field("body", text, analyzer="segmentation"),
                    Field("id", str(i), index=True, store=True),
                ]
            )
        w.commit()
    return d


@pytest.fixture(scope="module")
def reader(index):
    return DirectoryReader.open(index)


@pytest.fixture(scope="module")
def oracle():
    return BruteForce(DOCS)


class TestIndexStructure:
    def test_counts(self, reader):
        assert reader.docs_count == len(DOCS)
        assert reader.live_docs_count == len(DOCS)
        assert len(reader.segments) == 1

    def test_terms(self, reader, oracle):
        sr = reader.segments[0]
        vocab = sorted({w.encode() for d in DOCS for w in tokenize(d)})
        assert sr.terms("body") == vocab

    def test_postings_match_brute_force(self, reader, oracle):
        from iresearch_tpu.formats.postings import decode_term

        sr = reader.segments[0]
        fp = sr.field("body")
        for term in ["fox", "quick", "the", "honey"]:
            tid = sr.lookup_term("body", term.encode())
            docs, freqs = decode_term(fp, tid)
            assert list(docs) == oracle.matching(term)
            assert list(freqs) == [
                oracle.docs[i].count(term) for i in oracle.matching(term)
            ]

    def test_norms(self, reader, oracle):
        sr = reader.segments[0]
        fp = sr.field("body")
        np.testing.assert_array_equal(
            fp.norms, [len(d) for d in oracle.docs]
        )

    def test_stored_column(self, reader):
        for i in range(len(DOCS)):
            assert reader.stored(i, "id") == str(i).encode()


class TestTermSearch:
    def test_bm25_exact(self, reader, oracle):
        for term in ["fox", "quick", "lazy", "dog"]:
            hits = search(reader, F.ByTerm("body", term), BM25(), k=10)
            expected = sorted(
                ((i, oracle.bm25(i, term)) for i in oracle.matching(term)),
                key=lambda t: (-t[1], t[0]),
            )
            assert [h[0] for h in hits] == [e[0] for e in expected]
            for (hd, hs), (ed, es) in zip(hits, expected):
                assert hs == pytest.approx(es, rel=1e-5)

    def test_missing_term(self, reader):
        assert search(reader, F.ByTerm("body", "zebra")) == []

    def test_missing_field(self, reader):
        assert search(reader, F.ByTerm("nofield", "fox")) == []

    def test_boost(self, reader, oracle):
        plain = search(reader, F.ByTerm("body", "fox"), BM25(), k=3)
        boosted = search(reader, F.ByTerm("body", "fox", boost=2.0), BM25(), k=3)
        for (d1, s1), (d2, s2) in zip(plain, boosted):
            assert d1 == d2
            assert s2 == pytest.approx(2 * s1, rel=1e-6)


class TestBooleanSearch:
    def test_and(self, reader, oracle):
        hits = search(reader, F.And(F.ByTerm("body", "quick"), F.ByTerm("body", "fox")))
        expected_docs = sorted(
            set(oracle.matching("quick")) & set(oracle.matching("fox"))
        )
        assert sorted(h[0] for h in hits) == expected_docs
        for d, s in hits:
            assert s == pytest.approx(
                oracle.bm25(d, "quick") + oracle.bm25(d, "fox"), rel=1e-5
            )

    def test_or(self, reader, oracle):
        hits = search(reader, F.Or(F.ByTerm("body", "quick"), F.ByTerm("body", "honey")))
        expected_docs = sorted(
            set(oracle.matching("quick")) | set(oracle.matching("honey"))
        )
        assert sorted(h[0] for h in hits) == expected_docs

    def test_or_min_match(self, reader, oracle):
        flt = F.Or(
            F.ByTerm("body", "quick"),
            F.ByTerm("body", "fox"),
            F.ByTerm("body", "lazy"),
            min_match=2,
        )
        hits = search(reader, flt)
        expected = sorted(
            i
            for i in range(len(DOCS))
            if sum(t in oracle.docs[i] for t in ["quick", "fox", "lazy"]) >= 2
        )
        assert sorted(h[0] for h in hits) == expected

    def test_and_not(self, reader, oracle):
        flt = F.And(F.ByTerm("body", "fox"), F.Not(F.ByTerm("body", "lazy")))
        hits = search(reader, flt)
        expected = sorted(
            set(oracle.matching("fox")) - set(oracle.matching("lazy"))
        )
        assert sorted(h[0] for h in hits) == expected

    def test_nested_boolean(self, reader, oracle):
        flt = F.Or(
            F.And(F.ByTerm("body", "brown"), F.ByTerm("body", "dog")),
            F.ByTerm("body", "honey"),
        )
        a = set(oracle.matching("brown")) & set(oracle.matching("dog"))
        b = set(oracle.matching("honey"))
        hits = search(reader, flt)
        assert sorted(h[0] for h in hits) == sorted(a | b)

    def test_match_all(self, reader):
        hits = search(reader, F.All(), k=100)
        assert len(hits) == len(DOCS)

    def test_empty(self, reader):
        assert search(reader, F.Empty()) == []


class TestMultiTerm:
    def test_prefix(self, reader, oracle):
        hits = search(reader, F.ByPrefix("body", "fox"), k=100)
        expected = sorted(
            i
            for i, d in enumerate(oracle.docs)
            if any(w.startswith("fox") for w in d)
        )
        assert sorted(h[0] for h in hits) == expected

    def test_wildcard(self, reader, oracle):
        hits = search(reader, F.ByWildcard("body", "d_g%"), k=100)
        expected = sorted(
            i
            for i, d in enumerate(oracle.docs)
            if any(len(w) >= 3 and w[0] == "d" and w[2] == "g" for w in d)
        )
        assert sorted(h[0] for h in hits) == expected

    def test_range(self, reader, oracle):
        hits = search(reader, F.ByRange("body", low="dog", high="fox"), k=100)
        expected = sorted(
            i
            for i, d in enumerate(oracle.docs)
            if any("dog" <= w <= "fox" for w in d)
        )
        assert sorted(h[0] for h in hits) == expected

    def test_fuzzy(self, reader, oracle):
        # distance 1 from 'fix': fox
        hits = search(reader, F.ByEditDistance("body", "fix", max_distance=1), k=100)
        expected = sorted(oracle.matching("fox"))
        assert sorted(h[0] for h in hits) == expected

    def test_terms_set(self, reader, oracle):
        hits = search(reader, F.ByTerms("body", ["honey", "sleeps"]), k=100)
        expected = sorted(
            set(oracle.matching("honey")) | set(oracle.matching("sleeps"))
        )
        assert sorted(h[0] for h in hits) == expected


class TestPhrase:
    def test_exact_phrase(self, reader, oracle):
        hits = search(reader, F.ByPhrase("body", ["quick", "brown", "fox"]), k=100)
        expected = [
            i
            for i, d in enumerate(oracle.docs)
            if any(
                d[j : j + 3] == ["quick", "brown", "fox"] for j in range(len(d))
            )
        ]
        assert sorted(h[0] for h in hits) == expected

    def test_phrase_two(self, reader, oracle):
        hits = search(reader, F.ByPhrase("body", ["the", "fox"]), k=100)
        expected = [
            i
            for i, d in enumerate(oracle.docs)
            if any(d[j : j + 2] == ["the", "fox"] for j in range(len(d)))
        ]
        assert sorted(h[0] for h in hits) == expected

    def test_phrase_no_match(self, reader):
        assert search(reader, F.ByPhrase("body", ["lazy", "fox"])) == []


class TestTFIDF:
    def test_tfidf_scores(self, reader, oracle):
        hits = search(reader, F.ByTerm("body", "fox"), TFIDF(), k=10)
        N = oracle.N
        df = oracle.df("fox")
        idf = math.log1p((N + 1) / (df + 1))
        for d, s in hits:
            tf = oracle.docs[d].count("fox")
            expected = idf * math.sqrt(tf) / math.sqrt(len(oracle.docs[d]))
            assert s == pytest.approx(expected, rel=1e-5)


class TestDeletesAndUpdates:
    def test_remove_and_reopen(self):
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            for i, text in enumerate(DOCS):
                w.insert(
                    [
                        Field("body", text, analyzer="segmentation"),
                        Field("id", str(i), store=True),
                    ]
                )
            w.commit()
            r1 = DirectoryReader.open(d)
            assert r1.live_docs_count == len(DOCS)
            # delete all docs containing 'lazy'
            w.remove(F.ByTerm("body", "lazy"))
            w.commit()
            # snapshot isolation: r1 unaffected
            assert r1.live_docs_count == len(DOCS)
            r2 = r1.reopen()
            lazy_docs = [i for i, t in enumerate(DOCS) if "lazy" in tokenize(t)]
            assert r2.live_docs_count == len(DOCS) - len(lazy_docs)
            assert search(r2, F.ByTerm("body", "lazy")) == []
            # other docs still searchable
            assert len(search(r2, F.ByTerm("body", "honey"), k=10)) == 1

    def test_remove_applies_by_tick(self):
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            w.insert([Field("body", "alpha beta", analyzer="segmentation")])
            w.remove(F.ByTerm("body", "alpha"))
            # inserted AFTER the remove -> survives
            w.insert([Field("body", "alpha gamma", analyzer="segmentation")])
            w.commit()
            r = DirectoryReader.open(d)
            assert r.live_docs_count == 1
            hits = search(r, F.ByTerm("body", "gamma"))
            assert len(hits) == 1

    def test_replace(self):
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            w.insert([Field("body", "old content", analyzer="segmentation"),
                      Field("id", "k1", store=True)])
            w.commit()
            with w.batch() as tx:
                tx.replace(
                    F.ByTerm("body", "old"),
                    [Field("body", "new content", analyzer="segmentation"),
                     Field("id", "k1", store=True)],
                )
            w.commit()
            r = DirectoryReader.open(d)
            assert r.live_docs_count == 1
            assert search(r, F.ByTerm("body", "old")) == []
            assert len(search(r, F.ByTerm("body", "new"))) == 1


class TestMultiSegmentAndMerge:
    def build(self):
        d = MemoryDirectory()
        w = IndexWriter(d, IndexWriterOptions(invert_backend="numpy"))
        for i, text in enumerate(DOCS[:4]):
            w.insert([Field("body", text, analyzer="segmentation"),
                      Field("id", str(i), store=True)])
        w.commit()
        for i, text in enumerate(DOCS[4:], start=4):
            w.insert([Field("body", text, analyzer="segmentation"),
                      Field("id", str(i), store=True)])
        w.commit()
        return d, w

    def test_multi_segment_search(self, oracle):
        d, w = self.build()
        r = DirectoryReader.open(d)
        assert len(r.segments) == 2
        hits = search(r, F.ByTerm("body", "fox"), BM25(), k=10)
        assert sorted(h[0] for h in hits) == oracle.matching("fox")
        # idf uses index-wide stats -> scores match single-segment build
        for h_doc, h_score in hits:
            assert h_score == pytest.approx(oracle.bm25(h_doc, "fox"), rel=1e-5)
        w.close()

    def test_consolidate(self, oracle):
        d, w = self.build()
        w.remove(F.ByTerm("body", "honey"))
        w.commit()
        assert w.consolidate() is True
        r = DirectoryReader.open(d)
        assert len(r.segments) == 1
        expected_live = len(DOCS) - len(oracle.matching("honey"))
        assert r.live_docs_count == expected_live
        assert r.docs_count == expected_live  # merge drops masked docs
        hits = search(r, F.ByTerm("body", "fox"), BM25(), k=10)
        got_ids = sorted(r.stored(h[0], "id") for h in hits)
        assert got_ids == sorted(
            str(i).encode() for i in oracle.matching("fox")
        )
        w.close()

    def test_rollback(self):
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            w.insert([Field("body", "will vanish", analyzer="segmentation")])
            w.rollback()
            assert w.commit() is False
        r = DirectoryReader.open(d)
        assert r.docs_count == 0
