"""Host-aux filters vs independent brute-force truth.

Covers the filters the device executes via dense aux arrays — ByNested,
BySamePosition, ByNgramSimilarity, ByColumnExistence, Proxy — whose host
evaluators were vectorized in round 2 (reference behaviors:
nested_filter.cpp, same_position_filter.cpp, ngram_similarity_query.cpp,
column_existence_filter.cpp, proxy_filter.hpp). Truth is recomputed here
from the raw documents with naive Python, never via the library.
"""

import math

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MemoryDirectory


def _index(docs, extra_fields=None):
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, text in enumerate(docs):
            fields = [Field("body", text, analyzer="segmentation")]
            if extra_fields:
                fields.extend(extra_fields(i))
            w.insert(fields)
        w.commit()
    return DirectoryReader.open(d)


class TestSamePosition:
    def test_same_position_truth(self):
        # title and body share positions only where tokens align
        docs = [
            ("red fox", "red dog"),
            ("red fox", "fox red"),
            ("blue fox", "red red"),
            ("red red", "red fox"),
        ]
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            for a, b in docs:
                w.insert([
                    Field("body", a, analyzer="segmentation"),
                    Field("title", b, analyzer="segmentation"),
                ])
            w.commit()
        reader = DirectoryReader.open(d)
        flt = F.BySamePosition([("body", "red"), ("title", "red")])
        hq = HostQuery(flt, list(reader.segments), BM25())
        r = hq.execute(0)
        # truth: docs where some position i has body[i]==red and title[i]==red
        want = set()
        for i, (a, b) in enumerate(docs):
            at, bt = a.split(), b.split()
            for j in range(min(len(at), len(bt))):
                if at[j] == "red" and bt[j] == "red":
                    want.add(i)
                    break
        assert set(np.flatnonzero(r.match).tolist()) == want

    def test_same_field_pair(self):
        docs = ["a b", "b a", "a a"]
        reader = _index(docs)
        # a term can only co-occur with itself at a position
        flt = F.BySamePosition([("body", "a"), ("body", "b")])
        hq = HostQuery(flt, list(reader.segments), BM25())
        assert not hq.execute(0).match.any()
        flt2 = F.BySamePosition([("body", "a"), ("body", "a")])
        hq2 = HostQuery(flt2, list(reader.segments), BM25())
        assert set(np.flatnonzero(hq2.execute(0).match).tolist()) == {0, 1, 2}


class TestNested:
    def _block_index(self, families):
        """families: list of (children_texts, parent_text). Block layout:
        children first, then their parent (reference convention)."""
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            for kids, parent in families:
                for k in kids:
                    w.insert([Field("body", k, analyzer="segmentation")])
                w.insert([
                    Field("body", parent, analyzer="segmentation"),
                    Field("kind", "parent", analyzer="identity"),
                ])
            w.commit()
        return DirectoryReader.open(d)

    @pytest.mark.parametrize("mm,mx", [(1, None), (2, None), (1, 1), (0, 0)])
    def test_nested_counts(self, mm, mx):
        families = [
            (["red cat", "blue dog"], "family one"),
            (["red dog", "red bird", "red fish"], "family two"),
            (["blue whale"], "family three"),
            ([], "family four"),
        ]
        reader = self._block_index(families)
        flt = F.ByNested(
            parent=F.ByTerm("kind", "parent"),
            child=F.ByTerm("body", "red"),
            min_match=mm,
            max_match=mx,
        )
        hq = HostQuery(flt, list(reader.segments), BM25())
        r = hq.execute(0)
        # truth: parent doc ids and matching-child counts by construction
        got = set(np.flatnonzero(r.match).tolist())
        want = set()
        doc = 0
        for kids, _ in families:
            cnt = sum(1 for k in kids if "red" in k.split())
            pdoc = doc + len(kids)
            hi = mx if mx is not None else 10**9
            if mm <= cnt <= hi:
                want.add(pdoc)
            doc = pdoc + 1
        assert got == want

    def test_nested_scores_sum_children(self):
        families = [
            (["red", "red red"], "p"),
            (["red"], "p"),
        ]
        reader = self._block_index(families)
        flt = F.ByNested(
            parent=F.ByTerm("kind", "parent"), child=F.ByTerm("body", "red")
        )
        hq = HostQuery(flt, list(reader.segments), BM25())
        r = hq.execute(0)
        child = HostQuery(
            F.ByTerm("body", "red"), list(reader.segments), BM25()
        ).execute(0)
        assert r.score[2] == pytest.approx(child.score[0] + child.score[1])
        assert r.score[4] == pytest.approx(child.score[3])


class TestNgramSimilarity:
    def test_threshold_and_score(self):
        # query ngrams must appear as a subsequence at increasing positions
        docs = [
            "aa bb cc dd",   # full sequence -> ratio 1.0
            "aa cc bb dd",   # longest increasing subsequence aa,bb,dd or aa,cc,dd = 3/4
            "dd cc bb aa",   # reversed: best single = 1/4
            "xx yy zz ww",   # nothing
        ]
        reader = _index(docs)
        flt = F.ByNgramSimilarity("body", ["aa", "bb", "cc", "dd"], threshold=0.75)
        hq = HostQuery(flt, list(reader.segments), BM25())
        r = hq.execute(0)
        assert set(np.flatnonzero(r.match).tolist()) == {0, 1}
        flt2 = F.ByNgramSimilarity("body", ["aa", "bb", "cc", "dd"], threshold=0.25)
        r2 = HostQuery(flt2, list(reader.segments), BM25()).execute(0)
        assert set(np.flatnonzero(r2.match).tolist()) == {0, 1, 2}

    def test_disjoint_repeats_increase_tf(self):
        docs = ["aa bb aa bb", "aa bb xx yy"]
        reader = _index(docs)
        flt = F.ByNgramSimilarity("body", ["aa", "bb"], threshold=1.0)
        r = HostQuery(flt, list(reader.segments), BM25()).execute(0)
        assert r.match[0] and r.match[1]
        # doc 0 has two disjoint (aa,bb) chains -> higher tf -> higher score
        # (same dl: both docs are 4 tokens)
        assert r.score[0] > r.score[1]


class TestColumnExistenceProxy:
    def test_column_existence_and_prefix(self):
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            for i in range(6):
                fields = [Field("body", f"doc {i}", analyzer="segmentation")]
                if i % 2 == 0:
                    fields.append(Field("price_usd", str(i), index=False, store=True))
                if i % 3 == 0:
                    fields.append(Field("price_eur", str(i), index=False, store=True))
                w.insert(fields)
            w.commit()
        reader = DirectoryReader.open(d)
        r = HostQuery(
            F.ByColumnExistence("price_usd"), list(reader.segments), BM25()
        ).execute(0)
        assert set(np.flatnonzero(r.match).tolist()) == {0, 2, 4}
        r2 = HostQuery(
            F.ByColumnExistence("price", prefix_match=True),
            list(reader.segments),
            BM25(),
        ).execute(0)
        assert set(np.flatnonzero(r2.match).tolist()) == {0, 2, 3, 4}

    def test_proxy_caches_match(self):
        reader = _index(["red fox", "blue dog", "red dog"])
        flt = F.Proxy(F.ByTerm("body", "red"))
        hq = HostQuery(flt, list(reader.segments), BM25())
        r1 = hq.execute(0)
        r2 = hq.execute(0)
        np.testing.assert_array_equal(r1.match, r2.match)
        assert set(np.flatnonzero(r1.match).tolist()) == {0, 2}


class TestDeviceAuxParity:
    """The device executor consumes these filters as aux arrays — results
    must equal the host oracle including under boolean composition."""

    def test_device_equals_host_with_aux(self):
        from iresearch_tpu.exec import DeviceQuery

        docs = [f"w{i % 7} red fox w{i % 5}" for i in range(50)]
        reader = _index(docs)
        segs = list(reader.segments)
        flt = F.And(
            F.ByTerm("body", "red"),
            F.BySamePosition([("body", "red"), ("body", "red")]),
        )
        hq = HostQuery(flt, segs, BM25())
        dq = DeviceQuery(flt, segs, BM25())
        hr = hq.execute(0)
        vals, docs_out = dq.execute_segment(0, 64)
        got = {int(d): float(v) for v, d in zip(vals, docs_out)
               if not (math.isinf(v) and v < 0)}
        want = set(np.flatnonzero(hr.match).tolist())
        assert set(got) == want
        for d in want:
            assert got[d] == pytest.approx(float(hr.score[d]), rel=1e-5, abs=1e-6)
