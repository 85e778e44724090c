"""Dictionary-based CJK word segmentation (VERDICT r3 missing #2).

Reference: the `segmentation`/`text` analyzers run ICU BreakIterator,
whose Han handling is a dictionary Viterbi (CjkBreakEngine over cjdict;
segmentation_token_stream.hpp:33). analysis/cjk.py implements the same
max-unigram-log-probability objective over an open frequency lexicon.
"""

import numpy as np
import pytest

from iresearch_tpu.analysis import get as get_analyzer
from iresearch_tpu.analysis.cjk import lexicon, split_word
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import search as host_search
from iresearch_tpu.store.directory import MemoryDirectory

pytestmark = pytest.mark.skipif(
    lexicon() is None, reason="no CJK lexicon available in this image"
)


def test_han_dictionary_split():
    words = [w for w, _, _ in split_word("我们在北京大学学习自然语言处理")]
    assert words == ["我们", "在", "北京大学", "学习", "自然语言", "处理"]


def test_script_boundaries_and_offsets():
    # kana runs break at script bounds; offsets are char-exact
    subs = split_word("去东京スカイツリー")
    assert [w for w, _, _ in subs] == ["去", "东京", "スカイツリー"]
    assert [(s, e) for _, s, e in subs] == [(0, 1), (1, 3), (3, 9)]


def test_oov_degrades_to_per_character():
    # a run of rare-in-lexicon characters must split, never glue into one
    # giant unlookupable token
    subs = split_word("𬺰" * 3 if False else "烎烎烎")
    assert all(len(w) <= 2 for w, _, _ in subs)


def test_segmentation_analyzer_mixed():
    an = get_analyzer("segmentation")
    toks = [t.term.decode() for t in an.tokenize("我们在北京大学 hello WORLD")]
    assert toks == ["我们", "在", "北京大学", "hello", "world"]
    # positions are sequential across the CJK split
    assert [t.position for t in an.tokenize("我们在北京")] == [0, 1, 2]


def test_text_analyzer_cjk_not_stemmed():
    an = get_analyzer("text", {"locale": "en"})
    toks = [t.term.decode() for t in an.tokenize("running 北京大学")]
    assert toks == ["run", "北京大学"]


def test_index_and_search_chinese_end_to_end():
    docs = [
        "我们在北京大学学习自然语言处理",
        "他们在清华大学研究计算机",
        "北京的天气很好",
        "大学生活非常充实",
    ]
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i, t in enumerate(docs):
            w.insert([
                Field("body", t, analyzer="segmentation"),
                Field("id", str(i), index=True, store=True),
            ])
        w.commit()
    r = DirectoryReader.open(d)

    def ids(flt):
        # single segment: global doc == local doc
        return {
            int(r.segments[0].data.columns["id"].get(doc))
            for doc, _ in host_search(r, flt, k=10)
        }

    # "北京大学" is ONE dictionary word: docs 0 matches; doc 2 has 北京
    # and doc 3 has 大学 but neither has the compound
    assert ids(F.ByTerm("body", "北京大学")) == {0}
    assert ids(F.ByTerm("body", "北京")) == {2}
    assert ids(F.ByTerm("body", "大学")) == {3}
    # phrase across the dictionary split: 学习 directly follows 北京大学
    assert ids(F.ByPhrase("body", ["北京大学", "学习"])) == {0}
    assert ids(F.And(F.ByTerm("body", "在"), F.ByTerm("body", "研究"))) == {1}


def test_device_oracle_parity_chinese():
    """The exactness gate holds for CJK-tokenized corpora too."""
    from iresearch_tpu.exec import DeviceQuery
    from iresearch_tpu.search.host_eval import HostQuery
    from iresearch_tpu.search.scorers import BM25
    from tests.topk_util import assert_topk_equiv

    rng = np.random.default_rng(3)
    base = "我们 在 北京大学 学习 自然 语言 处理 研究 计算机 天气".split()
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for _ in range(120):
            n = int(rng.integers(3, 12))
            idx = rng.integers(0, len(base), size=n)
            w.insert([
                Field(
                    "body",
                    "".join(base[j] for j in idx),  # no spaces: real CJK text
                    analyzer="segmentation",
                )
            ])
        w.commit()
    r = DirectoryReader.open(d)
    for flt in [
        F.ByTerm("body", "北京大学"),
        F.Or(F.ByTerm("body", "学习"), F.ByTerm("body", "研究")),
        F.ByPhrase("body", ["自然", "语言"]),
    ]:
        hq = HostQuery(flt, list(r.segments), BM25())
        dq = DeviceQuery(flt, list(r.segments), BM25())
        assert_topk_equiv(dq.top_k(10), hq.top_k(10))
