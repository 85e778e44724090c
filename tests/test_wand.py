"""WAND (block-max pruning) vs exhaustive equivalence.

Reference analog: tests/search/wand_test.cpp — the wanderator must return
exactly the same top-k as exhaustive scoring.
"""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory

WORDS = [f"w{i:02d}" for i in range(40)]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(21)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(3000):  # enough docs for multi-block lists
            n = int(rng.integers(3, 40))
            idx = np.minimum(rng.zipf(1.3, size=n) - 1, len(WORDS) - 1)
            w.insert([Field("body", " ".join(WORDS[j] for j in idx), analyzer="segmentation")])
        w.commit()
    return DirectoryReader.open(d)


QUERIES = [
    F.ByTerm("body", "w00"),  # highest df — many blocks
    F.ByTerm("body", "w05"),
    F.ByTerms("body", [("w00", 1.0), ("w03", 2.0), ("w11", 1.0)]),
    F.Or(F.ByTerm("body", "w00"), F.ByTerm("body", "w01"), F.ByTerm("body", "w07")),
    F.ByPrefix("body", "w1", scored_terms_limit=4),  # has unscored terms
]


@pytest.mark.parametrize("flt", QUERIES, ids=lambda f: type(f).__name__ + repr(id(f))[-4:])
@pytest.mark.parametrize("scorer", [BM25(), TFIDF()], ids=["bm25", "tfidf"])
@pytest.mark.parametrize("k", [1, 10, 100])
def test_wand_equals_exhaustive(reader, flt, scorer, k, monkeypatch):
    import iresearch_tpu.exec.plan as planmod
    from iresearch_tpu.exec import DeviceQuery

    # multi-span queries normally take the merge tier (WAND-free by
    # design); disable it so WAND itself is exercised
    monkeypatch.setattr(planmod, "JOIN_MAX_SPANS", 0)
    segs = list(reader.segments)
    exact = DeviceQuery(flt, segs, scorer, wand=False)
    wand = DeviceQuery(flt, segs, scorer, wand=True, wand_sample=8)
    p = wand.plan(0)
    assert (bool(p.groups) and p.groups[0].ub is not None) or any(
        d.ub is not None for d in p.dense_spans
    ), "wand must be active for this plan"
    ev, ed = exact.execute_segment(0, k)
    wv, wd = wand.execute_segment(0, k)
    finite = np.isfinite(ev)
    np.testing.assert_array_equal(np.isfinite(wv), finite)
    np.testing.assert_allclose(wv[finite], ev[finite], rtol=1e-6)
    # doc ids must agree except where adjacent scores tie within float
    # tolerance (scatter order differs between the two kernels)
    from tests.topk_util import assert_topk_equiv

    assert_topk_equiv(
        [(int(d), float(v)) for d, v in zip(wd[finite], wv[finite])],
        [(int(d), float(v)) for d, v in zip(ed[finite], ev[finite])],
    )


TREE_QUERIES = [
    F.And(F.ByTerm("body", "w00"), F.ByTerm("body", "w01")),
    F.And(F.ByTerm("body", "w00"), F.ByTerm("body", "w03"), F.ByTerm("body", "w05")),
    F.Or(
        F.ByTerm("body", "w00"), F.ByTerm("body", "w01"),
        F.ByTerm("body", "w02"), min_match=2,
    ),
    F.And(
        F.Or(F.ByTerm("body", "w00"), F.ByTerm("body", "w04")),
        F.ByTerms("body", [("w01", 1.0), ("w06", 2.0)]),
    ),
]


@pytest.mark.parametrize("flt", TREE_QUERIES, ids=lambda f: repr(id(f))[-5:])
@pytest.mark.parametrize("k", [1, 10, 50])
@pytest.mark.parametrize("force_wand", [False, True], ids=["auto", "treewand"])
def test_tree_wand_equals_exhaustive(reader, flt, k, force_wand, monkeypatch):
    """WAND generalizes to sum-merged AND/OR trees (BlockConjunction
    analog) and must stay exact. Conjunctions normally take the join tier
    (which supersedes WAND there); force_wand disables join to exercise
    tree-WAND itself."""
    import iresearch_tpu.exec.plan as planmod
    from iresearch_tpu.exec import DeviceQuery
    from tests.topk_util import assert_topk_equiv

    if force_wand:
        monkeypatch.setattr(planmod, "JOIN_MAX_RATIO", 0.0)
    segs = list(reader.segments)
    exact = DeviceQuery(flt, segs, BM25(), wand=False)
    wand = DeviceQuery(flt, segs, BM25(), wand=True, wand_sample=8)
    p = wand.plan(0)
    has_ub = (bool(p.groups) and p.groups[0].ub is not None) or any(
        d.ub is not None for d in p.dense_spans
    )
    assert has_ub or p.exec_mode == "join", (
        "an accelerated tier (tree-wand or join) must engage"
    )
    if force_wand:
        assert has_ub, "tree-wand must engage"
    ev, ed = exact.execute_segment(0, k)
    wv, wd = wand.execute_segment(0, k)
    finite = np.isfinite(ev)
    np.testing.assert_array_equal(np.isfinite(wv), finite)
    assert_topk_equiv(
        [(int(d), float(v)) for d, v in zip(wd[finite], wv[finite])],
        [(int(d), float(v)) for d, v in zip(ed[finite], ev[finite])],
    )


def test_wand_not_applied_to_unsafe_trees(reader):
    from iresearch_tpu.exec import DeviceQuery

    for flt in [
        F.And(F.ByTerm("body", "w00"), F.Not(F.ByTerm("body", "w01"))),
        F.Or(F.ByTerm("body", "w00"), F.ByTerm("body", "w01"), merge="max"),
        F.And(F.ByTerm("body", "w00"), F.ByPhrase("body", ["w01", "w02"])),
    ]:
        dq = DeviceQuery(flt, list(reader.segments), wand=True)
        p = dq.plan(0)
        assert not p.groups or p.groups[0].ub is None, flt


def test_or_collapse_single_leaf(reader):
    """Or of term leaves with min_match=1 compiles to ONE merged leaf."""
    from iresearch_tpu.exec import DeviceQuery

    flt = F.Or(F.ByTerm("body", "w00"), F.ByTerm("body", "w01"))
    dq = DeviceQuery(flt, list(reader.segments))
    assert dq.plan(0).tree == ("leaf", 0)
    flt2 = F.Or(F.ByTerm("body", "w00"), F.ByTerm("body", "w01"), min_match=2)
    dq2 = DeviceQuery(flt2, list(reader.segments))
    assert dq2.plan(0).tree[0] == "or"
