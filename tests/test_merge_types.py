"""ScoreMergeType (sum/max/min/noop) on And/Or + variadic phrase parts."""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MemoryDirectory

DOCS = [
    "apple apple banana",      # 0
    "apple banana banana",     # 1
    "apple cherry",            # 2
    "banana",                  # 3
    "apfel appla able",        # 4 fuzzy neighbors of apple
]


@pytest.fixture(scope="module")
def reader():
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for t in DOCS:
            w.insert([Field("body", t, analyzer="segmentation")])
        w.commit()
    return DirectoryReader.open(d)


def scores_of(reader, flt, scorer=BM25()):
    q = HostQuery(flt, list(reader.segments), scorer)
    r = q.execute(0)
    return r.match, r.score


@pytest.mark.parametrize("merge", ["sum", "max", "min", "noop"])
def test_or_merge_types_host(reader, merge):
    a = F.ByTerm("body", "apple")
    b = F.ByTerm("body", "banana")
    _, sa = scores_of(reader, a)
    _, sb = scores_of(reader, b)
    ma, _ = scores_of(reader, a)
    mb, _ = scores_of(reader, b)
    match, s = scores_of(reader, F.Or(a, b, merge=merge))
    for d in range(len(DOCS)):
        if not match[d]:
            continue
        vals = []
        if ma[d]:
            vals.append(sa[d])
        if mb[d]:
            vals.append(sb[d])
        want = {
            "sum": sum(vals),
            "max": max(vals),
            "min": min(vals),
            "noop": 0.0,
        }[merge]
        assert s[d] == pytest.approx(want, rel=1e-6), (merge, d)


@pytest.mark.parametrize("merge", ["sum", "max", "min"])
def test_and_merge_types_host(reader, merge):
    a = F.ByTerm("body", "apple")
    b = F.ByTerm("body", "banana")
    _, sa = scores_of(reader, a)
    _, sb = scores_of(reader, b)
    match, s = scores_of(reader, F.And(a, b, merge=merge))
    for d in (0, 1):
        assert match[d]
        want = {"sum": sa[d] + sb[d], "max": max(sa[d], sb[d]), "min": min(sa[d], sb[d])}[merge]
        assert s[d] == pytest.approx(want, rel=1e-6)


@pytest.mark.parametrize("merge", ["sum", "max", "min", "noop"])
@pytest.mark.parametrize("mk", [
    lambda m: F.Or(F.ByTerm("body", "apple"), F.ByTerm("body", "banana"), merge=m),
    lambda m: F.And(F.ByTerm("body", "apple"), F.ByTerm("body", "banana"), merge=m),
    lambda m: F.Or(
        F.ByTerm("body", "apple"), F.ByTerm("body", "banana"),
        F.ByTerm("body", "cherry"), min_match=2, merge=m,
    ),
])
def test_device_matches_host_merge(reader, merge, mk):
    import math

    from iresearch_tpu.exec import DeviceQuery

    flt = mk(merge)
    segs = list(reader.segments)
    hq = HostQuery(flt, segs, BM25())
    hr = hq.execute(0)
    dq = DeviceQuery(flt, segs, BM25())
    vals, docs = dq.execute_segment(0, 8)
    got = {int(d): float(v) for v, d in zip(vals, docs)
           if not (math.isinf(v) and v < 0)}
    assert set(got) == set(np.flatnonzero(hr.match).tolist())
    for d in got:
        assert got[d] == pytest.approx(float(hr.score[d]), rel=1e-5, abs=1e-6)


def test_variadic_phrase_parts(reader):
    """Phrase with prefix/fuzzy/set parts (reference: by_phrase variadic,
    phrase_filter.hpp:41-139). Host path; device falls back automatically."""
    flt = F.ByPhrase("body", [F.PhrasePrefix(b"app"), F.PhraseTerm(b"banana")])
    match, score = scores_of(reader, flt)
    assert set(np.flatnonzero(match)) == {0, 1}
    flt2 = F.ByPhrase("body", [
        F.PhraseSet([b"apple", b"apfel"]), F.PhraseTerm(b"cherry"),
    ])
    match2, _ = scores_of(reader, flt2)
    assert set(np.flatnonzero(match2)) == {2}
    flt3 = F.ByPhrase("body", [
        F.PhraseFuzzy(b"aple", max_distance=1), F.PhraseTerm(b"banana"),
    ])
    match3, _ = scores_of(reader, flt3)
    assert set(np.flatnonzero(match3)) == {0, 1}
    # device query with a variadic phrase must agree (host-aux fallback)
    from iresearch_tpu.exec import DeviceQuery

    dq = DeviceQuery(flt, list(reader.segments), BM25())
    assert not dq.plan(0).device_aux  # fell back
    vals, docs = dq.execute_segment(0, 8)
    got = {int(d) for v, d in zip(vals, docs) if np.isfinite(v)}
    assert got == {0, 1}
