"""Device phrase execution vs host oracle."""

import math

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25, TFIDF
from iresearch_tpu.store.directory import MemoryDirectory

WORDS = ["red", "fox", "ran", "far", "dog", "sat", "mat", "cat"]


@pytest.fixture(scope="module")
def reader():
    rng = np.random.default_rng(17)
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(600):
            n = int(rng.integers(3, 25))
            text = " ".join(WORDS[j] for j in rng.integers(0, len(WORDS), n))
            w.insert([Field("body", text, analyzer="segmentation"),
                      Field("id", str(i), index=True, store=True)])
        w.commit()
        w.remove(F.ByTerm("id", "11"))
        w.commit()
    return DirectoryReader.open(d)


PHRASES = [
    F.ByPhrase("body", ["red", "fox"]),
    F.ByPhrase("body", ["fox", "ran", "far"]),
    F.ByPhrase("body", ["dog", "dog"]),
    F.ByPhrase("body", ["cat", "sat", "mat"]),
    F.ByPhrase("body", ["red", "nothere"]),
    F.And(F.ByPhrase("body", ["red", "fox"]), F.ByTerm("body", "dog")),
    F.Or(F.ByPhrase("body", ["red", "fox"]), F.ByPhrase("body", ["dog", "sat"])),
]


@pytest.mark.parametrize("flt", PHRASES, ids=lambda f: repr(id(f))[-5:])
@pytest.mark.parametrize("scorer", [BM25(), TFIDF()], ids=["bm25", "tfidf"])
def test_device_phrase_matches_host(reader, flt, scorer):
    from iresearch_tpu.exec import DeviceQuery

    segs = list(reader.segments)
    hq = HostQuery(flt, segs, scorer)
    dq = DeviceQuery(flt, segs, scorer)  # device_phrase on by default
    # confirm the device path actually engaged for pure phrases
    if isinstance(flt, F.ByPhrase) and b"nothere" not in repr(flt).encode():
        assert dq.plan(0).device_aux, "device phrase path should be active"
    for s in range(len(segs)):
        hr = hq.execute(s)
        nmatch = int(hr.match.sum())
        k = min(dq.plan(s).nd_pad, max(16, nmatch + 4))
        vals, docs = dq.execute_segment(s, k)
        got = {int(d): float(v) for v, d in zip(vals, docs)
               if not (math.isinf(v) and v < 0)}
        assert set(got) == set(np.flatnonzero(hr.match).tolist())
        for d in got:
            assert got[d] == pytest.approx(float(hr.score[d]), rel=1e-5, abs=1e-6)
