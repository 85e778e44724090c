"""Byte-DFA wildcard intersection (search/automaton.py + native scan)
vs the regex oracle — including UTF-8 multi-byte `_`, leading `%`,
escapes, and subtree skipping over a sorted dictionary.
"""

import numpy as np
import pytest

from iresearch_tpu import native
from iresearch_tpu.search.automaton import dfa_matches_python, wildcard_dfa
from iresearch_tpu.search.expand import wildcard_to_regex


def _dict(strs):
    terms = sorted({s.encode("utf-8") for s in strs})
    blob = b"".join(terms)
    offs = np.zeros(len(terms) + 1, np.int64)
    offs[1:] = np.cumsum([len(t) for t in terms])
    return terms, blob, offs


TERMS = [
    "alpha", "alphabet", "beta", "beet", "bat", "böse", "bäume",
    "日本語", "日本", "naïve", "na_ve", "a%b", "", "z" * 30,
    "ab'cd", "Ålesund", "ålesund", "中文字", "中", "ααα",
]
PATTERNS = [
    "%", "a%", "%a", "%et", "b_t", "日本%", "%本%", "b__e", "n%ve",
    "a\\%b", "%ä%", "___", "%_", "中_字", "%%%a%%", "al_ha%",
]


def _regex_matches(terms, pattern):
    rx = wildcard_to_regex(pattern.encode("utf-8"))
    return [
        i
        for i, t in enumerate(terms)
        if rx.fullmatch(t.decode("utf-8", "replace")) is not None
    ]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_dfa_equals_regex(pattern):
    terms, blob, offs = _dict(TERMS)
    dfa = wildcard_dfa(pattern.encode("utf-8"))
    assert dfa is not None
    want = _regex_matches(terms, pattern)
    got_py = dfa_matches_python(dfa[0], dfa[1], terms, 0, len(terms))
    assert got_py == want, (pattern, got_py, want)
    got_nat = native.dfa_intersect(blob, offs, 0, len(terms), dfa[0], dfa[1])
    if got_nat is not None:
        assert list(got_nat) == want, (pattern, list(got_nat), want)


def test_dfa_random_fuzz(rng):
    alphabet = "abcdé日"
    terms = [
        "".join(
            alphabet[int(x)] for x in rng.integers(0, len(alphabet), size=rng.integers(0, 6))
        )
        for _ in range(300)
    ]
    terms_b, blob, offs = _dict(terms)
    pat_chars = "%_abé"
    for _ in range(40):
        pat = "".join(
            pat_chars[int(x)]
            for x in rng.integers(0, len(pat_chars), size=rng.integers(1, 6))
        )
        dfa = wildcard_dfa(pat.encode("utf-8"))
        if dfa is None:
            continue
        want = _regex_matches(terms_b, pat)
        got = native.dfa_intersect(blob, offs, 0, len(terms_b), dfa[0], dfa[1])
        if got is None:
            got = dfa_matches_python(dfa[0], dfa[1], terms_b, 0, len(terms_b))
            got = list(got)
        else:
            got = list(got)
        assert got == want, (pat, got, want)


def test_subrange_intersection():
    terms, blob, offs = _dict(TERMS)
    dfa = wildcard_dfa(b"%a%")
    lo, hi = 3, len(terms) - 2
    want = [i for i in _regex_matches(terms, "%a%") if lo <= i < hi]
    got = native.dfa_intersect(blob, offs, lo, hi, dfa[0], dfa[1])
    if got is None:
        pytest.skip("native lib unavailable")
    assert list(got) == want


def test_wildcard_filter_uses_dfa(rng):
    """End-to-end ByWildcard over an index stays regex-exact."""
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.host_eval import HostQuery
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.store.directory import MemoryDirectory

    words = ["cat", "car", "card", "care", "dog", "día", "día2", "döner"]
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(120):
            toks = [words[int(x)] for x in rng.integers(0, len(words), size=5)]
            w.insert([Field("body", " ".join(toks), analyzer="segmentation")])
        w.commit()
    r = DirectoryReader.open(d)
    for pat in ["%ar%", "c_r_", "d%", "%a%"]:
        flt = F.ByWildcard("body", pat)
        hits = HostQuery(flt, list(r.segments), BM25()).top_k(10)
        # cross-check the matched term set against per-term regex
        rx = wildcard_to_regex(pat.encode())
        tl = r.segments[0].terms("body")
        want_tids = {
            i for i in range(len(tl))
            if rx.fullmatch(tl[i].decode("utf-8", "replace"))
        }
        from iresearch_tpu.search.expand import expand_leaf

        exp = expand_leaf(flt, list(r.segments))
        got_tids = {h.tid for h in exp.scored} | {
            h.tid for h in exp.unscored
        }
        for s, arr in exp.unscored_tids.items():
            got_tids |= set(int(x) for x in arr)
        assert got_tids == want_tids, (pat, got_tids, want_tids)
        assert isinstance(hits, list)
