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


def _brute_dl(a: str, b: str, transpositions: bool) -> int:
    """Reference (Damerau-)Levenshtein distance, O(|a||b|)."""
    la, lb = len(a), len(b)
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                transpositions
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


@pytest.mark.parametrize("transpositions", [False, True], ids=["lev", "dam"])
@pytest.mark.parametrize("d", [1, 2])
def test_levenshtein_dfa_equals_dp(rng, d, transpositions):
    """The Levenshtein byte DFA accepts EXACTLY the terms within
    distance d of the target — verified against a brute-force DP over a
    random multi-byte dictionary (reference parity:
    levenshtein_filter.cpp DFA x term-index intersection)."""
    from iresearch_tpu.search.automaton import levenshtein_dfa

    alphabet = "abcé日"
    terms = [
        "".join(
            alphabet[int(x)]
            for x in rng.integers(0, len(alphabet), size=rng.integers(0, 7))
        )
        for _ in range(400)
    ]
    terms_b, blob, offs = _dict(terms)
    targets = ["abc", "é日a", "", "aaaa", "cbca", "日日"]
    for tgt in targets:
        dfa = levenshtein_dfa(tgt, d, transpositions)
        assert dfa is not None
        want = [
            i
            for i, t in enumerate(terms_b)
            if _brute_dl(t.decode("utf-8"), tgt, transpositions) <= d
        ]
        got = native.dfa_intersect(blob, offs, 0, len(terms_b), dfa[0], dfa[1])
        if got is None:
            got = dfa_matches_python(
                dfa[0], dfa[1], terms_b, 0, len(terms_b)
            )
        assert list(got) == want, (tgt, d, transpositions)


def test_levenshtein_dfa_prefix(rng):
    """flt.prefix bytes are matched exactly before the fuzzy suffix."""
    from iresearch_tpu.search.automaton import levenshtein_dfa

    terms = ["preabc", "preabd", "prabc", "preaxd", "pre", "preab"]
    terms_b, blob, offs = _dict(terms)
    dfa = levenshtein_dfa("abc", 1, False, prefix=b"pre")
    want = [
        i
        for i, t in enumerate(terms_b)
        if t.startswith(b"pre")
        and _brute_dl(t[3:].decode(), "abc", False) <= 1
    ]
    got = dfa_matches_python(dfa[0], dfa[1], terms_b, 0, len(terms_b))
    assert list(got) == want


def test_fuzzy_expansion_uses_dfa(rng):
    """ByEditDistance expansion through expand_leaf matches the banded-DP
    band path exactly (same hits, same boosts) and engages the DFA."""
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.index.writer import Field, IndexWriter
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.expand import expand_leaf
    from iresearch_tpu.search import automaton as am
    from iresearch_tpu.store.directory import MemoryDirectory

    words = ["cat", "cut", "cart", "chart", "dog", "dig", "doge", "日本", "日木"]
    d = MemoryDirectory()
    with IndexWriter(d) as w:
        for i, word in enumerate(words * 3):
            w.insert([Field("body", word, analyzer="segmentation")])
        w.commit()
    r = DirectoryReader.open(d)
    for term, dist in [(b"cat", 1), (b"dog", 2), ("日本".encode(), 1)]:
        flt = F.ByEditDistance("body", term, max_distance=dist)
        exp = expand_leaf(flt, list(r.segments))
        got = sorted(
            (h.tid, round(h.boost, 6)) for h in exp.scored + exp.unscored
        )
        # band path: force the DFA off by failing its construction
        import unittest.mock as mock

        with mock.patch.object(am, "levenshtein_dfa", lambda *a, **k: None):
            exp2 = expand_leaf(flt, list(r.segments))
        want = sorted(
            (h.tid, round(h.boost, 6)) for h in exp2.scored + exp2.unscored
        )
        assert got == want, (term, dist, got, want)


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


def test_native_determinizer_equals_python():
    """irs_dfa_determinize must produce the BIT-IDENTICAL table the
    Python subset construction does (same discovery order, same dead
    marks, same accepts) for both wildcard and Levenshtein NFAs — the
    native path is a pure speedup of fuzzy/wildcard prepare, never a
    behavior change (reference amortizes this cost with precomputed
    parametric tables, levenshtein_default_pdp.cpp)."""
    from iresearch_tpu.search import automaton as A

    if native.load() is None or getattr(
        native.load(), "irs_dfa_determinize", None
    ) is None:
        pytest.skip("native library unavailable")

    def python_only(fn, *args, **kw):
        orig = A._native_determinize
        orig_lev = A._native_lev_build
        A._native_determinize = lambda *a: None
        A._native_lev_build = lambda *a: None
        try:
            return fn(*args, **kw)
        finally:
            A._native_determinize = orig
            A._native_lev_build = orig_lev

    for pat in PATTERNS:
        nat = A.wildcard_dfa(pat.encode("utf-8"))
        py = python_only(A.wildcard_dfa, pat.encode("utf-8"))
        assert (nat is None) == (py is None), pat
        if nat is not None:
            assert np.array_equal(nat[0], py[0]), pat
            assert np.array_equal(nat[1], py[1]), pat
    for term, d, tr, pref in [
        ("kimberly", 1, True, b""),
        ("example", 2, True, b""),
        ("björk", 1, True, b""),
        ("国际", 2, False, b""),
        ("team", 1, False, b"up"),
    ]:
        nat = A.levenshtein_dfa(term, d, with_transpositions=tr, prefix=pref)
        py = python_only(
            A.levenshtein_dfa, term, d, with_transpositions=tr, prefix=pref
        )
        assert (nat is None) == (py is None), term
        if nat is not None:
            assert np.array_equal(nat[0], py[0]), term
            assert np.array_equal(nat[1], py[1]), term


def test_native_lev_build_equals_python():
    """irs_lev_dfa_build (one-call native NFA construction +
    determinization) must produce the BIT-IDENTICAL tables the Python NFA
    assembly does — same state numbering, same mid-state emission order —
    for ASCII, multi-byte UTF-8, prefixes, transpositions, and d up to 3.
    Pure speedup of fuzzy prepare, never a behavior change (reference
    amortizes construction with parametric tables,
    levenshtein_default_pdp.cpp)."""
    from iresearch_tpu.search import automaton as A

    lib = native.load()
    if lib is None or getattr(lib, "irs_lev_dfa_build", None) is None:
        pytest.skip("native library unavailable")

    def nfa_python(fn, *args, **kw):
        orig_lev = A._native_lev_build
        A._native_lev_build = lambda *a: None
        try:
            return fn(*args, **kw)
        finally:
            A._native_lev_build = orig_lev

    cases = [
        ("a", 1, False, b""),
        ("kimberly", 1, True, b""),
        ("kimberly", 2, True, b""),
        ("example", 3, False, b""),
        ("björk", 1, True, b""),
        ("björk", 2, False, b""),
        ("国际机场", 1, True, b""),
        ("\U0001F600ab", 1, False, b""),  # 4-byte UTF-8
        ("team", 1, False, b"up"),
        ("straße", 2, True, "pré".encode("utf-8")),
        ("", 1, False, b""),
        ("", 2, True, b"pre"),
    ]
    for term, d, tr, pref in cases:
        nat = A.levenshtein_dfa(term, d, with_transpositions=tr, prefix=pref)
        py = nfa_python(
            A.levenshtein_dfa, term, d, with_transpositions=tr, prefix=pref
        )
        assert (nat is None) == (py is None), (term, d, tr, pref)
        if nat is not None:
            assert np.array_equal(nat[0], py[0]), (term, d, tr, pref)
            assert np.array_equal(nat[1], py[1]), (term, d, tr, pref)
