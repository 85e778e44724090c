"""Native C++ components vs their Python twins.

The library is built on demand (make -C native); if no compiler is
available these tests are skipped and the Python fallbacks carry the
suite.
"""

import numpy as np
import pytest

from iresearch_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


def python_tokens(text, case="lower", word_break="alpha"):
    """The pure-Python segmentation path, bypassing the native shortcut."""
    from iresearch_tpu.analysis.analyzers import _WORD_RE

    out = []
    for m in _WORD_RE.finditer(text):
        w = m.group(0).strip("'")
        if not w:
            continue
        if word_break == "alpha" and not any(c.isalpha() for c in w):
            if not any(c.isdigit() for c in w):
                continue
        if case == "lower":
            w = w.lower()
        elif case == "upper":
            w = w.upper()
        out.append(w.encode())
    return out


@pytest.mark.parametrize("text", [
    "The quick brown fox",
    "it's a dog's life -- really!",
    "  '''quoted''' and_under_scored 123 42abc ___ ",
    "",
    "UPPER lower MiXeD",
    "a",
    "don't stop believing'",
])
@pytest.mark.parametrize("case", ["lower", "none", "upper"])
@pytest.mark.parametrize("wb", ["alpha", "all"])
def test_tokenizer_parity(lib, text, case, wb):
    got = native.tokenize_ascii(text, case, wb)
    assert got is not None
    buf, spans = got
    terms = [buf[s:e] for s, e in spans]
    assert terms == python_tokens(text, case, wb)


def test_tokenizer_rejects_non_ascii(lib):
    assert native.tokenize_ascii("héllo wörld", "lower", "alpha") is None


def test_analyzer_uses_native(lib):
    from iresearch_tpu.analysis.analyzers import SegmentationAnalyzer

    a = SegmentationAnalyzer()
    toks = a.tokenize("The quick brown fox")
    assert [t.term for t in toks] == [b"the", b"quick", b"brown", b"fox"]
    assert [t.position for t in toks] == [0, 1, 2, 3]


@pytest.mark.parametrize("with_tr", [False, True])
@pytest.mark.parametrize("max_d", [1, 2, 3, 4])
def test_levenshtein_parity(lib, rng, with_tr, max_d):
    from iresearch_tpu.search.expand import levenshtein_distances

    alphabet = "abcd"
    cands = [
        "".join(rng.choice(list(alphabet), size=rng.integers(0, 9)))
        for _ in range(300)
    ] + ["abc", "abcd", "acbd", "ba", ""]
    query = "abca"
    # python reference (full DP, no banding)
    ref = levenshtein_distances(cands, query, with_tr)  # no max_d -> numpy

    L = max(max(len(c) for c in cands), 1)
    cand_arr = np.zeros((len(cands), L), np.uint32)
    for i, c in enumerate(cands):
        if c:
            cand_arr[i, : len(c)] = np.frombuffer(
                c.encode("utf-32-le"), np.uint32
            )
    lens = np.fromiter((len(c) for c in cands), np.int32, count=len(cands))
    q = np.frombuffer(query.encode("utf-32-le"), np.uint32)
    got = native.levenshtein_batch(cand_arr, lens, q, max_d, with_tr)
    assert got is not None
    want = np.minimum(ref, max_d + 1)
    np.testing.assert_array_equal(got, want)


def test_crc32c(lib):
    # crc32c("123456789") is the classic check value
    assert native.crc32c(b"123456789") == 0xE3069283


def test_termdict(lib):
    d = native.TermDict()
    assert d.add(b"foo") == 0
    assert d.add(b"bar") == 1
    assert d.add(b"foo") == 0
    assert len(d) == 2
    assert d.terms() == [b"foo", b"bar"]
    tids = d.tokenize_to_tids("Foo BAR baz foo", "lower", "alpha")
    assert tids.tolist() == [0, 1, 2, 0]
    assert d.terms() == [b"foo", b"bar", b"baz"]


def test_index_identical_native_vs_python(lib, monkeypatch):
    """Same corpus indexed through the native and the fallback paths must
    answer queries identically (incl. a mixed ascii/unicode doc, which
    exercises the chunk/scalar stream merge)."""
    import numpy as np

    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.host_eval import search
    from iresearch_tpu.store.directory import MemoryDirectory

    docs = [
        "alpha beta gamma",
        "beta gamma délta unicode",  # forces scalar fallback mid-stream
        "alpha alpha beta",
        "gamma",
    ]

    def build():
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            for t in docs:
                w.insert([Field("body", t, analyzer="segmentation")])
            w.commit()
        return DirectoryReader.open(d)

    r_native = build()
    import iresearch_tpu.native as nat

    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", True)
    r_python = build()
    for flt in [
        F.ByTerm("body", "alpha"),
        F.ByTerm("body", "délta"),
        F.ByPhrase("body", ["beta", "gamma"]),
        F.Or(F.ByTerm("body", "beta"), F.ByTerm("body", "gamma")),
    ]:
        h1 = search(r_native, flt, k=10)
        h2 = search(r_python, flt, k=10)
        assert h1 == h2, (flt, h1, h2)


def test_utf8_bulk_tids_matches_python():
    """The native UTF-8 tokenizer must be byte-identical to the Python
    segmentation analyzer (tables generated from the same runtime)."""
    from iresearch_tpu.analysis import get as get_analyzer
    from iresearch_tpu.native import TermDict, load

    if load() is None:
        import pytest

        pytest.skip("native lib unavailable")
    texts = [
        "Grüße aus München — Äpfel und Öl!",
        "naïve café déjà-vu; Россия Москва 2024",
        "O'Neill's 'quoted' l'été d'accord",
        "ελληνικά ΚΕΙΜΕΝΟ",  # plain sigma only
        "çağrı ÇAĞRI ıspanak İstanbul",
    ]
    for case in ("lower", "none", "upper"):
        an = get_analyzer("segmentation")
        an._case = case
        for text in texts:
            td = TermDict()
            tids = td.tokenize_to_tids(text, case, "alpha")
            want = [t.term for t in an.tokenize(text)]
            if tids is None:
                continue  # fallback allowed (case-complex cps)
            terms = td.terms()
            got = [terms[i] for i in tids]
            assert got == want, (case, text, got, want)
    # CJK input is NOT the native tokenizer's contract anymore: the
    # analyzer defers it to the dictionary word break (analysis/cjk.py,
    # covered by test_cjk.py) — bulk_tids must decline, not mis-split
    an = get_analyzer("segmentation")
    for text in ["日本語のテキストと English words mixed", "数字123と半角ｶﾅ"]:
        assert an.bulk_tids(text, TermDict()) is None, text


def test_utf8_case_complex_falls_back():
    from iresearch_tpu.native import TermDict, load

    if load() is None:
        import pytest

        pytest.skip("native lib unavailable")
    td = TermDict()
    # ß upper-cases to SS (multi-char) and final sigma is context-
    # sensitive: both must fall back under folding, not mis-tokenize
    assert td.tokenize_to_tids("straße ΣΟΦΟΣ", "lower", "alpha") is None
    # but pass through untouched with case=none
    out = td.tokenize_to_tids("straße ΣΟΦΟΣ", "none", "alpha")
    assert out is not None and len(out) == 2
