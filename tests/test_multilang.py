"""Multi-language analysis: locale-parameterized snowball stemming +
stopwords (reference: text_token_stream.cpp:944-971 locale config;
external/snowball stemmer set; text_token_stemming_stream.hpp:42).

Stem vectors below are frozen snowball outputs (published algorithms),
so locale-routing regressions (cache bugs, normalization bugs) are
caught even though the backing implementation is shared.
"""

import pytest

from iresearch_tpu.analysis import get
from iresearch_tpu.analysis.analyzers import TextAnalyzer
from iresearch_tpu.analysis.snowball import normalize_locale, stemmer, supported_locales
from iresearch_tpu.analysis.stopwords_data import STOPWORDS, load_stopwords_path

# language -> {word: snowball stem} (snowball reference outputs)
VECTORS = {
    "de": {
        "aufeinander": "aufeinand",
        "katzen": "katz",
        "laufen": "lauf",
    },
    "fr": {
        "continuellement": "continuel",
        "chevaux": "cheval",
        "nationale": "national",
    },
    "es": {
        "corriendo": "corr",
        "nacionales": "nacional",
        "comieron": "com",
    },
    "ru": {
        "книгами": "книг",
        "красивая": "красив",
        "говорить": "говор",
    },
    "pt": {"correndo": "corr", "felizmente": "feliz", "gatos": "gat"},
    "it": {"correndo": "corr", "nazionali": "nazional", "gatti": "gatt"},
    "nl": {"lopende": "lopend", "huizen": "huiz", "katten": "kat"},
}


class TestSnowball:
    def test_locale_normalization(self):
        assert normalize_locale("de_DE.UTF-8") == "de"
        assert normalize_locale("pt-BR") == "pt"
        assert normalize_locale("RU") == "ru"

    @pytest.mark.parametrize("lang", sorted(VECTORS))
    def test_reference_vectors(self, lang):
        st = stemmer(lang)
        assert st is not None, f"no stemmer for {lang}"
        for word, want in VECTORS[lang].items():
            assert st(word) == want

    def test_english_is_porter2(self):
        from iresearch_tpu.analysis.porter2 import stem as p2

        st = stemmer("en_US")
        assert st("happiness") == p2("happiness") == "happi"

    def test_unknown_locale_returns_none_and_counts(self):
        from iresearch_tpu.utils.metrics import registry

        before = registry().counter_value(
            "irs_stem_identity_fallback", labels={"locale": "zz"}
        )
        assert stemmer("zz_ZZ") is None
        # cached; counter bumped at least once for the first resolution
        assert registry().counter_value(
            "irs_stem_identity_fallback", labels={"locale": "zz"}
        ) >= max(before, 1.0)

    def test_supported_locales_cover_verdict_set(self):
        need = {"de", "fr", "es", "ru", "pt", "it", "nl", "en"}
        assert need <= set(supported_locales())


class TestLocaleStopwords:
    def test_builtin_sets_nonempty(self):
        for lang in ("en", "de", "fr", "es", "ru", "pt", "it", "nl"):
            assert len(STOPWORDS[lang]) > 20, lang

    def test_stopwords_path(self, tmp_path):
        (tmp_path / "de").write_text("foo\nbar\n# comment\n", encoding="utf-8")
        assert load_stopwords_path(str(tmp_path), "de_DE") == {"foo", "bar"}
        # missing locale file -> built-ins
        assert load_stopwords_path(str(tmp_path), "fr") == STOPWORDS["fr"]


class TestTextAnalyzerLocales:
    def test_german_defaults(self):
        a = get("text", {"locale": "de_DE.UTF-8"})
        terms = [t.term.decode() for t in a.tokenize("Die Katzen laufen und springen")]
        # "die"/"und" are German stopwords; remaining tokens stemmed
        assert terms == ["katz", "lauf", "spring"]

    def test_accent_strip_before_stem(self):
        # reference order: transliterate (accent removal) THEN stem
        # (text_token_stream.cpp:381-408)
        a = TextAnalyzer(locale="fr", accent=False)
        got = {t.term.decode() for t in a.tokenize("précieux")}
        st = stemmer("fr")
        assert got == {st("precieux")}

    def test_accent_keep(self):
        a = TextAnalyzer(locale="fr", accent=True, stemming=False)
        assert [t.term.decode() for t in a.tokenize("précieux")] == ["précieux"]

    def test_stopwords_path_option(self, tmp_path):
        (tmp_path / "de").write_text("katzen\n", encoding="utf-8")
        a = get("text", {"locale": "de", "stopwordsPath": str(tmp_path)})
        terms = [t.term.decode() for t in a.tokenize("die katzen laufen")]
        # path REPLACES built-ins: "die" survives, "katzen" is dropped
        assert terms == ["die", "lauf"]

    def test_explicit_plus_path_union(self, tmp_path):
        (tmp_path / "de").write_text("katzen\n", encoding="utf-8")
        a = get(
            "text",
            {"locale": "de", "stopwords": ["laufen"], "stopwordsPath": str(tmp_path)},
        )
        assert [t.term.decode() for t in a.tokenize("die katzen laufen")] == ["die"]

    def test_case_option(self):
        a = get("text", {"locale": "de", "case": "none", "stemming": False,
                         "stopwords": []})
        assert [t.term.decode() for t in a.tokenize("Katzen")] == ["Katzen"]

    def test_edge_ngram(self):
        a = get(
            "text",
            {
                "locale": "en",
                "stemming": False,
                "stopwords": [],
                "edgeNgram": {"min": 2, "max": 3, "preserveOriginal": True},
            },
        )
        terms = [t.term.decode() for t in a.tokenize("quick")]
        assert terms == ["qu", "qui", "quick"]
        # all edge grams of one source token share its position
        assert {t.position for t in a.tokenize("quick")} == {0}

    def test_stem_analyzer_locale(self):
        a = get("stem", {"locale": "ru"})
        assert a.tokenize("Красивая")[0].term.decode() == "красив"

    def test_stem_analyzer_unknown_locale_identity(self):
        a = get("stem", {"locale": "zz"})
        assert a.tokenize("Unchanged")[0].term.decode() == "unchanged"


class TestGermanEndToEnd:
    def test_index_and_query_german(self):
        from iresearch_tpu.index.reader import DirectoryReader
        from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
        from iresearch_tpu.search import filters as F
        from iresearch_tpu.search.host_eval import search
        from iresearch_tpu.search.scorers import BM25
        from iresearch_tpu.store.directory import MemoryDirectory

        analyzer = get("text", {"locale": "de"})
        docs = [
            "Die Katzen laufen durch den Garten",
            "Ein Hund schläft unter dem Baum",
            "Katzen und Hunde sind Freunde",
            "Der Baum verliert seine Blätter",
        ]
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            with w.batch() as tx:
                for body in docs:
                    tx.insert([Field("body", body, analyzer=analyzer)])
            w.commit()
        r = DirectoryReader.open(d)

        # query-side analysis through the same locale analyzer: "laufenden"
        # stems to "laufend" — use the document surface forms instead
        def q(text):
            term = analyzer.tokenize(text)[0].term
            return sorted(
                doc for doc, _ in search(r, F.ByTerm("body", term), BM25(), k=10)
            )

        assert q("Katze") == q("Katzen") == [0, 2]  # katze/katzen -> "katz"
        assert q("Hundes") == [1, 2]  # hund/hunde/hundes -> "hund"
        assert q("Baumes") == [1, 3]
        # stopword never indexed
        assert search(r, F.ByTerm("body", b"und"), BM25(), k=10) == []


class TestCollation:
    """Locale-true collation via the system ICU (VERDICT r4 item 9).

    Reference: icu::Collator::getSortKey with locale tailoring,
    collation_token_stream.cpp:65-80 — byte order of the emitted keys
    must equal the locale's collation order.
    """

    def _order(self, locale, words):
        from iresearch_tpu.analysis.analyzers import CollationAnalyzer

        ca = CollationAnalyzer(locale)
        keys = {w: ca.tokenize(w)[0].term for w in words}
        return sorted(words, key=lambda w: keys[w])

    def _has_icu(self):
        from iresearch_tpu.analysis.icu import get_icu

        return get_icu() is not None

    def test_swedish_tailoring(self):
        import pytest

        if not self._has_icu():
            pytest.skip("no system ICU in this image")
        # Swedish: å, ä, ö are distinct letters sorting AFTER z
        got = self._order("sv", ["a", "b", "z", "å", "ä", "ö"])
        assert got == ["a", "b", "z", "å", "ä", "ö"]

    def test_german_tailoring(self):
        import pytest

        if not self._has_icu():
            pytest.skip("no system ICU in this image")
        # German: umlauts interleave with their base letters (ä with a)
        got = self._order("de", ["a", "ä", "b", "o", "ö", "z"])
        assert got == ["a", "ä", "b", "o", "ö", "z"]
        # and differ from Swedish for the same input set
        sv = self._order("sv", ["a", "ä", "b", "o", "ö", "z"])
        assert sv == ["a", "b", "o", "z", "ä", "ö"]

    def test_case_insensitive_equal_primary_prefix(self):
        import pytest

        if not self._has_icu():
            pytest.skip("no system ICU in this image")
        # default strength keeps case differences at a lower level:
        # keys differ but sort adjacently (A before b, after a-variants)
        got = self._order("en", ["a", "A", "b"])
        assert got[:2] in (["a", "A"], ["A", "a"]) and got[2] == "b"

    def test_fallback_without_icu(self, monkeypatch):
        """No usable ICU -> NFKD casefold key + cap counter (graceful)."""
        from iresearch_tpu.analysis import analyzers as an
        from iresearch_tpu.analysis import icu as icu_mod
        from iresearch_tpu.utils.metrics import registry

        monkeypatch.setattr(icu_mod, "_icu", False)
        ca = an.CollationAnalyzer("sv")
        assert ca._coll is None
        before = registry()._counters.get(
            ("irs_collation_nfkd_fallback", ()), 0
        )
        key = ca.tokenize("Ämne")[0].term
        import unicodedata

        assert key == unicodedata.normalize("NFKD", "Ämne").casefold().encode()
        after = registry()._counters.get(
            ("irs_collation_nfkd_fallback", ()), 0
        )
        assert after == before + 1
