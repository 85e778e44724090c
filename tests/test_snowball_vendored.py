"""Vendored German/French/Russian snowball stemmers vs the nltk oracle.

Reference analog: the reference vendors external/snowball and its tests
pin stemmed token streams (text_token_stream tests). Here the vendored
implementations (analysis/snowball_impl.py) are fuzz-verified for exact
agreement with NLTK's SnowballStemmer — the same oracle the English
porter2 was verified against.

Russian is implemented directly on Cyrillic per the published algorithm;
nltk stems through a lossy romanization (ц -> "t^s", й counted as the
vowel "i", ю's trailing "u" spuriously extending suffixes like "ует"),
so fuzz words hitting those romanization collisions are skipped and the
expected published behavior is pinned by hand-picked real words instead.
"""

import random

import pytest

from iresearch_tpu.analysis.snowball_impl import (
    stem_french,
    stem_german,
    stem_russian,
)

nltk_snowball = pytest.importorskip("nltk.stem.snowball")


DE_SUFFIXES = [
    "ern", "em", "er", "en", "es", "e", "s", "est", "st", "isch",
    "lich", "heit", "keit", "end", "ung", "ig", "ik", "nisse", "niss",
    "ungen", "igkeit", "lichkeit", "erung", "igend",
]
FR_SUFFIXES = [
    "issements", "atrice", "ateurs", "ations", "logies", "usions",
    "ements", "amment", "emment", "ances", "iques", "ismes", "ables",
    "istes", "ement", "euses", "ments", "ance", "ique", "isme", "able",
    "iste", "ence", "ités", "ives", "eaux", "euse", "ment", "eux",
    "ité", "ive", "ifs", "aux", "if", "issaient", "iraient", "issante",
    "issions", "irions", "issais", "isses", "issez", "ies", "ira",
    "ie", "ir", "is", "it", "i", "eraient", "assions", "erions",
    "èrent", "erais", "ions", "erai", "ée", "és", "er", "ez", "ât",
    "ai", "as", "é", "a", "ion", "ier", "ière", "e", "ë", "s",
    "ienne", "onne", "ette", "elle", "eille",
]
RU_SUFFIXES = [
    "вшись", "ившись", "ывшись", "вши", "ив", "ыв", "в", "ся", "сь",
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею", "ывш", "ующ", "ивш", "нн", "вш",
    "ющ", "щ", "ешь", "нно", "ете", "ла", "на", "ли", "ло", "но",
    "ет", "ют", "ны", "ть", "л", "н", "ейте", "уйте", "ила", "ыла",
    "ена", "ите", "или", "ыли", "ило", "ыло", "ено", "ует", "уют",
    "ены", "ить", "ыть", "ишь", "ят", "ил", "ыл", "ен", "ит", "ыт",
    "ю", "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ья",
    "ия", "ев", "ов", "ье", "еи", "ии", "ам", "ах", "ях", "ью", "а",
    "е", "и", "о", "у", "ы", "ь", "я", "ость", "ост", "ейше", "ейш",
    "ости", "остью", "ование", "аться", "иться",
]


def _fuzz(lang, mine, alphabet, suffixes, n, skip=None):
    oracle = nltk_snowball.SnowballStemmer(lang).stem
    rng = random.Random(11)
    checked = 0
    for _ in range(n):
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 12))
        )
        if rng.random() < 0.7:
            w += rng.choice(suffixes)
        if skip is not None and skip(w):
            continue
        try:
            expect = oracle(w)
        except Exception:
            continue  # nltk crashes on some degenerate inputs
        got = mine(w)
        assert got == expect, f"{lang} {w!r}: mine={got!r} nltk={expect!r}"
        checked += 1
    assert checked > n // 2


def test_german_vs_nltk():
    _fuzz("german", stem_german, "abcdefghijklmnoprstuvwzäöüß",
          DE_SUFFIXES, 20000)


def test_french_vs_nltk():
    _fuzz("french", stem_french, "abcdefghijlmnopqrstuvyzâàëéêèïîôûùç",
          FR_SUFFIXES, 20000)


def _ru_romanization_collision(w):
    if any(c in w for c in "ъйёцэ"):
        return True
    return any(s in w for s in ("шч", "ьь", "юю", "юе"))


def test_russian_vs_nltk():
    _fuzz("russian", stem_russian, "абвгдежзиклмнопрстуфхцчшщыьэюя",
          RU_SUFFIXES, 40000, skip=_ru_romanization_collision)


def test_real_words():
    for w, exp in [
        ("aufeinander", "aufeinand"),
        ("kategorie", "kategori"),
        ("aufnahmen", "aufnahm"),
    ]:
        assert stem_german(w) == exp
    # ß and umlauts fold
    assert stem_german("größe") == "gross"
    for w, exp in [
        ("continuations", "continu"),
        ("majestueux", "majestu"),
        ("nationales", "national"),
    ]:
        assert stem_french(w) == exp
    # Cyrillic published behavior (incl. й words nltk mis-romanizes)
    for w, exp in [
        ("красный", "красн"),
        ("книгой", "книг"),
        ("остановиться", "останов"),
        ("важностью", "важност"),
        ("йод", "йод"),
    ]:
        assert stem_russian(w) == exp
    # ё folds to е per the published algorithm
    assert stem_russian("ёлками") == stem_russian("елками")


def test_resolver_uses_vendored(monkeypatch):
    """de/fr/ru resolve without nltk: the vendored functions load even
    when the nltk import path is poisoned."""
    import builtins
    import iresearch_tpu.analysis.snowball as sb

    monkeypatch.setattr(sb, "_CACHE", {})
    real_import = builtins.__import__

    def no_nltk(name, *a, **k):
        if name.startswith("nltk"):
            raise ImportError("nltk disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_nltk)
    assert sb.stemmer("de_DE")("aufnahmen") == "aufnahm"
    assert sb.stemmer("fr")("nationales") == "national"
    assert sb.stemmer("ru")("красный") == "красн"
    assert sb.stemmer("en")("running") == "run"
