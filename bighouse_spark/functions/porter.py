"""Porter stemmer (Porter, "An algorithm for suffix stripping",
Program 14(3), 1980) — the published 1980 algorithm implemented from
the paper, backing the CH ``stem('en', x)`` spelling.

Honest divergence note: ClickHouse's own ``stem`` links Snowball
(Porter2), a later revision that differs on some words (e.g. the
``logi``→``log`` and ``bli``→``ble`` rules are Porter2 additions).
This module implements the original 1980 rule set exactly as
published; tests anchor every step on the paper's own example lists.
Only English is supported — other languages need the Snowball rule
files, which don't ship here.

Arrow-batched per the repo contract: the per-word work is a handful
of suffix checks, and the UDF ships by value (functions/_shipping).
NOTE: no ``from __future__ import annotations`` — pandas_udf
resolves the ``pd.Series`` hints at registration time.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        # Paper: "Y preceded by a consonant" is a vowel; initial Y
        # (nothing before it) is a consonant.
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the paper's [C](VC)^m[V] decomposition."""
    n = 0
    i = 0
    ln = len(stem)
    while i < ln and _is_cons(stem, i):
        i += 1
    while i < ln:
        while i < ln and not _is_cons(stem, i):
            i += 1
        if i >= ln:
            break
        n += 1
        while i < ln and _is_cons(stem, i):
            i += 1
    return n


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o in the paper: ends consonant-vowel-consonant where the
    final consonant is not W, X or Y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


# (suffix, replacement) rule tables for steps 2-4, longest-first
# within each shared ending so the paper's "longest match" contract
# holds under a simple ordered scan.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ion", "ism", "ate", "iti", "ous", "ive", "ize", "al", "er",
    "ic", "ou",
)


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # -- step 1a --
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # -- step 1b --
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stripped = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stripped = w = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stripped = w = w[:-3]
        if stripped is not None:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # -- step 1c --
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # -- step 2 (m > 0 on the stem) --
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # -- step 3 (m > 0) --
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # -- step 4 (m > 1; ION also needs stem ending S or T) --
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (
                suf != "ion" or (stem and stem[-1] in "st")
            ):
                w = stem
            break

    # -- step 5a --
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # -- step 5b --
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


@pandas_udf(StringType())
def bh_porter_stem(s: pd.Series) -> pd.Series:
    return s.map(
        lambda v: None if v is None else porter_stem(str(v).lower())
    )


ALL = {"bh_porter_stem": bh_porter_stem}

import sys as _sys  # noqa: E402

from bighouse_spark.functions._shipping import ship_by_value as _ship  # noqa: E402

_ship(_sys.modules[__name__])
