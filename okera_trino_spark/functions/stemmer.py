"""Porter2 (Snowball English) stemmer — backs Trino's ``word_stem``.

Trino's ``word_stem(varchar)`` stems with the Snowball *english* stemmer
(the "Porter2" algorithm; reference surface: /root/reference/README.md:74-90
Trino-400 SQL passthrough). This is a from-scratch pure-Python
implementation of the public algorithm description at
snowballstem.org/algorithms/english/stemmer.html — every rule below cites
the spec's own wording, and ``tests/test_trino_sql.py`` verifies it against
the spec's published example pairs (ties→tie, gaps→gap, hopping→hop,
exceptional forms, etc.).

Execution model: registered as an Arrow-batched pandas UDF (the same path
as ``normalize``/``trino_xxhash64``) — pure per-value string work, no
shuffle, scales as a map-only stage. The per-word cost is O(len) with a
handful of suffix probes; fine for dialect parity. (A 100-TB hot path
would want the automaton fused per-batch, but word_stem sits in the
dialect-compat tier, not the LLM-pipeline hot tier.)
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms checked before the algorithm proper (spec: "special
# forms" table). Invariants map to themselves.
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# Words to stop at after step 1a (spec: "following step 1a, leave the
# following invariant").
_EXCEPTION2 = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

# R1 prefix exceptions (spec: "if the word begins gener, commun or arsen,
# set R1 to be the remainder of the word").
_R1_PREFIXES = ("gener", "commun", "arsen")

# Step 2/3/4 suffix tables: (suffix, replacement) — replacement None means
# conditional handling below. Ordered longest-first so a linear scan
# implements Snowball's longest-match `among`.
_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
    ("iveness", "ive"), ("fulness", "ful"), ("lessli", "less"),
    ("tional", "tion"), ("biliti", "ble"), ("ation", "ate"),
    ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("entli", "ent"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("ogi", None), ("bli", "ble"), ("li", None),
)
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
)
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS and word[i] != "Y"


def _mark_regions(word: str) -> tuple[int, int]:
    """Return (r1, r2) start indices per the spec: R1 is the region after
    the first non-vowel following a vowel; R2 the same within R1."""
    n = len(word)
    r1 = n
    for pref in _R1_PREFIXES:
        if word.startswith(pref):
            r1 = len(pref)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """Spec: a short syllable is (a) a vowel followed by a non-vowel other
    than w, x or Y, preceded by a non-vowel; or (b) a vowel at the start
    of the word followed by a non-vowel."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (not _is_vowel(word, n - 3)
                and _is_vowel(word, n - 2)
                and not _is_vowel(word, n - 1)
                and word[n - 1] not in "wxY")
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(word: str, end: int) -> bool:
    return any(_is_vowel(word, i) for i in range(end))


def porter2_stem(word: str) -> str:
    """Stem one lowercase English word with the Porter2 algorithm."""
    if len(word) <= 2:
        return word
    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc

    # prelude: strip initial apostrophe; mark consonant-y as Y
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS and chars[i - 1] != "Y":
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _mark_regions(word)

    # Step 0: longest of ', 's, 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if _has_vowel(word, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # Step 1b (longest match; condition failure = no action)
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _has_vowel(stem, len(stem)):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y/Y → i if preceded by a non-vowel that is not the first
    # letter of the word
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in _VOWELS):
        word = word[:-1] + "i"

    # Step 2 (in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 3 (in R1)
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 4 (in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if (len(word) - 1 >= r2
                or (len(word) - 1 >= r1
                    and not _ends_short_syllable(word[:-1]))):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


def register_word_stem(spark: "SparkSession") -> None:
    """Register ``trino_word_stem(s)`` — Trino's ``word_stem(varchar)``
    (WordStemFunction in trino-main: the Snowball *english* stemmer).
    Arrow-batched pandas UDF over :func:`porter2_stem`; Trino stems the
    input as given (Snowball assumes lowercase — callers lower() first),
    and a word with no stemmable shape passes through unchanged."""
    import pandas as pd  # noqa: PLC0415 — lazy, session-scoped

    from pyspark.sql import functions as F  # noqa: PLC0415

    def _stem(s):
        return pd.Series(
            [None if v is None else porter2_stem(str(v)) for v in s],
            dtype=object)

    _stem.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.udf.register("trino_word_stem", F.pandas_udf(_stem, "string"))
