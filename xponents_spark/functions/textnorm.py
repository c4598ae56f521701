"""Text normalization kernel.

Re-implements the TextUtils scalar functions the reference calls throughout
tagging and scoring (call sites cited per function; javadoc at
``/root/reference/doc/sdk-apidocs/org/opensextant/util/TextUtils.html``).
All functions are pure and operate on single strings; the Spark pipeline
applies them over pandas Series via ``Series.map`` inside Arrow batches, or
vectorized with precompiled regex/translate tables where it matters.
"""

from __future__ import annotations

import re
import unicodedata

_WS_SQUEEZE = re.compile(r"\s+")
_FORMATTING_WS = re.compile(r"[\n\r\t\f\v]")
_IRREGULAR_PUNCT = re.compile(r"[—–;:!?<>={}\[\]()_~^%$#@*+|\\/\"]|[,.'-]{2,}")
_ABBREV = re.compile(r"^[A-Za-z](?:[.][A-Za-z])+[.]?$|^[A-Za-z]{1,4}[.]$")
# CJK: Han, Hiragana, Katakana, Hangul ranges.
_CJK = re.compile(r"[⺀-鿿぀-ヿ가-힯豈-﫿]")
# Arabic, Farsi, Urdu, Hebrew blocks.
_MIDEAST = re.compile(r"[֐-׿؀-ۿݐ-ݿﭐ-﷿ﹰ-﻿]")
_TOKEN = re.compile(r"\S+")


def squeeze_whitespace(text: str) -> str:
    """Collapse runs of whitespace to one space
    (used at GazetteerMatcher.java:510)."""
    return _WS_SQUEEZE.sub(" ", text).strip()


def is_ascii(text: str) -> bool:
    return text.isascii()


def is_upper(text: str) -> bool:
    return text == text.upper() and text != text.lower()


def is_lower(text: str) -> bool:
    return text == text.lower() and text != text.upper()


def is_mixed_case(text: str) -> bool:
    return not is_upper(text) and not is_lower(text) and any(c.isalpha() for c in text)


def has_diacritics(text: str) -> bool:
    """True if any char decomposes with combining marks
    (PlaceCandidate.java:83)."""
    return any(unicodedata.combining(c) for c in unicodedata.normalize("NFD", text))


def strip_diacritics(text: str) -> str:
    """ASCII-folding / phonetic reduction equivalent: NFD + drop combining
    marks (the reference's Solr ASCII-folding char filter,
    solr/solr7/gazetteer/conf/schema.xml:364-381, and
    TextUtils.phoneticReduction used at TagFilter.java:230)."""
    if text.isascii():          # hot path: nothing to fold
        return text
    return "".join(
        c for c in unicodedata.normalize("NFD", text) if not unicodedata.combining(c)
    )


def has_cjk(text: str) -> bool:
    return _CJK.search(text) is not None


def has_middle_eastern(text: str) -> bool:
    return _MIDEAST.search(text) is not None


def is_abbreviation(text: str) -> bool:
    """'U.S.', 'Calif.' style (PlaceCandidate.java:891)."""
    return _ABBREV.match(text) is not None


def has_irregular_punctuation(text: str) -> bool:
    """GazetteerMatcher.java:474-478 filter predicate."""
    return _IRREGULAR_PUNCT.search(text) is not None


def count_formatting_space(text: str) -> int:
    """Newlines/tabs inside a match (GazetteerMatcher.java:502-510)."""
    return len(_FORMATTING_WS.findall(text))


def normalize_phrase(text: str) -> str:
    """The tagging-time normalization applied to BOTH gazetteer phrases (at
    ETL time) and document text (at tag time).

    Defined as: ASCII-fold diacritics -> lowercase -> squeeze whitespace ->
    strip edge punctuation per token.  This is OUR pinned normalization
    standing in for the reference's Solr analyzer chain
    (ASCIIFolding + ClassicTokenizer + lowercase,
    solr/solr7/gazetteer/conf/schema.xml:364-381); fixtures derive from it
    (SURVEY.md §4.3.1).
    """
    folded = strip_diacritics(text).lower()
    tokens = [t.strip(".,;:'\"!?()[]") for t in _TOKEN.findall(folded)]
    return " ".join(t for t in tokens if t)


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Whitespace tokens with [start, end) offsets into the original text."""
    return [(m.group(), m.start(), m.end()) for m in _TOKEN.finditer(text)]


def levenshtein(a: str, b: str) -> int:
    """Edit distance for the name-score kernel (PlaceCandidate.java:427-534).
    Two-row DP; strings involved are short place names."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def get_text_window(text: str, start: int, end: int, width: int = 40) -> tuple[str, str]:
    """±width chars of context around a span (PlaceCandidate.java:194-223)."""
    return text[max(0, start - width):start], text[end:end + width]
