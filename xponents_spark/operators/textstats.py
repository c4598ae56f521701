"""Text analysis operators — all JVM-side (whole-stage codegen; no Python in
the hot path).  Token semantics assume whitespace tokenization; inputs are
normalized by the main-content stage first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# disjoint marker-token sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "was"),
    "de": ("der", "das", "und", "ist", "nicht"),
    "fr": ("le", "les", "et", "est", "une"),
    "es": ("el", "los", "que", "es", "una"),
}

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def _tokens(col: str) -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counting: whitespace tokens + a BPE-ish subword estimate
    (ceil(chars/4) is the published rule-of-thumb for byte-pair vocabularies).
    """
    toks = _tokens(text_col)
    # counts are BIGINT on purpose: the DuckDB oracle's len()/list_sum yield
    # 64/128-bit ints, and INT-vs-BIGINT diverges under the driver value-hash
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.expr(f"CAST(ceil(length({text_col}) / 4.0) AS BIGINT)").alias("n_subwords_est"),
        F.expr(
            f"aggregate(transform(split(trim({text_col}), '\\\\s+'), x -> length(x)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias("token_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Document quality signals: length, mean token length, stopword ratio,
    punctuation and alphabetic character ratios (the length/punct/stopword
    family of published quality heuristics).  All exact integer/float
    arithmetic (parity-checkable against SQL)."""
    toks = _tokens(text_col)
    stop_arr = ", ".join(f"'{w}'" for w in _STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(trim({text_col}), '\\\\s+'), x -> x IN ({stop_arr})))")
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[!-/:-@\[-`{-~]", ""))
    n_alpha = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[A-Za-z]", ""))
    # nullif guards: Spark yields NULL for x/0 but recent DuckDB defaults
    # to IEEE division (NaN), so an empty document would diverge between
    # the engine and the oracle — pin NULL on BOTH sides (review finding)
    n_chars_nz = F.nullif(n_chars, F.lit(0))
    n_tok_nz = F.nullif(n_tok, F.lit(0))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (n_chars.cast("double") / n_tok_nz).alias("chars_per_token"),
        (n_stop.cast("double") / n_tok_nz).alias("stopword_ratio"),
        (n_punct.cast("double") / n_chars_nz).alias("punct_ratio"),
        (n_alpha.cast("double") / n_chars_nz).alias("alpha_ratio"),
    )


# script-range shortcuts resolved BEFORE the marker vote (writing system
# identifies the language family outright; the stopword profile only
# separates latin-script languages)
_SCRIPTS = (
    ("ja", "[぀-ヿ]"),              # kana present -> Japanese
    ("ko", "[가-힯]"),              # hangul -> Korean
    ("zh", "[⺀-鿿豈-﫿]"),          # han without kana/hangul -> Chinese
    ("ar", "[؀-ۿ]"),               # Arabic block
    ("ru", "[Ѐ-ӿ]"),               # Cyrillic
)


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Language ID: script-range detection for non-latin writing systems,
    then the classic marker-token (stopword-profile) vote for latin-script
    languages.  Deterministic tie-break by fixed language order; zero
    signal -> 'und'.  Pure JVM expressions."""
    cols = [F.col(id_col)]
    votes = {}
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{w}'" for w in markers)
        votes[lang] = F.expr(
            f"size(filter(split(trim({text_col}), '\\\\s+'), x -> x IN ({arr})))")
    best = None
    for lang, pattern in _SCRIPTS:   # script shortcut wins in listed order
        cond = F.col(text_col).rlike(pattern)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    for lang in LANG_MARKERS:  # first language with the max vote wins
        cond = (votes[lang] > 0)
        for other in LANG_MARKERS:
            if other != lang:
                op = votes[lang] >= votes[other] if _order(lang) < _order(other) \
                    else votes[lang] > votes[other]
                cond = cond & op
        best = best.when(cond, lang)
    cols.append(best.otherwise("und").alias("lang_pred"))
    return df.select(*cols)


def _order(lang: str) -> int:
    return list(LANG_MARKERS).index(lang)


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", prefix_tokens: int = 8) -> DataFrame:
    """Content fingerprint: md5 of the full text plus a prefix-shingle key
    (cheap near-head dedup key).  Pure JVM expressions."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("text_md5"),
        F.md5(F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))).alias("prefix_md5"),
    )
