"""PII redaction over text columns — pure JVM ``regexp_replace`` chain.

A training-data pipeline scrubs contact/identifier strings before any
text leaves the cleaning stage.  The pattern classes mirror the PoLi
pattern families the extraction stack already tags (reference:
``src/main/resources/poli_patterns.cfg`` families phone/email/ip — see
``extractors/poli.py``), but redaction is deliberately a *scalar
projection*, not a tagger pass: every pattern is written in the common
Java-regex/RE2 subset (no backreferences, no lookaround, explicit
``[0-9]``-style classes only via ``\\d`` which is ASCII in both), so the
DuckDB oracle can state the exact same rewrite and the driver gate checks
engine parity byte-for-byte.

Scale: one ``Project`` node, whole-stage codegen, zero shuffle, zero
Python — the plan is ``scan -> project`` and survives any corpus size.
Span-precise redaction (masking exactly what the tagger matched, filters
applied) is the composition ``poli_extract -> remove spans``; this module
is the cheap high-recall scrub that runs over 100 TB as a projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: each pattern runs over the PREVIOUS rewrite's output (emails
# first so their domains can't be half-eaten as hosts/phones).  Every
# pattern is valid and equivalent in Java regex and RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("card", r"\b(?:\d{4}[- ]){3}\d{4}\b", "[CARD]"),
    ("phone",
     r"(?:\+?\d{1,3}[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]\d{4}", "[PHONE]"),
]


def redact_expr(col: Column) -> Column:
    """The redacted-text expression: sequential ``regexp_replace`` over
    :data:`PII_PATTERNS` (replace-all in both Spark and DuckDB-with-'g')."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(df: DataFrame, text_col: str = "text",
               with_counts: bool = True) -> DataFrame:
    """Adds ``text_redacted`` plus (optionally) per-class match counts
    ``n_<class>`` — counts are taken on the ORIGINAL text (well-defined
    regardless of rewrite order; the sequential rewrite itself applies
    each pattern to the previous pattern's output)."""
    out = df.withColumn("text_redacted", redact_expr(F.col(text_col)))
    if with_counts:
        for name, pat, _ in PII_PATTERNS:
            out = out.withColumn(
                f"n_{name}",
                F.size(F.regexp_extract_all(F.col(text_col),
                                            F.lit(pat), 0)))
    return out


def redact_oracle_sql(text_expr: str) -> str:
    """The DuckDB expression computing the identical redaction of
    ``text_expr`` (RE2, 'g' flag = replace-all like Spark)."""
    out = text_expr
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def redact_count_oracle_sql(text_expr: str) -> list[tuple[str, str]]:
    """(column_name, DuckDB expression) for each per-class count."""
    return [(f"n_{name}",
             f"CAST(len(regexp_extract_all({text_expr}, "
             f"'{pat.replace(chr(39), chr(39) * 2)}')) AS INTEGER)")
            for name, pat, _ in PII_PATTERNS]
