"""DuckDB oracle SQL builders.

The driver's correctness gate runs each ``queries()`` entry in Spark AND its
``oracle_sql()`` string in DuckDB over the same parquet views, comparing
row-count + schema + value hash.  For extraction queries the oracle does NOT
re-implement regex: the synthetic transcripts embed *fixed* payloads
(``sources/payloads.py``), so expected matches are literal VALUES rows joined
on the payload class — an independent statement of the expected output,
offsets included (span = base length + 1 + payload-relative offset).
"""

from __future__ import annotations

from .sources.payloads import EXPECTED, HTML_CLASS, NUM_PAYLOADS
from .sources.transcripts import transcripts_oracle_cte


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _fixture_values(label_filter=None, fields=()) -> tuple[str, int]:
    """(VALUES ...) rows: (k, rel_start, rel_end, matchtext, label, *fields).
    Returns SQL + row count."""
    rows = []
    for k, matches in EXPECTED.items():
        for m in matches:
            if label_filter and m["label"] not in label_filter:
                continue
            vals = [str(k), str(m["rel_start"]), str(m["rel_end"]),
                    _sq(m["matchtext"]), _sq(m["label"])]
            for f in fields:
                v = m.get(f)
                if v is None:
                    vals.append("NULL")
                elif isinstance(v, str):
                    vals.append(_sq(v))
                elif isinstance(v, float):
                    # string literal -> correctly-rounded parse; a bare
                    # numeric literal would go through DECIMAL and lose the
                    # shortest-repr bit-exact round trip
                    vals.append(f"CAST('{v!r}' AS DOUBLE)")
                elif isinstance(v, list):   # array<string> (nearest_places)
                    vals.append("[" + ", ".join(_sq(x) for x in v) + "]")
                else:
                    vals.append(str(v))
            rows.append("(" + ", ".join(vals) + ")")
    cols = ["k", "rel_start", "rel_end", "matchtext", "label", *fields]
    sql = ("(VALUES " + ", ".join(rows) + ") AS exp(" + ", ".join(cols) + ")")
    return sql, len(rows)


def extraction_oracle(label_filter: tuple, extra_fields: tuple,
                      extra_select: str = "") -> str:
    """Oracle for exploded-match queries filtered to given labels."""
    fixture, _n = _fixture_values(label_filter, extra_fields)
    return f"""
WITH {transcripts_oracle_cte()}
SELECT t.conv_id,
       t.turn_idx,
       CAST(t.base_len + 1 + exp.rel_start AS INTEGER) AS span_start,
       CAST(t.base_len + 1 + exp.rel_end AS INTEGER)   AS span_end,
       exp.matchtext,
       exp.label{extra_select}
FROM transcripts t
JOIN {fixture} ON t.payload_k = exp.k
"""


def label_histogram_oracle() -> str:
    fixture, _n = _fixture_values(None, ())
    return f"""
WITH {transcripts_oracle_cte()}
SELECT exp.label, count(*) AS n_matches
FROM transcripts t
JOIN {fixture} ON t.payload_k = exp.k
GROUP BY exp.label
"""


def country_histogram_oracle() -> str:
    fixture, _n = _fixture_values(("place", "country"), ("cc",))
    return f"""
WITH {transcripts_oracle_cte()}
SELECT exp.cc, count(*) AS n_mentions
FROM transcripts t
JOIN {fixture} ON t.payload_k = exp.k
GROUP BY exp.cc
"""


def conv_geography_oracle() -> str:
    fixture, _n = _fixture_values(("place", "country"), ("cc",))
    return f"""
WITH {transcripts_oracle_cte()}
SELECT t.conv_id, exp.cc, count(*) AS n_mentions
FROM transcripts t
JOIN {fixture} ON t.payload_k = exp.k
GROUP BY t.conv_id, exp.cc
"""


def conv_scoped_oracle() -> str:
    """Full VALUES oracle for the two-pass conversation rescore (VERDICT r2
    item 8).  Both passes are determined by the pinned fixtures:

    * per-conversation dominant country = max-by-(count, cc) over the
      vote-eligible fixture rows each conversation's payload classes carry
      (confident place/country rows + reverse-geocoded coordinates);
    * turns of a redo-eligible class in a conversation WITH a dominant
      country re-extract — their expected rows come from EXPECTED_PASS2,
      keyed (class, preferred cc); every other turn keeps its pass-1 rows.

    Tie-break parity: Spark's ``max_by(cc, struct(n, cc))`` picks the
    largest (n, cc) pair, i.e. highest count then lexicographically
    largest cc — mirrored by ORDER BY n DESC, cc DESC."""
    from .sources.payloads import EXPECTED_PASS2, redo_classes, vote_rows

    if not vote_rows() or not redo_classes():
        # no votes or nothing redo-eligible -> pass 2 is the identity;
        # guard the VALUES/IN list construction from emitting invalid SQL
        # on a future fixture regeneration (review finding)
        return extraction_oracle(
            ("place", "country"), ("cc", "confidence"),
            ", exp.cc AS cc, CAST(exp.confidence AS INTEGER) AS confidence")

    votes_vals = ", ".join(f"({k}, {_sq(cc)})" for k, cc in vote_rows())
    redo_in = ", ".join(str(k) for k in redo_classes())
    p2 = []
    for (k, cc), ms in sorted(EXPECTED_PASS2.items()):
        for m in ms:
            p2.append(f"({k}, {_sq(cc)}, {m['rel_start']}, {m['rel_end']}, "
                      f"{_sq(m['matchtext'])}, {_sq(m['label'])}, "
                      f"{_sq(m['cc'])}, {m['confidence']})")
    fixture, _n = _fixture_values(("place", "country"), ("cc", "confidence"))
    return f"""
WITH {transcripts_oracle_cte()},
votes AS (
  SELECT t.conv_id, v.cc, count(*) AS n
  FROM transcripts t JOIN (VALUES {votes_vals}) AS v(k, cc)
       ON t.payload_k = v.k
  GROUP BY 1, 2
),
pref AS (
  SELECT conv_id, cc AS cc_pref FROM (
    SELECT conv_id, cc,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY n DESC, cc DESC) AS rn
    FROM votes) WHERE rn = 1
),
turns AS (
  SELECT t.*, p.cc_pref FROM transcripts t LEFT JOIN pref p USING (conv_id)
)
SELECT t.conv_id, t.turn_idx,
       CAST(t.base_len + 1 + exp.rel_start AS INTEGER) AS span_start,
       CAST(t.base_len + 1 + exp.rel_end AS INTEGER)   AS span_end,
       exp.matchtext, exp.label, exp.cc AS cc,
       CAST(exp.confidence AS INTEGER) AS confidence
FROM turns t JOIN {fixture} ON t.payload_k = exp.k
WHERE NOT (t.payload_k IN ({redo_in}) AND t.cc_pref IS NOT NULL)
UNION ALL
SELECT t.conv_id, t.turn_idx,
       CAST(t.base_len + 1 + p2.rel_start AS INTEGER) AS span_start,
       CAST(t.base_len + 1 + p2.rel_end AS INTEGER)   AS span_end,
       p2.matchtext, p2.label, p2.cc AS cc,
       CAST(p2.confidence AS INTEGER) AS confidence
FROM turns t
JOIN (VALUES {', '.join(p2)})
     AS p2(k, cc_pref, rel_start, rel_end, matchtext, label, cc, confidence)
     ON t.payload_k = p2.k AND t.cc_pref = p2.cc_pref
"""


def transcripts_oracle() -> str:
    return f"""
WITH {transcripts_oracle_cte()}
SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts
"""


def main_content_oracle() -> str:
    return f"""
WITH {transcripts_oracle_cte()}
SELECT t.conv_id, t.turn_idx,
       CASE WHEN t.payload_k = {HTML_CLASS} THEN d.text ELSE t.text END AS main_text
FROM transcripts t JOIN documents d USING (doc_id)
"""


# --- training-data operators ------------------------------------------------

EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keep_doc
FROM documents GROUP BY 1
"""

PREFIX_DEDUP_ORACLE = r"""
SELECT md5(array_to_string(list_slice(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'), 1, 8), ' ')) AS prefix_md5,
       count(*) AS n_docs, min(doc_id) AS keep_doc
FROM documents GROUP BY 1
"""

# tokenization parity with Spark's split(trim(text), '\s+'): regexp split,
# and every count cast to BIGINT (DuckDB list_sum yields HUGEINT -> pandas
# float, which broke the round-1 value hash)
TOKEN_STATS_ORACLE = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est,
       CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'),
                                    x -> length(x))) AS BIGINT) AS token_chars,
       CAST(len(regexp_extract_all(text,
            '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
            AS BIGINT) AS n_pretokens
FROM documents
"""

# nullif guards match the Spark side: both engines yield NULL (never
# NaN/error) for empty documents
QUALITY_ORACLE = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+')) AS n_tokens,
       CAST(length(text) AS DOUBLE) / nullif(len(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+')), 0) AS chars_per_token,
       CAST(len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'),
                x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
         / nullif(len(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+')), 0) AS stopword_ratio,
       CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE)
         / nullif(length(text), 0) AS punct_ratio,
       CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
         / nullif(length(text), 0) AS alpha_ratio
FROM documents
"""


def lang_id_oracle() -> str:
    from .operators.textstats import LANG_MARKERS, _SCRIPTS
    votes = {}
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(_sq(w) for w in markers)
        votes[lang] = (f"len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'), "
                       f"x -> x IN ({arr})))")
    langs = list(LANG_MARKERS)
    case = "CASE "
    for lang, pattern in _SCRIPTS:   # script shortcuts, same order as Spark
        case += f"WHEN regexp_matches(text, '{pattern}') THEN '{lang}' "
    for i, lang in enumerate(langs):
        conds = [f"{votes[lang]} > 0"]
        for j, other in enumerate(langs):
            if i == j:
                continue
            op = ">=" if i < j else ">"
            conds.append(f"{votes[lang]} {op} {votes[other]}")
        case += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"SELECT doc_id, {case} AS lang_pred FROM documents"


# parity notes: DuckDB array slicing w[i:j] is 1-based inclusive (w[i:i+1]
# = a 2-gram); line split is a literal newline on both engines; nullif +
# least(1.0) clamps mirror the Spark side exactly
REPETITION_ORACLE = r"""
WITH base AS (
  SELECT doc_id, length(text) AS n_chars,
         string_split(text, chr(10)) AS ls,
         regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+') AS w
  FROM documents),
lns AS (SELECT doc_id, unnest(ls) AS line FROM base),
line_cnt AS (SELECT doc_id, line, count(*) AS cnt FROM lns GROUP BY 1, 2),
line_agg AS (
  SELECT doc_id, sum(cnt) AS line_total,
         sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS line_dup,
         sum(CASE WHEN cnt > 1 THEN (cnt - 1) * length(line) ELSE 0 END)
           AS line_dup_chars
  FROM line_cnt GROUP BY 1),
g2 AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
       FROM base,
            LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
       WHERE len(w) >= 2),
top2 AS (SELECT doc_id, cnt * length(gram) AS top2_chars
         FROM (SELECT doc_id, gram, count(*) AS cnt,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY count(*) DESC,
                                                  length(gram) DESC)
                        AS rn
               FROM g2 GROUP BY doc_id, gram)
         WHERE rn = 1),
g5 AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
       FROM base,
            LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i) t
       WHERE len(w) >= 5),
g5_agg AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN (cnt - 1) * length(gram) ELSE 0 END)
           AS g5_dup_chars
  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY 1, 2)
  GROUP BY 1)
SELECT b.doc_id,
       CAST(coalesce(la.line_total, 0) AS INTEGER) AS n_lines,
       CAST(coalesce(la.line_dup, 0) AS DOUBLE)
         / nullif(CAST(la.line_total AS DOUBLE), 0) AS dup_line_frac,
       CAST(coalesce(la.line_dup_chars, 0) AS DOUBLE)
         / nullif(CAST(b.n_chars AS DOUBLE), 0) AS dup_line_char_frac,
       least(CAST(coalesce(t2.top2_chars, 0) AS DOUBLE)
         / nullif(CAST(b.n_chars AS DOUBLE), 0), 1.0) AS top_2gram_char_frac,
       least(CAST(coalesce(g5a.g5_dup_chars, 0) AS DOUBLE)
         / nullif(CAST(b.n_chars AS DOUBLE), 0), 1.0) AS dup_5gram_char_frac
FROM base b
LEFT JOIN line_agg la USING (doc_id)
LEFT JOIN top2 t2 USING (doc_id)
LEFT JOIN g5_agg g5a USING (doc_id)
"""

FINGERPRINT_ORACLE = r"""
SELECT doc_id, md5(text) AS text_md5,
       md5(array_to_string(list_slice(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'), 1, 8), ' ')) AS prefix_md5
FROM documents
"""

NGRAM_JACCARD_ORACLE = r"""
WITH words AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(text, '[ \t\n\v\f\r]+'), x -> x != '') AS w
               FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i) t
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
"""

# Mirror of operators.dedup.decontaminate over the gate's derived benchmark
# (tokens 5..30 of every 23rd document): 13-gram collision rule, same
# shingle convention as NGRAM_JACCARD_ORACLE (whole-text shingle under 13
# words; DuckDB w[i:i+12] = Spark slice(w, i, 13)).
DECONTAMINATE_ORACLE = r"""
WITH words AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(text, '[ \t\n\v\f\r]+'),
                                  x -> x != '') AS w
               FROM documents),
bench AS (SELECT doc_id AS bench_id, w[5:30] AS bw FROM words
          WHERE len(w) >= 31 AND doc_id % 23 = 3),
bgrams AS (SELECT DISTINCT bench_id, array_to_string(bw[i:i+12], ' ') AS gram
           FROM bench, LATERAL (SELECT unnest(generate_series(
                 1, greatest(len(bw) - 12, 1))) AS i) t),
dgrams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+12], ' ') AS gram
           FROM words, LATERAL (SELECT unnest(generate_series(
                 1, greatest(len(w) - 12, 1))) AS i) t),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM dgrams GROUP BY doc_id)
SELECT d.doc_id, CAST(s.n_grams AS INTEGER) AS n_grams,
       count(DISTINCT d.gram) AS n_hit_grams,
       count(DISTINCT b.bench_id) AS n_benchmarks,
       CAST(count(DISTINCT d.gram) AS DOUBLE) / s.n_grams AS hit_frac
FROM dgrams d JOIN bgrams b USING (gram) JOIN sizes s ON s.doc_id = d.doc_id
GROUP BY d.doc_id, s.n_grams
"""


def redact_pii_oracle() -> str:
    """Mirror of operators.redact.redact_pii over the synthesized
    transcripts: the SAME ordered pattern list (imported, single source of
    truth) rendered as DuckDB regexp_replace/extract_all — RE2 and Java
    regex agree on this pattern subset by construction."""
    from .operators.redact import (redact_count_oracle_sql,
                                   redact_oracle_sql)
    counts = ", ".join(f"{expr} AS {name}"
                       for name, expr in redact_count_oracle_sql("text"))
    return f"""
WITH {transcripts_oracle_cte()}
SELECT conv_id, turn_idx,
       {redact_oracle_sql('text')} AS text_redacted,
       {counts}
FROM transcripts
"""


def duplicated_spans_oracle(k: int = 8) -> str:
    """Mirror of operators.dedup.duplicated_spans: duplicated k-gram
    coverage merged into maximal per-doc spans (gaps-and-islands)."""
    return f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+') AS w
  FROM documents),
sh AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+{k - 1}], ' ') AS gram
  FROM base,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {k - 1})) AS i) t
  WHERE len(w) >= {k}),
dup AS (SELECT gram FROM sh GROUP BY gram HAVING count(*) >= 2),
cov AS (SELECT doc_id, pos AS s, pos + {k} AS e FROM sh JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM cov),
isl2 AS (
  SELECT doc_id, s, e,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl)
SELECT doc_id, CAST(min(s) AS INTEGER) AS span_start,
       CAST(max(e) AS INTEGER) AS span_end,
       CAST(max(e) - min(s) AS INTEGER) AS span_tokens
FROM isl2 GROUP BY doc_id, island
"""


def remove_spans_oracle(k: int = 8) -> str:
    """Mirror of dedup.remove_duplicated_spans: tokens at positions covered
    by any duplicated span drop; the remainder re-joins with single
    spaces."""
    return f"""
WITH sp AS ({duplicated_spans_oracle(k)}),
docs_w AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '[ \\t\\n\\v\\f\\r]+') AS w
  FROM documents),
toks AS (
  SELECT doc_id, i, w[i] AS t
  FROM docs_w, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) u),
keep AS (
  SELECT tk.doc_id, tk.i, tk.t FROM toks tk
  WHERE NOT EXISTS (SELECT 1 FROM sp
                    WHERE sp.doc_id = tk.doc_id
                      AND tk.i - 1 >= sp.span_start
                      AND tk.i - 1 < sp.span_end))
SELECT d.doc_id,
       coalesce(string_agg(kp.t, ' ' ORDER BY kp.i), '') AS clean_text,
       CAST(len(d.w) AS INTEGER) AS n_tokens,
       CAST(len(d.w) - count(kp.i) AS INTEGER) AS n_tokens_removed
FROM docs_w d LEFT JOIN keep kp USING (doc_id)
GROUP BY d.doc_id, len(d.w)
"""


# Mirror of operators.textstats.c4_quality_filter (default params, no
# badwords): line retention (terminal punct [.!?] + optional closing
# quote, >=5 whitespace tokens, no 'javascript'), then page drops.
# trim() is space-only in both engines; Spark split keeps interior empty
# fields exactly like regexp_split_to_array.
C4_ORACLE = r"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)), l ->
           regexp_matches(trim(l), '[.!?]["''”’]?$')
           AND len(regexp_split_to_array(trim(l), '[ \t\n\v\f\r]+')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kept
  FROM documents),
c AS (
  SELECT doc_id, text,
         len(string_split(text, chr(10))) AS n_lines,
         len(kept) AS n_lines_kept,
         -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
         coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
         len(list_filter(
           regexp_split_to_array(
             coalesce(array_to_string(kept, chr(10)), ''), '[.!?]'),
           s -> len(trim(s)) > 0)) AS n_sentences
  FROM base)
SELECT doc_id, reasons = '' AS keep, reasons,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_lines_kept AS BIGINT) AS n_lines_kept,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       text_clean
FROM (
  SELECT *, concat_ws('|',
      CASE WHEN n_sentences < 3 THEN 'too-few-sentences' END,
      CASE WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem-ipsum' END,
      CASE WHEN contains(text, '{') THEN 'curly-brace' END) AS reasons
  FROM c) r
"""


def gopher_filter_oracle() -> str:
    """Composition of the token/quality/repetition oracles with the same
    thresholds and reason strings as operators.textstats
    .gopher_quality_filter (concat_ws skips NULL CASE arms identically in
    both engines)."""
    from .operators.textstats import GOPHER_THRESHOLDS as T
    return f"""
WITH ts AS ({TOKEN_STATS_ORACLE}),
qs AS ({QUALITY_ORACLE}),
rs AS ({REPETITION_ORACLE})
SELECT ts.doc_id,
       reasons = '' AS keep, reasons
FROM (
  SELECT ts.doc_id,
         concat_ws('|',
           CASE WHEN ts.n_tokens < {T["min_words"]} THEN 'too-few-words' END,
           CASE WHEN ts.n_tokens > {T["max_words"]} THEN 'too-many-words' END,
           CASE WHEN CAST(ts.token_chars AS DOUBLE)
                     / nullif(CAST(ts.n_tokens AS DOUBLE), 0)
                     < {T["min_mean_word_len"]} THEN 'short-words' END,
           CASE WHEN CAST(ts.token_chars AS DOUBLE)
                     / nullif(CAST(ts.n_tokens AS DOUBLE), 0)
                     > {T["max_mean_word_len"]} THEN 'long-words' END,
           CASE WHEN qs.punct_ratio > {T["max_punct_ratio"]}
                THEN 'punct-heavy' END,
           CASE WHEN qs.stopword_ratio < {T["min_stopword_ratio"]}
                THEN 'no-stopwords' END,
           CASE WHEN rs.dup_line_frac > {T["max_dup_line_frac"]}
                THEN 'dup-lines' END,
           CASE WHEN rs.top_2gram_char_frac > {T["max_top2gram_char_frac"]}
                THEN 'top-2gram' END,
           CASE WHEN rs.dup_5gram_char_frac > {T["max_dup5gram_char_frac"]}
                THEN 'dup-5grams' END) AS reasons
  FROM ts JOIN qs ON ts.doc_id = qs.doc_id
          JOIN rs ON ts.doc_id = rs.doc_id) ts
"""


def gopher_filter_full_oracle() -> str:
    """Mirror of operators.textstats.gopher_quality_filter_full: the base
    gate's reasons plus the complete Table-A1 family — dup-line-chars,
    paragraph duplicates, top-3/4-gram and dup-6..10-gram fractions.
    CASE on a NULL fraction (empty doc) yields NULL and concat_ws skips
    it, matching the Spark side's when()-on-NULL behaviour; top-gram
    ties break (cnt, length(gram))-greatest in both engines — any gram
    tied on BOTH yields the identical cnt*length product, so the
    fraction is engine-independent by construction (this also lets the
    Spark side shuffle xxhash64(gram) instead of the string)."""
    from .operators.textstats import GOPHER_THRESHOLDS_FULL as T
    top_ns, dup_ns = (3, 4), (6, 7, 8, 9, 10)
    ctes = []
    for n in sorted(set(top_ns) | set(dup_ns)):
        ctes.append(
            f"g{n} AS (SELECT doc_id, array_to_string(w[i:i+{n - 1}], ' ')"
            f" AS gram FROM fbase, LATERAL (SELECT unnest(generate_series("
            f"1, len(w) - {n - 1})) AS i) t WHERE len(w) >= {n})")
    for n in top_ns:
        ctes.append(
            f"top{n}f AS (SELECT doc_id, cnt * length(gram) AS chars FROM"
            f" (SELECT doc_id, gram, count(*) AS cnt, row_number() OVER"
            f" (PARTITION BY doc_id ORDER BY count(*) DESC,"
            f" length(gram) DESC) AS rn"
            f" FROM g{n} GROUP BY doc_id, gram) q WHERE rn = 1)")
    for n in dup_ns:
        ctes.append(
            f"dup{n}f AS (SELECT doc_id, sum(CASE WHEN cnt > 1 THEN"
            f" (cnt - 1) * length(gram) ELSE 0 END) AS chars FROM"
            f" (SELECT doc_id, gram, count(*) AS cnt FROM g{n}"
            f" GROUP BY 1, 2) q GROUP BY 1)")

    def frac(cte):
        return (f"CASE WHEN b.n_chars > 0 THEN least("
                f"CAST(coalesce({cte}.chars, 0) AS DOUBLE) / b.n_chars,"
                f" 1.0) END")

    extra = [
        f"CASE WHEN rs.dup_line_char_frac >"
        f" {T['max_dup_line_char_frac']} THEN 'dup-line-chars' END",
        f"CASE WHEN pf.dup_para_frac > {T['max_dup_para_frac']}"
        f" THEN 'dup-paras' END",
        f"CASE WHEN pf.dup_para_char_frac >"
        f" {T['max_dup_para_char_frac']} THEN 'dup-para-chars' END",
    ]
    joins = ["LEFT JOIN pf USING (doc_id)"]
    for n in top_ns:
        extra.append(f"CASE WHEN {frac(f'top{n}f')} >"
                     f" {T[f'max_top{n}gram_char_frac']}"
                     f" THEN 'top-{n}gram' END")
        joins.append(f"LEFT JOIN top{n}f USING (doc_id)")
    for n in dup_ns:
        extra.append(f"CASE WHEN {frac(f'dup{n}f')} >"
                     f" {T[f'max_dup{n}gram_char_frac']}"
                     f" THEN 'dup-{n}grams' END")
        joins.append(f"LEFT JOIN dup{n}f USING (doc_id)")
    return f"""
WITH bg AS ({gopher_filter_oracle()}),
fbase AS (SELECT doc_id, length(text) AS n_chars,
                 regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+') AS w
          FROM documents),
rs AS ({REPETITION_ORACLE}),
paras AS (SELECT doc_id, unnest(list_filter(list_transform(
            regexp_split_to_array(text, '\n{{2,}}'), p -> trim(p)),
            p -> p != '')) AS para
          FROM documents),
pagg AS (SELECT doc_id, sum(cnt) AS para_total,
                sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS para_dup,
                sum(CASE WHEN cnt > 1 THEN (cnt - 1) * length(para)
                    ELSE 0 END) AS para_dup_chars
         FROM (SELECT doc_id, para, count(*) AS cnt FROM paras
               GROUP BY 1, 2) q GROUP BY 1),
pf AS (SELECT b.doc_id,
              CAST(pa.para_dup AS DOUBLE)
                / nullif(CAST(pa.para_total AS DOUBLE), 0) AS dup_para_frac,
              CAST(coalesce(pa.para_dup_chars, 0) AS DOUBLE)
                / nullif(CAST(b.n_chars AS DOUBLE), 0) AS dup_para_char_frac
       FROM fbase b LEFT JOIN pagg pa USING (doc_id)),
{',' .join(ctes)}
SELECT doc_id, reasons = '' AS keep, reasons FROM (
  SELECT bg.doc_id,
         concat_ws('|', nullif(bg.reasons, ''),
                   nullif(concat_ws('|', {', '.join(extra)}), '')) AS reasons
  FROM bg
  JOIN fbase b USING (doc_id)
  JOIN rs USING (doc_id)
  {' '.join(joins)}) r
"""


EVENT_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS win_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

CHARACTERIZE_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars,
       (text = lower(text) AND text != upper(text)) AS is_lower,
       (text = upper(text) AND text != lower(text)) AS is_upper,
       regexp_matches(text, '[⺀-鿿぀-ヿ가-힯豈-﫿]') AS has_cjk,
       regexp_matches(text, '[֐-׿؀-ۿݐ-ݿﭐ-﷿ﹰ-﻿]') AS has_mideast
FROM documents
"""

def gazetteer_etl_oracle() -> str:
    """Mirror of sources/gazetteer_etl.py over the same nation-derived raw
    rows: window dedup, 70/30 id_bias steps, name_bias heuristics, taggable
    subset filter."""
    from .sources.gazetteer_etl import DEFAULT_STOPNAMES
    stoplist = ", ".join(_sq(s) for s in DEFAULT_STOPNAMES)
    return f"""
WITH nat AS (SELECT trim(n_name) AS nm, n_nationkey FROM nation),
base AS (
  SELECT 'N' || CAST(n_nationkey AS VARCHAR) AS place_id,
         upper(substr(nm, 1, 1)) || lower(substr(nm, 2)) AS name,
         'N' AS name_type, 'A' AS feat_class, 'PCLI' AS feat_code,
         substr(nm, 1, 2) AS cc, '' AS adm1,
         CAST(n_nationkey AS BIGINT) * 1000000 AS pop
  FROM nat),
raw AS (
  SELECT * FROM base
  UNION ALL SELECT * FROM base
  UNION ALL
  SELECT 'N' || CAST(n_nationkey AS VARCHAR), substr(nm, 1, 2), 'C', 'A',
         'PCLI', substr(nm, 1, 2), '', CAST(n_nationkey AS BIGINT) * 1000000
  FROM nat
  UNION ALL
  SELECT 'T' || CAST(n_nationkey AS VARCHAR), lower(substr(nm, 1, 4)), 'N',
         'P', 'PPL', substr(nm, 1, 2), '', CAST(500 AS BIGINT)
  FROM nat),
dedup AS (
  SELECT *, row_number() OVER (
      PARTITION BY lower(name), name_type, cc, adm1, feat_class, feat_code
      ORDER BY place_id) AS rn
  FROM raw),
scored AS (
  SELECT place_id, name, name_type, feat_class, feat_code, cc, adm1, pop,
    CAST(round((7 * (CASE WHEN pop >= 10000000 THEN 10
                          WHEN pop >= 1000000 THEN 8
                          WHEN pop >= 100000 THEN 6
                          WHEN pop >= 10000 THEN 4
                          WHEN pop >= 1000 THEN 2 ELSE 0 END)
              + 3 * (CASE WHEN feat_code = 'ADM1' THEN 16
                          WHEN feat_code LIKE 'PCL%' THEN 16
                          WHEN feat_code = 'PPLC' THEN 15
                          WHEN feat_code = 'ADM2' THEN 13
                          WHEN feat_class = 'A' THEN 11
                          WHEN feat_class = 'P' THEN 10 ELSE 5 END)) / 10.0)
         AS INTEGER) AS id_bias,
    CAST(CASE WHEN name_type != 'N' THEN 0
              WHEN lower(name) IN ({stoplist}) THEN -100
              WHEN length(name) < 5 AND name = lower(name)
                   AND name = regexp_replace(name, '[^\\x00-\\x7F]', '?', 'g')
                   THEN -50
              ELSE 10 + (CASE WHEN length(name) >= 10 THEN 20 ELSE 0 END)
                      + (CASE WHEN name LIKE '% %' THEN 10 ELSE 0 END)
                      + (CASE WHEN name != regexp_replace(name,
                              '[^\\x00-\\x7F]', '?', 'g') THEN 10 ELSE 0 END)
         END AS INTEGER) AS name_bias
  FROM dedup WHERE rn = 1)
SELECT *, name_bias < 0 AS search_only
FROM scored
WHERE name_bias >= 0
  AND (name_type IN ('N', 'A') OR (name_type = 'C' AND feat_class = 'A'))
"""


COSINE_PAIRS_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
"""

ANN_TOPK_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
sims AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS sim
  FROM q, embeddings e
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 5
"""


# pinned results for the invariant queries (__spark_entry__ q_*_check /
# q_*_floor): empty violation sets with schema-matching columns
EMPTY_CONV_VIOLATIONS = """
SELECT CAST(NULL AS VARCHAR) AS conv_id, CAST(NULL AS INTEGER) AS turn_idx,
       CAST(NULL AS VARCHAR) AS violation WHERE false
"""

EMPTY_PAIR_VIOLATIONS = """
SELECT CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b,
       CAST(NULL AS VARCHAR) AS violation WHERE false
"""

EMPTY_ID_VIOLATIONS = """
SELECT CAST(NULL AS BIGINT) AS vec_id,
       CAST(NULL AS VARCHAR) AS violation WHERE false
"""

EMPTY_VEC_VIOLATIONS = """
SELECT CAST(NULL AS BIGINT) AS vec_a, CAST(NULL AS BIGINT) AS vec_b,
       CAST(NULL AS VARCHAR) AS violation WHERE false
"""

EMPTY_IVF_VIOLATIONS = """
SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS vec_id,
       CAST(NULL AS INTEGER) AS rank, CAST(NULL AS VARCHAR) AS violation
WHERE false
"""


# survivor selection: components over chained identical-doc pairs must equal
# the md5 grouping (min doc_id per group survives)
NEAR_DUP_GROUPS_ORACLE = """
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY md5(text)) AS group_id,
       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
FROM documents
"""


EMPTY_JPEG_VIOLATIONS = """
SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS mean_err,
       CAST(NULL AS VARCHAR) AS violation WHERE false
"""
