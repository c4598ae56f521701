"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship extraction pipeline over sf0.001 transcripts.
``queries()``      — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``   — DuckDB-equivalent SQL for the correctness gate.

Correctness design: synthetic transcripts derive deterministically from the
``documents`` parquet with fixed entity payloads per ``doc_id % N``
(xponents_spark/sources/payloads.py), so the oracle states expected
extraction output as literal VALUES rows — independent of any regex engine —
including span offsets computed from ``length(text)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xponents_spark import oracle as O
from xponents_spark.operators import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    exact_dedup,
    fingerprint,
    lang_id,
    minhash_near_dups,
    ngram_jaccard_pairs,
    quality_score,
    simhash_near_dups,
    token_stats,
)
from xponents_spark.pipeline import exploded_matches, extract
from xponents_spark.plans import ordered_output, salted_repartition
from xponents_spark.sources import synthesize_transcripts

SF0001 = "/root/testdata/sf0.001"

_MATCH_BASE_COLS = ["conv_id", "turn_idx", "span_start", "span_end",
                    "matchtext", "label"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: read transcripts -> salted repartition -> one-stage Arrow
    extraction -> stable (conv_id, turn_idx) ordering."""
    t = synthesize_transcripts(spark, SF0001)
    t = salted_repartition(t, 8)
    out = extract(t)
    return ordered_output(
        out.select("conv_id", "turn_idx", "role", "tool", "ts",
                   "main_text", "matches"))


# --- query helpers -----------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract(synthesize_transcripts(spark, sf_dir))


def q_transcripts(spark, sf_dir):
    return synthesize_transcripts(spark, sf_dir)


def q_main_content(spark, sf_dir):
    t = synthesize_transcripts(spark, sf_dir)
    return extract(t, features=("content",)).select("conv_id", "turn_idx", "main_text")


def q_xcoord(spark, sf_dir):
    ex = exploded_matches(_extracted(spark, sf_dir), label="coord")
    # cc/adm1/name/place_id are the J4 reverse-geocode enrichment
    return ex.select(*_MATCH_BASE_COLS, "lat", "lon", "prec", "geohash",
                     "cc", "adm1", "name", "place_id")


def q_xtemporal(spark, sf_dir):
    ex = exploded_matches(_extracted(spark, sf_dir), label="date")
    return ex.select(*_MATCH_BASE_COLS, "date_norm", "epoch", "resolution")


def q_poli(spark, sf_dir):
    ex = exploded_matches(_extracted(spark, sf_dir))
    return (ex.filter(F.col("label").isin("email", "phone", "money", "ip", "url", "mac"))
              .select(*_MATCH_BASE_COLS))


def q_places(spark, sf_dir):
    ex = exploded_matches(_extracted(spark, sf_dir))
    return (ex.filter(F.col("label").isin("place", "country"))
              .select(*_MATCH_BASE_COLS, "cc", "adm1", "feat_class",
                      "feat_code", "place_id", "name", "lat", "lon",
                      "confidence"))


def q_postal(spark, sf_dir):
    ex = exploded_matches(_extracted(spark, sf_dir), label="postal")
    return ex.select(*_MATCH_BASE_COLS, "cc", "adm1", "name", "place_id",
                     "confidence")


def q_taxons(spark, sf_dir):
    ex = exploded_matches(_extracted(spark, sf_dir))
    return (ex.filter(F.col("label").isin("person", "org", "nationality"))
              .select(*_MATCH_BASE_COLS, "taxon", "catalog", "cc"))


def q_conv_scoped_places(spark, sf_dir):
    """Two-pass conversation-scope extraction (rows-only: the re-chosen
    geography depends on engine scoring, not SQL-expressible)."""
    from xponents_spark.pipeline import extract_conversation_scoped
    out = extract_conversation_scoped(synthesize_transcripts(spark, sf_dir))
    ex = exploded_matches(out)
    return (ex.filter(F.col("label").isin("place", "country"))
              .select(*_MATCH_BASE_COLS, "cc", "confidence"))


def q_conv_geography(spark, sf_dir):
    """A1 at conversation scope: per-conversation country mention counts
    (the reference's relevantCountries, rolled up over the conv's turns)."""
    ex = exploded_matches(_extracted(spark, sf_dir))
    return (ex.filter(F.col("label").isin("place", "country"))
              .groupBy("conv_id", "cc").agg(F.count("*").alias("n_mentions")))


def q_country_histogram(spark, sf_dir):
    """A1: corpus-level country mention histogram over geotagged matches."""
    ex = exploded_matches(_extracted(spark, sf_dir))
    return (ex.filter(F.col("label").isin("place", "country"))
              .groupBy("cc").agg(F.count("*").alias("n_mentions")))


def q_label_histogram(spark, sf_dir):
    ex = exploded_matches(_extracted(spark, sf_dir))
    return ex.groupBy("label").agg(F.count("*").alias("n_matches"))


def q_gazetteer_etl(spark, sf_dir):
    """S5: raw name rows -> deduped, bias-scored, taggable gazetteer."""
    from xponents_spark.sources.gazetteer_etl import (
        gazetteer_etl, synthesize_raw_gazetteer)
    return gazetteer_etl(synthesize_raw_gazetteer(spark, sf_dir))


def q_pdf_roundtrip(spark, sf_dir):
    """S1 PDF path: each document rendered to a deterministic PDF (binary
    column), then the text layer recovered by the pure-python extractor —
    output must equal the source text (identity oracle)."""
    import pandas as pd
    from pyspark.sql import types as T

    from xponents_spark.textract import convert_binary_docs
    from xponents_spark.textract.pdf import make_simple_pdf

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])

    def mk(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [make_simple_pdf(t) for t in pdf["text"].tolist()]})

    return convert_binary_docs(docs.mapInPandas(mk, schema=schema),
                               "payload", "text").select("doc_id", "text")


def q_exact_dedup(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def q_prefix_dedup(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    key = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)))
    return (docs.groupBy(key.alias("prefix_md5"))
                .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc")))


def q_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir))


def _queries_from(spark, sf_dir, n=10):
    rows = (_emb(spark, sf_dir).filter(F.col("vec_id") < n)
            .select("vec_id", "embedding").collect())
    return [(int(r["vec_id"]), list(r["embedding"])) for r in rows]


def q_ann_topk(spark, sf_dir):
    qs = _queries_from(spark, sf_dir)
    return (cosine_topk_bruteforce(_emb(spark, sf_dir), qs, k=5)
            .select("query_id", "vec_id", "rank"))


def q_ann_lsh(spark, sf_dir):
    # bits=5/probes=5 ~ 19% candidate fraction, recall@10 ~0.30 on the
    # structure-free gaussian test embeddings (BENCH/BASELINE.md quality
    # table) — the recall/cost dial of multi-probe LSH
    qs = _queries_from(spark, sf_dir)
    return (cosine_topk_lsh(_emb(spark, sf_dir), qs, k=5, bits=5, probes=5)
            .select("query_id", "vec_id", "rank"))


def q_ann_ivf(spark, sf_dir):
    """IVF coarse-quantizer ANN (rows-only: approximate by design);
    n=32/nprobe=8 ~ 25% candidate fraction, recall@10 ~0.65."""
    from xponents_spark.operators.similarity import cosine_topk_ivf
    qs = _queries_from(spark, sf_dir)
    return (cosine_topk_ivf(_emb(spark, sf_dir), qs, k=5,
                            n_centroids=32, nprobe=8)
            .select("query_id", "vec_id", "rank"))


def q_event_hourly(spark, sf_dir):
    """Tumbling-window aggregation over the events stream table: counts,
    integer-cent sums (deterministic across engines), distinct users."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"),
                       F.col("event_type"))
              .agg(F.count("*").alias("n_events"),
                   F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sum_cents"),
                   F.countDistinct("user_id").alias("n_users"))
              .select(F.col("w.start").alias("win_start"), "event_type",
                      "n_events", "sum_cents", "n_users"))


def q_characterize(spark, sf_dir):
    from xponents_spark.pipeline import characterize
    return characterize(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars", "is_lower", "is_upper", "has_cjk", "has_mideast")


def q_embedding_near_dups(spark, sf_dir):
    from xponents_spark.operators.similarity import embedding_near_dups
    return (embedding_near_dups(_emb(spark, sf_dir), threshold=0.8)
            .select("vec_a", "vec_b"))


def q_cosine_pairs(spark, sf_dir):
    """Exact all-pairs cosine ≥ 0.45 (ground truth for the LSH near-dup op)."""
    from xponents_spark.operators.similarity import cosine_pairs_bruteforce
    return cosine_pairs_bruteforce(_emb(spark, sf_dir), threshold=0.45)


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard similarity join (ground truth for the
    MinHash LSH approximation); threshold 0.5 keeps the planted near-dups."""
    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.5)


def q_minhash_dedup(spark, sf_dir):
    return minhash_near_dups(_docs(spark, sf_dir), threshold=0.2)


def q_simhash_dedup(spark, sf_dir):
    # hamming<=3 is the radius the 4x16-bit block scheme covers completely
    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_synth": q_transcripts,
        "main_content": q_main_content,
        "xcoord_extract": q_xcoord,
        "xtemporal_extract": q_xtemporal,
        "poli_extract": q_poli,
        "place_extract": q_places,
        "postal_extract": q_postal,
        "taxon_extract": q_taxons,
        "country_histogram": q_country_histogram,
        "conv_geography": q_conv_geography,
        "conv_scoped_places": q_conv_scoped_places,   # rows-only (two-pass rescore)
        "match_label_histogram": q_label_histogram,
        "gazetteer_etl": q_gazetteer_etl,
        "pdf_text_recovery": q_pdf_roundtrip,
        "exact_dedup": q_exact_dedup,
        "prefix_dedup": q_prefix_dedup,
        "token_stats": q_token_stats,
        "quality_score": q_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "event_hourly_windows": q_event_hourly,
        "characterize": q_characterize,
        "ngram_jaccard_pairs": q_ngram_jaccard,
        "ann_cosine_topk": q_ann_topk,
        "cosine_pairs": q_cosine_pairs,
        "embedding_near_dups": q_embedding_near_dups,   # rows-only (LSH approx)
        "ann_lsh_topk": q_ann_lsh,          # rows-only (approximate op)
        "ann_ivf_topk": q_ann_ivf,          # rows-only (approximate op)
        "minhash_near_dups": q_minhash_dedup,   # rows-only
        "simhash_near_dups": q_simhash_dedup,   # rows-only
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts_synth": O.transcripts_oracle(),
        "main_content": O.main_content_oracle(),
        "xcoord_extract": O.extraction_oracle(
            ("coord",), ("lat", "lon", "prec", "geohash",
                         "cc", "adm1", "name", "place_id"),
            ", exp.lat AS lat, exp.lon AS lon, "
            "CAST(exp.prec AS INTEGER) AS prec, exp.geohash AS geohash, "
            "exp.cc AS cc, exp.adm1 AS adm1, exp.name AS name, "
            "exp.place_id AS place_id"),
        "xtemporal_extract": O.extraction_oracle(
            ("date",), ("date_norm", "epoch", "resolution"),
            ", exp.date_norm AS date_norm, CAST(exp.epoch AS BIGINT) AS epoch, "
            "exp.resolution AS resolution"),
        "poli_extract": O.extraction_oracle(
            ("email", "phone", "money", "ip", "url", "mac"), ()),
        "place_extract": O.extraction_oracle(
            ("place", "country"),
            ("cc", "adm1", "feat_class", "feat_code", "place_id", "name",
             "lat", "lon", "confidence"),
            ", exp.cc AS cc, exp.adm1 AS adm1, exp.feat_class AS feat_class, "
            "exp.feat_code AS feat_code, exp.place_id AS place_id, "
            "exp.name AS name, exp.lat AS lat, exp.lon AS lon, "
            "CAST(exp.confidence AS INTEGER) AS confidence"),
        "postal_extract": O.extraction_oracle(
            ("postal",),
            ("cc", "adm1", "name", "place_id", "confidence"),
            ", exp.cc AS cc, exp.adm1 AS adm1, exp.name AS name, "
            "exp.place_id AS place_id, CAST(exp.confidence AS INTEGER) AS confidence"),
        "taxon_extract": O.extraction_oracle(
            ("person", "org", "nationality"),
            ("taxon", "catalog", "cc"),
            ", exp.taxon AS taxon, exp.catalog AS catalog, exp.cc AS cc"),
        "country_histogram": O.country_histogram_oracle(),
        "conv_geography": O.conv_geography_oracle(),
        "match_label_histogram": O.label_histogram_oracle(),
        "gazetteer_etl": O.gazetteer_etl_oracle(),
        "pdf_text_recovery": "SELECT doc_id, text FROM documents",
        "exact_dedup": O.EXACT_DEDUP_ORACLE,
        "prefix_dedup": O.PREFIX_DEDUP_ORACLE,
        "token_stats": O.TOKEN_STATS_ORACLE,
        "quality_score": O.QUALITY_ORACLE,
        "lang_id": O.lang_id_oracle(),
        "fingerprint": O.FINGERPRINT_ORACLE,
        "ngram_jaccard_pairs": O.NGRAM_JACCARD_ORACLE,
        "ann_cosine_topk": O.ANN_TOPK_ORACLE,
        "cosine_pairs": O.COSINE_PAIRS_ORACLE,
        "event_hourly_windows": O.EVENT_HOURLY_ORACLE,
        "characterize": O.CHARACTERIZE_ORACLE,
    }
