"""Deterministic transcripts synthesis — Spark side + DuckDB-oracle side.

Both sides derive the SAME table from ``documents.parquet`` so the driver's
correctness gate can compare them:

* ``conv_id``  = 'c' || (doc_id % NUM_CONVS)
* ``turn_idx`` = doc_id // NUM_CONVS                      (int32, dense/conv)
* ``role``     = cycle(user, assistant, tool) by doc_id % 3
* ``tool``     = 'search' on tool turns else NULL
* ``ts``       = TIMESTAMP '2025-01-01' + doc_id seconds  (monotone per conv)
* ``text``     = documents.text || ' ' || payload(doc_id % NUM_PAYLOADS),
                 or the HTML wrap for the html class.

``turns_per_doc`` > 1 replicates each document into that many turns (cross
join with a range) for benchmark-scale inputs and long-conversation skew;
the correctness queries use the default 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .payloads import HTML_CLASS, HTML_PREFIX, HTML_SUFFIX, NUM_PAYLOADS, PAYLOADS

NUM_CONVS = 37
EPOCH_START = "2025-01-01 00:00:00"


def _payload_case_spark():
    k = F.col("doc_id") % NUM_PAYLOADS
    expr = None
    for idx, (_name, text) in enumerate(PAYLOADS):
        if idx == HTML_CLASS:
            val = F.concat(F.lit(HTML_PREFIX), F.col("text"), F.lit(HTML_SUFFIX))
        else:
            val = F.concat(F.col("text"), F.lit(" " + text))
        expr = F.when(k == idx, val) if expr is None else expr.when(k == idx, val)
    return expr


def synthesize_transcripts(spark: SparkSession, sf_dir: str,
                           turns_per_doc: int = 1) -> DataFrame:
    """documents.parquet -> transcripts DataFrame (see module doc)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if turns_per_doc > 1:
        reps = spark.range(turns_per_doc).select(F.col("id").alias("rep"))
        docs = (docs.crossJoin(F.broadcast(reps))
                    .withColumn("doc_id", F.col("doc_id") * turns_per_doc + F.col("rep"))
                    .drop("rep"))
    role = (F.col("doc_id") % 3)
    return (docs.select(
        F.concat(F.lit("c"), (F.col("doc_id") % NUM_CONVS).cast("string")).alias("conv_id"),
        F.expr(f"CAST(doc_id DIV {NUM_CONVS} AS INT)").alias("turn_idx"),
        F.when(role == 0, "user").when(role == 1, "assistant").otherwise("tool").alias("role"),
        _payload_case_spark().alias("text"),
        F.when(role == 2, "search").otherwise(F.lit(None).cast("string")).alias("tool"),
        F.expr(f"timestamp'{EPOCH_START}' + make_interval(0,0,0,0,0,0,doc_id)").alias("ts"),
    ))


def transcripts_oracle_cte() -> str:
    """DuckDB SQL producing the identical transcripts relation from the
    pre-registered ``documents`` view.  Used as a WITH clause by oracle
    queries."""
    text_cases = []
    for idx, (_name, text) in enumerate(PAYLOADS):
        if idx == HTML_CLASS:
            val = f"{_sq(HTML_PREFIX)} || text || {_sq(HTML_SUFFIX)}"
        else:
            val = f"text || {_sq(' ' + text)}"
        text_cases.append(f"WHEN {idx} THEN {val}")
    case_sql = "CASE (doc_id % {n}) {cases} END".format(
        n=NUM_PAYLOADS, cases=" ".join(text_cases))
    return f"""
transcripts AS (
  SELECT
    'c' || CAST(doc_id % {NUM_CONVS} AS VARCHAR)            AS conv_id,
    CAST(doc_id // {NUM_CONVS} AS INTEGER)                  AS turn_idx,
    CASE (doc_id % 3) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    {case_sql}                                              AS text,
    CASE (doc_id % 3) WHEN 2 THEN 'search' ELSE NULL END    AS tool,
    TIMESTAMP '{EPOCH_START}' + doc_id * INTERVAL 1 SECOND  AS ts,
    doc_id,
    (doc_id % {NUM_PAYLOADS})                               AS payload_k,
    length(text)                                            AS base_len
  FROM documents
)"""


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a real transcripts table (parquet dir or Iceberg table name).

    Column pruning/predicate pushdown is Catalyst's; callers should select
    only the columns they consume before the extraction stage.
    """
    if "/" in path:
        return spark.read.parquet(path)
    return spark.read.table(path)


def synthesize_clustered_embeddings(spark, n_vecs: int = 2000, dim: int = 64,
                                    n_clusters: int = 20, noise: float = 0.15):
    """Deterministic planted-cluster embeddings (VERDICT r1 item 8): each
    vector = unit cluster center + gaussian noise, seeded per vec_id, so ANN
    recall is assertable on REALISTIC (clustered) structure — the provided
    test embeddings are unstructured gaussians, ANN's worst case.

    Generation is distributed (mapInPandas over spark.range); per-row
    determinism comes from seeding numpy with vec_id, never from partition
    layout."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ])

    def gen(batches):
        centers = None
        for pdf in batches:
            if centers is None:
                rng = np.random.RandomState(1234)
                centers = rng.randn(n_clusters, dim)
                centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            ids = pdf["id"].to_numpy()
            out_vecs, labels = [], []
            for vid in ids:
                r = np.random.RandomState(10_000 + int(vid))
                c = int(vid) % n_clusters
                v = centers[c] + noise * r.randn(dim)
                out_vecs.append((v / np.linalg.norm(v)).astype("float32").tolist())
                labels.append(c)
            yield pd.DataFrame({"vec_id": ids, "embedding": out_vecs,
                                "label": labels})

    return spark.range(0, n_vecs, 1, 8).mapInPandas(gen, schema=schema)
