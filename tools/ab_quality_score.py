#!/usr/bin/env python
"""Same-window A/B attribution of the quality_score vs-r1 drift
(VERDICT r5 item 6): r1's projection had 3 signals (n_tokens,
chars_per_token, stopword_ratio); rounds 2+ added punct_ratio and
alpha_ratio, each a full-text scan.  This interleaves, in ONE window on
ONE warm session over sf0.1:

  A  r1-scope projection (HEAD engine, r1 columns)
  B  HEAD full projection (length-of-regexp_replace counting)
  C  HEAD full projection with regexp_count char counting (candidate)

If A matches the r1 time while B carries the published drift, the delta
is SCOPE GROWTH, not an engine regression; C measures whether the extra
columns can be cheaper.  Writes BENCH/ab_quality_score_r06.json.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xponents_spark.operators.textstats import (_STOPWORDS,  # noqa: E402
                                                _tokens, quality_score)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def r1_scope(df):
    toks = _tokens("text")
    stop_arr = ", ".join(f"'{w}'" for w in _STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(trim(text), '\\\\s+'), x -> x IN ({stop_arr})))")
    n_tok = F.size(toks)
    return df.select(
        F.col("doc_id"), n_tok.alias("n_tokens"),
        (F.length("text").cast("double") / n_tok).alias("chars_per_token"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"))


def full_regexp_count(df):
    toks = _tokens("text")
    stop_arr = ", ".join(f"'{w}'" for w in _STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(trim(text), '\\\\s+'), x -> x IN ({stop_arr})))")
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.expr(r"regexp_count(text, '[!-/:-@\\[-`{-~]')")
    n_alpha = F.expr(r"regexp_count(text, '[A-Za-z]')")
    n_chars_nz = F.nullif(n_chars, F.lit(0))
    n_tok_nz = F.nullif(n_tok, F.lit(0))
    return df.select(
        F.col("doc_id"), n_tok.alias("n_tokens"),
        (n_chars.cast("double") / n_tok_nz).alias("chars_per_token"),
        (n_stop.cast("double") / n_tok_nz).alias("stopword_ratio"),
        (n_punct.cast("double") / n_chars_nz).alias("punct_ratio"),
        (n_alpha.cast("double") / n_chars_nz).alias("alpha_ratio"))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("ab_quality_score").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    variants = {"A_r1_scope": lambda: r1_scope(docs),
                "B_head_full": lambda: quality_score(docs),
                "C_full_regexp_count": lambda: full_regexp_count(docs)}

    def run(v):
        t0 = time.time()
        variants[v]().write.mode("overwrite").format("noop").save()
        return time.time() - t0

    for v in variants:                     # warm codegen once per variant
        run(v)
    times = {v: [] for v in variants}
    t0 = time.time()
    for _ in range(rounds):                # interleaved: ambient hits all
        for v in variants:
            times[v].append(run(v))
    window = time.time() - t0
    # value identity: B and C must agree exactly
    b = quality_score(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    c = full_regexp_count(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    identical = bool(b.equals(c))
    out = {
        "sf": SF_DIR, "rounds": rounds, "window_sec": round(window, 1),
        "protocol": "one warm session, interleaved A,B,C x rounds, "
                    "best-of per variant; value identity B==C checked",
        "best": {v: round(min(ts), 3) for v, ts in times.items()},
        "all": {v: [round(t, 3) for t in ts] for v, ts in times.items()},
        "b_equals_c": identical,
        "r1_published_sec": 0.217, "r5_published_sec": 0.384,
    }
    best = out["best"]
    out["attribution"] = (
        "scope_growth" if best["A_r1_scope"] <= 0.217 * 1.25 else
        "engine_regression_suspected")
    path = os.path.join(REPO, "BENCH", "ab_quality_score_r06.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["best"]), out["attribution"], "b==c:", identical)


if __name__ == "__main__":
    main()
