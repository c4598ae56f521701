#!/usr/bin/env python
"""Audit minhash_near_dups vs exact ngram ground truth at a given SF, and
report total shuffle write bytes for the minhash job (Spark UI REST API).

Usage: python tools/minhash_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession  # noqa: E402

from xponents_spark.operators.dedup import minhash_near_dups, ngram_jaccard_pairs  # noqa: E402


def shuffle_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    got = {(r.doc_a, r.doc_b) for r in minhash_near_dups(docs, threshold=0.5).collect()}
    sb = shuffle_bytes(spark)
    truth = {(r.doc_a, r.doc_b)
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    tp = len(got & truth)
    p = tp / len(got) if got else 1.0
    r = tp / len(truth) if truth else 1.0
    print(json.dumps({"sf_dir": sf_dir, "pairs": len(got), "truth": len(truth),
                      "precision": round(p, 4), "recall": round(r, 4),
                      "minhash_shuffle_write_bytes": sb}))
    spark.stop()


if __name__ == "__main__":
    main()
