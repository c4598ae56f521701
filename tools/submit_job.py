#!/usr/bin/env python
"""Cluster-entry job for spark-submit (north rule: ships via
``spark-submit --py-files xponents_spark.zip tools/submit_job.py <sf_dir> <out>``).
Reads the transcript table, runs the one-stage extraction, writes ordered
parquet + prints a row/match summary."""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir, out = sys.argv[1], sys.argv[2]
    # Engine session defaults (AQE, Arrow, v2 committer, locality.wait=0 —
    # the round-6 multi-executor fix) apply ONLY where the submitter's
    # --conf / spark-defaults did not already set the key, so cluster
    # operators keep the last word.
    from pyspark import SparkConf
    from pyspark.context import SparkContext

    from xponents_spark.session import engine_conf
    # bring the JVM gateway up FIRST: a pre-gateway SparkConf() cannot see
    # spark-submit's --conf / spark-defaults.conf and the engine defaults
    # would silently stomp them (verified both ways under spark-submit)
    SparkContext._ensure_initialized()
    submitted = SparkConf()          # JVM-backed: loads submitted spark.*
    b = SparkSession.builder.appName("xponents-extract")
    for k, v in engine_conf().items():
        if not submitted.contains(k):
            b = b.config(k, v)
    spark = b.getOrCreate()
    from xponents_spark.pipeline import extract
    from xponents_spark.plans import salted_repartition
    from xponents_spark.sources import synthesize_transcripts

    t = salted_repartition(synthesize_transcripts(spark, sf_dir), 16)
    res = extract(t).select("conv_id", "turn_idx", "role", "tool", "ts",
                            "main_text", "matches")
    res.sortWithinPartitions("conv_id", "turn_idx") \
       .write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    n = back.count()
    m = back.select(F.sum(F.size("matches"))).first()[0]
    print(f"SUBMIT_OK rows={n} matches={m}")


if __name__ == "__main__":
    main()
