#!/usr/bin/env python
"""Taxcat scale figure (VERDICT r2 item 7): synth JRC/person-scale lexicon
-> ETL -> parquet -> worker index; report artifact size, per-process index
build cost/RSS, and tagging throughput with the big lexicon vs embedded.

Usage: python tools/taxcat_scale_bench.py [n_rows] [out_dir]
Writes BENCH/taxcat_<n>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _priv_kb() -> int:
    t = 0
    with open(f"/proc/{os.getpid()}/smaps_rollup") as fh:
        for ln in fh:
            p = ln.split()
            if p and p[0].rstrip(":") in ("Private_Clean", "Private_Dirty"):
                t += int(p[1])
    return t


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/taxcat_scale"
    pq_path = os.path.join(out_dir, "taxcat.parquet")

    from xponents_spark.session import get_spark
    from xponents_spark.sources.taxcat_etl import (build_taxcat_parquet,
                                                   synthesize_taxcat_raw,
                                                   taxcat_etl)

    spark = get_spark(app="taxcat-scale", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    res = {"n_raw_rows": n_rows}
    t0 = time.time()
    build_taxcat_parquet(taxcat_etl(synthesize_taxcat_raw(
        spark, n_rows, partitions=16)), pq_path)
    res["etl_sec"] = round(time.time() - t0, 1)
    res["n_taggable"] = spark.read.parquet(pq_path) \
        .filter("valid AND phrase != ''").count()
    res["artifact_mb"] = round(sum(
        os.path.getsize(os.path.join(pq_path, f))
        for f in os.listdir(pq_path)) / 1e6, 1)

    # per-process index build (what each executor worker pays once)
    from xponents_spark.gazetteer import matcher
    p0 = _priv_kb()
    t0 = time.time()
    matcher.set_taxcat_parquet(pq_path)
    idx = matcher.tax_index()
    res["index_build_sec"] = round(time.time() - t0, 2)
    res["index_private_mb"] = round((_priv_kb() - p0) / 1024, 1)
    res["n_index_phrases"] = len(idx.index)
    probe = spark.read.parquet(pq_path).filter("valid").first()
    hits = matcher.tag_taxons(f"met {probe['name']} at the summit")
    res["probe_hits"] = len(hits)
    matcher.set_taxcat_parquet(None)

    # round-4 mmap artifact: same lexicon, shared page cache per node
    from xponents_spark.gazetteer.mmapstore import build_taxcat_mmap
    mm_path = os.path.join(out_dir, "taxcat.mmap")
    t0 = time.time()
    build_taxcat_mmap(pq_path, mm_path)
    res["mmap_build_sec"] = round(time.time() - t0, 1)
    res["mmap_artifact_mb"] = round(sum(
        os.path.getsize(os.path.join(mm_path, f))
        for f in os.listdir(mm_path)) / 1e6, 1)
    p0 = _priv_kb()
    t0 = time.time()
    matcher.set_taxcat_parquet(mm_path)
    matcher.tax_index()
    hits_mm = matcher.tag_taxons(f"met {probe['name']} at the summit")
    res["mmap_open_sec"] = round(time.time() - t0, 3)
    res["mmap_open_private_mb"] = round((_priv_kb() - p0) / 1024, 1)
    assert [h[:6] for h in hits_mm] == [h[:6] for h in hits], \
        "mmap/parquet taxcat tag mismatch"
    matcher.set_taxcat_parquet(None)

    # Spark throughput: taxons-only extraction, embedded vs big lexicon
    from pyspark.sql import functions as F

    from xponents_spark.pipeline import extract
    from xponents_spark.plans import salted_repartition
    from xponents_spark.sources import synthesize_transcripts

    t = synthesize_transcripts(spark, SF_DIR, turns_per_doc=4)
    t = salted_repartition(t, 32).cache()
    n = t.count()

    def run(path):
        (extract(t, features=("taxons",), taxcat_parquet=path)
         .select(F.size("matches").alias("nm")).agg(F.sum("nm")).collect())

    for label, path in (("embedded", None), ("scale", pq_path),
                        ("mmap", mm_path)):
        run(path)
        t0 = time.time()
        run(path)
        res[f"taxon_turns_per_sec_{label}"] = round(n / (time.time() - t0), 1)
    res["n_turns"] = n

    print(json.dumps(res))
    bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
    if os.path.isdir(bench_dir):
        with open(os.path.join(bench_dir, f"taxcat_{n_rows}.json"), "w") as fh:
            json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
