#!/usr/bin/env python
"""End-to-end ≥1M-name gazetteer run (VERDICT round-1 item 3).

1. synthesize a raw gazetteer (~1.3M rows incl. dups) -> gazetteer_etl ->
   build_tagger_parquet (the runtime artifact with the matcher-normalized
   phrase column);
2. measure per-process index build time + RSS delta (the figure that
   corresponds to the reference tagger's 1.2-3.0 GB heap class);
3. run the extraction bench with XPONENTS_GAZETTEER_PARQUET set, so every
   executor python worker tags against the 1M-name index — report
   throughput vs the embedded toy gazetteer.

Usage: python tools/gaz_scale_bench.py [n_rows] [out_dir]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gaz_scale"
    tagger_pq = os.path.join(out_dir, "tagger.parquet")

    from xponents_spark.session import get_spark
    from xponents_spark.sources.gazetteer_synth import synthesize_gazetteer_raw
    from xponents_spark.sources.gazetteer_etl import (gazetteer_etl,
                                                      build_tagger_parquet)

    spark = get_spark(app="gaz-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    res = {"n_raw_rows": n_rows}
    t0 = time.time()
    raw = synthesize_gazetteer_raw(spark, n_rows)
    taggable = gazetteer_etl(raw)
    # union the embedded fixture rows so the 1M run produces the SAME
    # matches as the toy run on the bench corpus — the throughput delta
    # then isolates dictionary-size cost, not match-count differences
    from xponents_spark.gazetteer.data import GAZETTEER_ROWS
    toy_cols = ["place_id", "name", "name_type", "feat_class", "feat_code",
                "cc", "adm1", "lat", "lon", "id_bias", "pop"]
    toy = spark.createDataFrame(
        [tuple(r) for r in GAZETTEER_ROWS], toy_cols) \
        .selectExpr("place_id", "name", "name_type", "feat_class",
                    "feat_code", "cc", "adm1", "CAST(lat AS DOUBLE) lat",
                    "CAST(lon AS DOUBLE) lon", "CAST(id_bias AS INT) id_bias",
                    "CAST(pop AS BIGINT) pop")
    taggable = taggable.unionByName(toy, allowMissingColumns=True)
    build_tagger_parquet(taggable, tagger_pq)
    res["etl_sec"] = round(time.time() - t0, 1)
    res["n_taggable"] = spark.read.parquet(tagger_pq).count()

    # per-process index build cost + memory (driver-process probe = same
    # code path each executor worker runs once)
    from xponents_spark.gazetteer.store import (ParquetGazetteerIndex,
                                                CompactSpatialIndex)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    idx = ParquetGazetteerIndex(tagger_pq)
    res["index_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    CompactSpatialIndex(tagger_pq)
    res["spatial_build_sec"] = round(time.time() - t0, 2)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    res["index_rss_mb"] = round((rss1 - rss0) / 1024, 1)
    res["n_distinct_phrases"] = len(idx.loc)
    # sanity: the index actually tags
    hits = idx.scan("travelling to " + next(iter(idx.loc)) + " tomorrow")
    res["probe_scan_hits"] = len(hits)
    del idx

    # throughput: place-extraction over sf0.1 transcripts, big vs toy gaz
    from xponents_spark.pipeline import extract
    from xponents_spark.plans import salted_repartition
    from xponents_spark.sources import synthesize_transcripts

    t = synthesize_transcripts(spark, SF_DIR, turns_per_doc=10)
    t = salted_repartition(t, 64).cache()
    n = t.count()
    feats = ("places", "countries", "taxons", "postal")

    def run(gaz):
        df = extract(t, features=feats, gazetteer_parquet=gaz)
        df.write.mode("overwrite").format("noop").save()

    for label, gaz in (("toy", None), ("1m", tagger_pq)):
        run(gaz)   # warm (worker fork + index build pays here)
        t0 = time.time()
        run(gaz)
        res[f"tag_turns_per_sec_{label}"] = round(n / (time.time() - t0), 1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
