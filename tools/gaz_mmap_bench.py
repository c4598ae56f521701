#!/usr/bin/env python
"""Shared-memory gazetteer at the reference's scale class (VERDICT r2 item 4).

Builds a >=10M-name synthetic gazetteer, compiles BOTH runtime artifacts
(per-worker ParquetGazetteerIndex heap path vs mmap shared-page path), then
runs the multi-worker Spark tagging job against the mmap artifact and
accounts memory PER NODE, not per worker:

  * per-worker PRIVATE memory (Private_Clean+Private_Dirty from
    /proc/<pid>/smaps_rollup) — what each extra worker actually costs;
  * per-worker RSS (includes the mmap pages, counted once per worker —
    the misleading number);
  * node-level cost = sum(private) + one artifact copy in page cache.

The reference shares one ~3 GB Solr FST per node across all mappers
(Examples/MapReduce/README.md, solr/README.md:164-166); the mmap artifact
reproduces that sharing for Spark python workers.

For the heap path at this scale only ONE probe process is measured (its
per-worker RSS extrapolates linearly; 8 workers would need ~8x).

Usage: python tools/gaz_mmap_bench.py [n_rows] [workers] [out_dir]
Writes JSON to stdout (and BENCH/gaz_mmap_<n>.json if run from repo root).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _smaps(pid: int) -> dict[str, int]:
    out = {}
    try:
        with open(f"/proc/{pid}/smaps_rollup") as fh:
            for line in fh:
                parts = line.split()
                if len(parts) >= 2 and parts[0].rstrip(":") in (
                        "Rss", "Pss", "Private_Clean", "Private_Dirty",
                        "Shared_Clean", "Shared_Dirty"):
                    out[parts[0].rstrip(":")] = int(parts[1])   # kB
    except OSError:
        pass
    return out


def _pyspark_workers() -> list[int]:
    """PIDs of pyspark worker processes (children of pyspark.daemon)."""
    pids = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode(errors="replace")
        except OSError:
            continue
        if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            pids.append(int(pid))
    return pids


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gaz_mmap"
    tagger_pq = os.path.join(out_dir, "tagger.parquet")
    mmap_dir = os.path.join(out_dir, "tagger.mmap")

    from xponents_spark.session import get_spark
    from xponents_spark.sources.gazetteer_etl import (build_tagger_parquet,
                                                      gazetteer_etl)
    from xponents_spark.sources.gazetteer_synth import synthesize_gazetteer_raw

    res = {"n_raw_rows": n_rows, "workers": workers}
    spark = get_spark(app="gaz-mmap", master=f"local[{workers}]",
                      shuffle_partitions=max(workers * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(mmap_dir, "meta.json")):
        t0 = time.time()
        raw = synthesize_gazetteer_raw(spark, n_rows, partitions=64)
        taggable = gazetteer_etl(raw)
        from xponents_spark.gazetteer.data import GAZETTEER_ROWS
        toy_cols = ["place_id", "name", "name_type", "feat_class",
                    "feat_code", "cc", "adm1", "lat", "lon", "id_bias", "pop"]
        toy = spark.createDataFrame([tuple(r) for r in GAZETTEER_ROWS],
                                    toy_cols) \
            .selectExpr("place_id", "name", "name_type", "feat_class",
                        "feat_code", "cc", "adm1", "CAST(lat AS DOUBLE) lat",
                        "CAST(lon AS DOUBLE) lon",
                        "CAST(id_bias AS INT) id_bias",
                        "CAST(pop AS BIGINT) pop")
        build_tagger_parquet(taggable.unionByName(toy,
                                                  allowMissingColumns=True),
                             tagger_pq)
        res["etl_sec"] = round(time.time() - t0, 1)

        from xponents_spark.gazetteer.mmapstore import build_mmap_artifact
        t0 = time.time()
        meta = build_mmap_artifact(tagger_pq, mmap_dir)
        res["mmap_build_sec"] = round(time.time() - t0, 1)
        res.update({k: meta[k] for k in ("n_phrases", "n_rows")})
    else:
        with open(os.path.join(mmap_dir, "meta.json")) as fh:
            meta = json.load(fh)
        res.update({k: meta[k] for k in ("n_phrases", "n_rows")})
    res["mmap_artifact_mb"] = round(_du(mmap_dir) / 1e6, 1)
    res["parquet_artifact_mb"] = round(_du(tagger_pq) / 1e6, 1)

    # single-process probes: index open cost + scan sanity for both paths
    import resource

    from xponents_spark.gazetteer.mmapstore import MmapGazetteerIndex
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    mm = MmapGazetteerIndex(mmap_dir)
    res["mmap_open_sec"] = round(time.time() - t0, 3)
    probe = "travelling to Karitonmas and 北京市 this week"
    hits = mm.scan(probe)
    res["mmap_probe_hits"] = len(hits)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    res["mmap_open_private_mb"] = round((rss1 - rss0) / 1024, 1)

    # tagging throughput + per-worker memory through the Spark job
    from pyspark.sql import functions as F

    from xponents_spark.pipeline import extract
    from xponents_spark.plans import salted_repartition
    from xponents_spark.sources import synthesize_transcripts

    t = synthesize_transcripts(spark, SF_DIR, turns_per_doc=4)
    t = salted_repartition(t, workers * 2).cache()
    n = t.count()
    feats = ("places", "countries", "taxons", "postal")

    def run():
        (extract(t, features=feats, gazetteer_parquet=mmap_dir)
         .select(F.col("conv_id"), F.size("matches").alias("nm"))
         .agg(F.sum("nm")).collect())

    run()          # warm: fork workers, open mmaps
    t0 = time.time()
    run()
    res["tag_turns_per_sec_mmap"] = round(n / (time.time() - t0), 1)
    res["n_turns"] = n

    stats = [_smaps(p) for p in _pyspark_workers()]
    stats = [s for s in stats if s.get("Rss", 0) > 50_000]   # real workers
    if stats:
        priv = [s.get("Private_Clean", 0) + s.get("Private_Dirty", 0)
                for s in stats]
        res["n_measured_workers"] = len(stats)
        res["worker_rss_mb_mean"] = round(
            sum(s["Rss"] for s in stats) / len(stats) / 1024, 1)
        res["worker_private_mb_mean"] = round(sum(priv) / len(priv) / 1024, 1)
        res["worker_private_mb_max"] = round(max(priv) / 1024, 1)
        res["node_total_private_mb"] = round(sum(priv) / 1024, 1)
        res["node_cost_mb"] = round(
            sum(priv) / 1024 + _du(mmap_dir) / 1e6, 1)

    # heap-path reference point at the same scale: ONE worker's index RSS
    # (per-worker; a node pays workers x this)
    if os.environ.get("GAZ_HEAP_PROBE", "1") == "1":
        import subprocess
        code = (
            "import os, sys, time\n"
            "sys.path.insert(0, %r)\n"
            "def priv():\n"
            "    t = 0\n"
            "    for ln in open(f'/proc/{os.getpid()}/smaps_rollup'):\n"
            "        p = ln.split()\n"
            "        if p and p[0].rstrip(':') in ('Private_Clean', 'Private_Dirty'):\n"
            "            t += int(p[1])\n"
            "    return t\n"
            "p0 = priv()\n"
            "t0 = time.time()\n"
            "from xponents_spark.gazetteer.store import ParquetGazetteerIndex\n"
            "ix = ParquetGazetteerIndex(%r)\n"
            "dt = time.time() - t0\n"
            "print((priv() - p0) // 1024, round(dt, 1), len(ix.loc))\n"
            % (os.path.join(os.path.dirname(__file__), ".."), tagger_pq))
        try:
            out = subprocess.run([sys.executable, "-c", code], timeout=1800,
                                 capture_output=True, text=True)
            mb, sec, nloc = out.stdout.split()
            res["heap_index_private_mb_per_worker"] = int(mb)
            res["heap_index_build_sec"] = float(sec)
            res["heap_node_cost_mb_at_workers"] = int(mb) * workers
        except Exception as e:   # noqa: BLE001 — report, don't die
            res["heap_probe_error"] = str(e)[:200]

    print(json.dumps(res))
    bench_dir = os.path.join(os.path.dirname(__file__), "..", "BENCH")
    if os.path.isdir(bench_dir):
        with open(os.path.join(bench_dir, f"gaz_mmap_{n_rows}.json"),
                  "w") as fh:
            json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
