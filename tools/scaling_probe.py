#!/usr/bin/env python
"""Scaling-protocol probe: run the headline extraction job at several
masters (local[8], local[32], local-cluster[4,8,…]) on IDENTICAL input and
report wall time, throughput, per-stage Spark metrics (executorRunTime vs
executorCpuTime vs GC) and host /proc/stat deltas (user/sys/idle/steal).

The point: decide whether the 8->32 droop is (a) host-level (steal/clock),
(b) JVM-level (GC, scheduler, Arrow IPC in one JVM), or (c) Python-worker
level — and whether separate executor JVMs (local-cluster) restore >=0.8.

Usage: python tools/scaling_probe.py [masters...]   default: local[8] local[32]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import shutil
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TURNS = int(os.environ.get("BENCH_TURNS", "200000"))


def proc_stat():
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    # user nice system idle iowait irq softirq steal
    return [int(x) for x in f[1:9]]


def stage_metrics(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    agg = {"executorRunTime": 0, "executorCpuTime": 0, "jvmGcTime": 0,
           "executorDeserializeTime": 0, "resultSerializationTime": 0,
           "schedulerDelay": 0, "numTasks": 0}
    for s in stages:
        for k in list(agg):
            if k in s:
                agg[k] += s[k]
        agg["numTasks"] += s.get("numCompleteTasks", 0)
    agg["executorCpuTime"] //= 1_000_000  # ns -> ms
    return agg


def run_once(master: str, cores: int):
    from xponents_spark.session import get_spark
    from xponents_spark.pipeline import extract
    from xponents_spark.plans import salted_repartition
    from xponents_spark.sources import synthesize_transcripts
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active:
        active.stop()
        SparkSession.builder._options = {}
    s = get_spark(app=f"probe-{master}", master=master, shuffle_partitions=cores)
    s.sparkContext.setLogLevel("ERROR")

    n_docs = s.read.parquet(f"{SF_DIR}/documents.parquet").count()
    tpd = max(1, TURNS // n_docs)
    t = synthesize_transcripts(s, SF_DIR, turns_per_doc=tpd)
    # PROBE_PARTITIONS: absolute partition count — the strong-scaling
    # protocol fixes the TASK SIZE across cluster sizes (identical tasks,
    # 4N just runs more of them concurrently), so per-task overhead
    # amortizes identically on both sides; PROBE_PART_FACTOR scales with
    # cores instead (the round-3 behavior)
    n_parts = int(os.environ["PROBE_PARTITIONS"]) \
        if "PROBE_PARTITIONS" in os.environ \
        else cores * int(os.environ.get("PROBE_PART_FACTOR", "2"))
    t = salted_repartition(t, n_parts).cache()
    n = t.count()
    # v2 file-output committer: task commit moves files directly, job
    # commit is O(1) — the v1 driver-side rename pass is serial work that
    # an Amdahl analysis showed charging the 4N side ~3% end-to-end.
    # Safe here: overwrite-idempotent outputs, resumability comes from
    # the manifest layer (plans/checkpoints.py), not commit atomicity.
    s.sparkContext._jsc.hadoopConfiguration().set(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
    out_dir = tempfile.mkdtemp(prefix="probe_out_", dir="/dev/shm")
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "main_text", "matches"]
    sink = os.environ.get("PROBE_SINK", "parquet")

    def job(use_sink=None):
        out = (extract(t).select(*cols)
               .sortWithinPartitions("conv_id", "turn_idx"))
        if (use_sink or sink) == "noop":
            out.write.mode("overwrite").format("noop").save()
        else:
            out.write.mode("overwrite").parquet(out_dir)

    timed_runs = int(os.environ.get("PROBE_TIMED_RUNS", "1"))
    wall_noop = None
    try:
        job()  # warm-up (forks, JIT, pattern compile)
        job()
        # best-of-K timed: a single 15-50s window on this shared host
        # carries 10-30% ambient jitter (BENCH_r02's 2x swings); the best
        # of K back-to-back runs is the engine's floor, and BOTH sides of
        # a pair get the same treatment.  Host /proc/stat + stage metrics
        # cover the best run's window.
        wall = float("inf")
        m1 = m0 = p1 = p0 = None
        for _ in range(max(timed_runs, 1)):
            mm0 = stage_metrics(s)
            pp0 = proc_stat()
            t0 = time.time()
            job()
            w = time.time() - t0
            pp1 = proc_stat()
            mm1 = stage_metrics(s)
            if w < wall:
                wall, m0, p0, m1, p1 = w, mm0, pp0, mm1, pp1
        if sink == "both":
            # compute-only counterpart in the SAME warm JVM/window: the
            # parquet sink on a single host funnels all executors through
            # one tmpfs/memory bus (a cluster's distributed sink scales
            # with executors) — the noop number isolates the engine
            job("noop")
            wall_noop = float("inf")
            for _ in range(max(timed_runs, 1)):
                t0 = time.time()
                job("noop")
                wall_noop = min(wall_noop, time.time() - t0)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    dm = {k: m1[k] - m0[k] for k in m0}
    dp = [b - a for a, b in zip(p0, p1)]
    total_ticks = sum(dp)
    labels = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    host = {k: round(v / total_ticks, 3) for k, v in zip(labels, dp)}
    res = {
        "master": master,
        "turns": n,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n / wall, 1),
        **({"turns_per_sec_noop": round(n / wall_noop, 1)}
           if wall_noop else {}),
        "stage_delta": dm,
        # run-time not spent on-CPU = waiting (scheduler, python worker,
        # Arrow IPC block, GC pauses are counted separately)
        "cpu_over_run": round(dm["executorCpuTime"] / dm["executorRunTime"], 3)
        if dm["executorRunTime"] else None,
        "host_cpu_shares": host,
    }
    s.stop()
    from pyspark.sql import SparkSession as S2
    S2.builder._options = {}
    return res


def main():
    masters = sys.argv[1:] or ["local[8]", "local[32]"]
    out = []
    for m in masters:
        if m.startswith("local-cluster"):
            cores = int(m.split("[")[1].split(",")[0]) * int(m.split(",")[1])
        else:
            cores = int(m.split("[")[1].rstrip("]"))
        out.append(run_once(m, cores))
        print(json.dumps(out[-1]))
    if len(out) >= 2:
        a, b = out[0], out[1]
        ratio = b["turns_per_sec"] / a["turns_per_sec"]
        print(json.dumps({"speedup": round(ratio, 3),
                          "efficiency_vs_4x": round(ratio / 4, 3)}))


if __name__ == "__main__":
    main()
