#!/usr/bin/env python
"""Host-ceiling control for the scaling protocol: run the extraction kernel
(extract_turn — the exact per-row work the Spark job does) in K independent
OS processes with NO Spark involved, at K=8 and K=32.  Each process loops
over the same fixed batch of sf0.1-style texts.

If aggregate throughput at 32 processes is ~the same fraction of 4x the
8-process figure as the Spark job achieves, then the single-host 8->32 droop
is the host's per-core ceiling under full load (memory bandwidth / interpreter
pressure / VM clock), not a property of the engine — separate cluster nodes
each bring their own memory and would not share it.

Usage: python tools/host_scaling_control.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TURNS_PER_PROC = int(os.environ.get("CONTROL_TURNS", "4000"))


def _texts() -> list[str]:
    import duckdb
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet') LIMIT 500"
    ).fetchall()
    return [r[0] for r in rows]


def worker(texts: list[str], n: int, ready_q, start_ev, done_q):
    from xponents_spark.pipeline import extract_turn
    feats = ("content", "coordinates", "dates", "patterns", "places",
             "countries", "taxons", "postal")
    # warm-up: compile patterns, build indices (Spark pays this once per
    # long-lived python worker; exclude it here the same way)
    for t in texts[:50]:
        extract_turn(t, feats)
    ready_q.put(os.getpid())
    start_ev.wait()
    t0 = time.time()
    done = 0
    i = 0
    while done < n:
        extract_turn(texts[i % len(texts)], feats)
        done += 1
        i += 1
    done_q.put((time.time() - t0, done))


def run(k: int, texts: list[str]) -> dict:
    ready_q = mp.Queue()
    done_q = mp.Queue()
    start_ev = mp.Event()
    procs = [mp.Process(target=worker,
                        args=(texts, TURNS_PER_PROC, ready_q, start_ev, done_q))
             for _ in range(k)]
    for p in procs:
        p.start()
    for _ in range(k):
        ready_q.get()
    t0 = time.time()
    start_ev.set()
    results = [done_q.get() for _ in range(k)]
    wall = time.time() - t0
    for p in procs:
        p.join()
    total = sum(r[1] for r in results)
    return {"procs": k, "wall_sec": round(wall, 2),
            "agg_turns_per_sec": round(total / wall, 1),
            "per_proc_tps": round(total / wall / k, 1)}


def main():
    mp.set_start_method("spawn")
    texts = _texts()
    # CONTROL_PAIR picks the process counts: "8,32" (default, the saturated
    # pair's ceiling) or "4,16" (the contracted pair's ceiling — 16
    # independent processes on this 32-core host measure what the host
    # itself charges a 4->16-core scale-up: shared memory bandwidth and
    # effective clocks, with zero engine code in the loop).
    lo, hi = (int(x) for x in
              os.environ.get("CONTROL_PAIR", "8,32").split(","))
    out = []
    for k in (lo, hi, lo, hi):   # interleave to de-correlate ambient noise
        r = run(k, texts)
        out.append(r)
        print(json.dumps(r))
    best_lo = max(r["agg_turns_per_sec"] for r in out if r["procs"] == lo)
    best_hi = max(r["agg_turns_per_sec"] for r in out if r["procs"] == hi)
    ratio = hi // lo
    print(json.dumps({f"host_efficiency_{lo}_to_{hi}":
                      round(best_hi / (ratio * best_lo), 3),
                      "host_efficiency_8_to_32":
                      round(best_hi / (ratio * best_lo), 3)}))


if __name__ == "__main__":
    main()
