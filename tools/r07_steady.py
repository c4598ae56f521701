#!/usr/bin/env python
"""Steady-state per-query probe (r7): N reps per query in one session,
prints every rep + min.  Complements r07_query_bench (which replicates the
frozen bench.py warm+best-of-3 protocol) when diagnosing warm-decay.

Usage: python tools/r07_steady.py <reps> [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    reps = int(sys.argv[1])
    picks = sys.argv[2:]
    from xponents_spark.session import get_spark
    import __spark_entry__ as entry
    spark = get_spark(app="r07-steady", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    extra = {"minhash_near_dups": entry.q_minhash_dedup,
             "simhash_near_dups": entry.q_simhash_dedup,
             "container_text_recovery": lambda s, sf:
                 entry.q_container_roundtrip(s, sf, sample_mod=10)}
    out = {}
    for name in picks:
        fn = extra.get(name) or qs[name]
        df = fn(spark, SF_DIR)
        times = []
        for _ in range(reps):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        out[name] = min(times)
        sys.stdout.write(f"{name:28s} {times} min={min(times)}\n")
        sys.stdout.flush()
    sys.stdout.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
