#!/usr/bin/env python
"""Round-7 follow-up: A/B + exact-equivalence harness for the
prefix-filtered (AllPairs) winnow_near_dups vs the naive fp-index join.

Equivalence: both paths over the real gate corpus (_docs + planted twins,
sf dir from env) and a randomized synthetic corpus; results compared as
exact sorted row sets (doc_a, doc_b, repr(fp_jaccard)).

Timing: same protocol as tools/r07_query_bench.py (noop sink, one warm
run, best-of-3) for near_dups_all and winnow-only on both paths.

Usage: python tools/r07_winnow_ab.py [--equiv-only|--time-only]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py)
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def rows_of(df):
    return sorted((r["doc_a"], r["doc_b"], repr(r["fp_jaccard"]))
                  for r in df.collect())


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    from xponents_spark.session import get_spark
    from xponents_spark.operators.dedup import winnow_near_dups
    import __spark_entry__ as entry
    spark = get_spark(app="r07-winnow-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if mode != "--time-only":
        # 1. real gate corpus + planted twins, both operating thresholds
        docs = entry._docs_with_planted_twins(spark, SF_DIR)
        for thr in (0.6, 0.999):
            a = rows_of(winnow_near_dups(docs, threshold=thr,
                                         prefix_filter=False))
            b = rows_of(winnow_near_dups(docs, threshold=thr,
                                         prefix_filter=True))
            assert a == b, (
                f"thr={thr}: naive {len(a)} rows != prefix {len(b)} rows; "
                f"only-naive={set(a) - set(b)} only-prefix={set(b) - set(a)}")
            print(f"equiv corpus thr={thr}: OK ({len(a)} pairs)")

        # 2. randomized synthetic corpus: shared templates + mutations so
        # jaccard values land on BOTH sides of the threshold, plus empty/
        # short/whitespace edge docs
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(300)]
        rows = []
        did = 0
        for g in range(40):
            base = [rng.choice(vocab) for _ in range(rng.randint(5, 120))]
            for _ in range(rng.randint(1, 4)):
                mut = list(base)
                for _ in range(rng.randint(0, max(1, len(mut) // 3))):
                    mut[rng.randrange(len(mut))] = rng.choice(vocab)
                rows.append((did, " ".join(mut))); did += 1
        rows += [(did, ""), (did + 1, ""), (did + 2, "ab"), (did + 3, "ab"),
                 (did + 4, "   "), (did + 5, "\t\n")]
        sdf = spark.createDataFrame(rows, "doc_id long, text string")
        for thr in (0.3, 0.6, 0.95):
            a = rows_of(winnow_near_dups(sdf, threshold=thr,
                                         prefix_filter=False))
            b = rows_of(winnow_near_dups(sdf, threshold=thr,
                                         prefix_filter=True))
            assert a == b, (
                f"synth thr={thr}: {len(a)} != {len(b)}; "
                f"only-naive={set(a) - set(b)} only-prefix={set(b) - set(a)}")
            print(f"equiv synth  thr={thr}: OK ({len(a)} pairs)")

    if mode != "--equiv-only":
        def time3(label, mk):
            noop(mk())  # warm
            best = min(_timed(mk) for _ in range(3))
            print(f"{label}: {best:.3f}s")
            return best

        def _timed(mk):
            t0 = time.time(); noop(mk()); return time.time() - t0

        docs = entry._docs_with_planted_twins(spark, SF_DIR)
        time3("winnow-only naive  ",
              lambda: winnow_near_dups(docs, threshold=0.6,
                                       prefix_filter=False))
        time3("winnow-only prefix ",
              lambda: winnow_near_dups(docs, threshold=0.6,
                                       prefix_filter=True))
        qs = entry.queries()
        time3("near_dups_all (current code)",
              lambda: qs["near_dups_all"](spark, SF_DIR))


if __name__ == "__main__":
    main()
