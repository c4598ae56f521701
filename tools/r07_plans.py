#!/usr/bin/env python
"""Round-7 plan snapshots: dump .explain('formatted') for every benched
query into plans/r07/<query>_<suffix>.txt (before/after evidence for
OPTIMIZATION_r07.md).

Usage: python tools/r07_plans.py <suffix> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(__file__), "..", "plans", "r07")

# the benched query set (bench.py picks + the two extra series) — these are
# the rows PERF_r07 compares, so they carry the plan evidence
PICKS = ["xcoord_extract", "xtemporal_extract", "place_extract",
         "main_content", "match_label_histogram",
         "minhash_near_dups", "simhash_near_dups", "ann_cosine_topk",
         "repetition_stats", "duplicated_spans",
         "event_hourly_windows", "decontaminate", "redact_pii",
         "corpus_split_mix", "container_text_recovery", "sessionize",
         "asof_join", "range_join", "gopher_filter_full",
         "ngram_jaccard_pairs", "near_dup_groups",
         "remove_duplicated_spans", "embedding_near_dups", "near_dups_all",
         "image_text_recovery", "pdf_text_recovery",
         "office_text_recovery"]


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    from xponents_spark.session import get_spark
    import __spark_entry__ as entry
    spark = get_spark(app=f"plans-r07-{suffix}", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    qs = entry.queries()
    extra = {"minhash_near_dups": entry.q_minhash_dedup,
             "simhash_near_dups": entry.q_simhash_dedup}
    for name in PICKS:
        if only and name not in only:
            continue
        fn = extra.get(name) or qs[name]
        try:
            plan = formatted(fn(spark, SF))
        except Exception as e:          # noqa: BLE001 - snapshot tool
            plan = f"PLAN ERROR: {type(e).__name__}: {e}\n"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "->", f"{name}_{suffix}.txt")

    # semantic_dedup is benched outside queries()
    if not only or "semantic_dedup" in only:
        from xponents_spark.operators.similarity import (semantic_dedup,
                                                         train_ivf_centroids)
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        cents = train_ivf_centroids(emb, n_centroids=16)
        plan = formatted(semantic_dedup(emb, threshold=0.95, n_centroids=16,
                                        centroids=cents))
        with open(os.path.join(OUT, f"semantic_dedup_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("semantic_dedup ->", f"semantic_dedup_{suffix}.txt")


if __name__ == "__main__":
    main()
