#!/usr/bin/env python
"""Round-7 per-query isolation bench (guide §1.4): times any subset of the
benched queries with the SAME methodology as bench.py's bench_queries (noop
sink, one warm run, best-of-3) without paying for the headline pipeline.
bench.py itself is frozen for measurement; this harness exists so each
optimization's before/after can be measured in minutes.

Usage: python tools/r07_query_bench.py [query ...]     (default: all picks)
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

PICKS = ["xcoord_extract", "xtemporal_extract", "place_extract",
         "main_content", "match_label_histogram", "exact_dedup",
         "minhash_near_dups", "simhash_near_dups", "ann_cosine_topk",
         "token_stats", "lang_id", "quality_score", "fingerprint",
         "repetition_stats", "duplicated_spans",
         "event_hourly_windows", "characterize",
         "decontaminate", "redact_pii", "corpus_split_mix",
         "container_text_recovery", "sessionize", "asof_join",
         "range_join", "gopher_filter_full", "ngram_jaccard_pairs",
         "near_dup_groups", "remove_duplicated_spans",
         "embedding_near_dups", "near_dups_all",
         "image_text_recovery", "pdf_text_recovery",
         "office_text_recovery", "semantic_dedup", "c4_quality_filter"]


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    only = sys.argv[1:]
    picks = only or PICKS
    from xponents_spark.session import get_spark
    import __spark_entry__ as entry
    spark = get_spark(app="r07-query-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    from xponents_spark.operators import exact_dedup as _exact_op
    from xponents_spark.operators import quality_score as _quality_op
    from xponents_spark.operators import token_stats as _token_op
    from xponents_spark.operators import fingerprint as _fingerprint_op
    from xponents_spark.pipeline import characterize as _characterize_op
    from xponents_spark.operators import lang_id as _lang_op
    from xponents_spark.operators.textstats import c4_quality_filter
    from xponents_spark.operators.similarity import (semantic_dedup,
                                                     train_ivf_centroids)

    def raw_docs():
        return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    extra = {"minhash_near_dups": entry.q_minhash_dedup,
             "simhash_near_dups": entry.q_simhash_dedup,
             "exact_dedup": lambda s, sf: _exact_op(raw_docs()),
             "token_stats": lambda s, sf: _token_op(raw_docs()),
             "quality_score": lambda s, sf: _quality_op(raw_docs()),
             "fingerprint": lambda s, sf: _fingerprint_op(raw_docs()),
             "characterize": lambda s, sf: _characterize_op(raw_docs()),
             "lang_id": lambda s, sf: _lang_op(raw_docs()),
             "c4_quality_filter": lambda s, sf: c4_quality_filter(raw_docs()),
             "container_text_recovery": lambda s, sf:
                 entry.q_container_roundtrip(s, sf, sample_mod=10)}

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cents = None

    out = {}
    for name in picks:
        spark.sparkContext.setJobDescription(f"r07-bench:{name}")
        if name == "semantic_dedup":
            if cents is None:
                cents = train_ivf_centroids(emb, n_centroids=16)
            run = lambda: (semantic_dedup(emb, threshold=0.95,      # noqa: E731
                                          n_centroids=16, centroids=cents)
                           .write.mode("overwrite").format("noop").save())
        else:
            fn = extra.get(name) or qs[name]
            run = lambda: (fn(spark, SF_DIR).write                  # noqa: E731
                           .mode("overwrite").format("noop").save())
        run()   # warm
        out[name] = round(min(timed(run), timed(run), timed(run)), 3)
        print(f"{name:28s} {out[name]:8.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
