#!/usr/bin/env python
"""Evidence probe: PhraseIndex (the broadcast gazetteer tagger) scan cost
is independent of dictionary size, and per-name memory bounds the broadcast
budget at real scale (reference basis: 25M names in a ~3.0 GB Solr FST,
solr/README.md:164-166).

Synthesizes deterministic fake gazetteers of growing size, builds the
token-keyed phrase index, and measures build memory + scan throughput over
the sf0.1 bench turn mix.  Expected shape (measured on this container):

    names=   1000: ~300 B/name   scan ~28k texts/s
    names=  30000: ~134 B/name   scan ~28k texts/s
    names= 300000: ~115 B/name   scan ~27k texts/s

i.e. scan throughput is flat (hash lookups keyed by first token — cost
follows the TEXT, not the dictionary) and memory converges to ~115 B/name:
25M names ≈ 2.9 GB/executor, the same class as the reference's FST, with
first-token sharding across executor groups as the fallback (SCALE.md).
"""

import random
import sys
import time
import tracemalloc

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from xponents_spark.gazetteer.matcher import PhraseIndex  # noqa: E402
from xponents_spark.session import get_spark  # noqa: E402
from xponents_spark.sources import synthesize_transcripts  # noqa: E402

VOCAB = ["ker", "vil", "ton", "berg", "stad", "pur", "abad", "field", "ham",
         "chester", "ovo", "ina", "grad", "mont", "lake", "port", "san",
         "nova", "alta", "bay"]


def fake_name(i: int) -> str:
    r = random.Random(i)
    return " ".join("".join(r.choice(VOCAB) for _ in range(2)).capitalize()
                    for _ in range(r.randint(1, 3)))


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    texts = [r["text"] for r in
             synthesize_transcripts(spark, "/root/testdata/sf0.1",
                                    turns_per_doc=20).limit(2000).collect()]
    spark.stop()

    for n_names in (1000, 30000, 300000):
        entries = [(fake_name(i), "P%07d" % i) for i in range(n_names)]
        tracemalloc.start()
        idx = PhraseIndex(entries)
        cur, _peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        for t in texts[:200]:
            idx.scan(t)
        t0 = time.time()
        for t in texts:
            idx.scan(t)
        dt = time.time() - t0
        print(f"names={n_names:>7}: build_mem={cur / 1e6:.1f}MB "
              f"({cur / max(n_names, 1):.0f} B/name)  "
              f"scan={len(texts) / dt:.0f} texts/s")


if __name__ == "__main__":
    main()
