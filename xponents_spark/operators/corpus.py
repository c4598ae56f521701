"""Corpus management for training-data pipelines: deterministic splits,
mixture sampling, and epoch-weighted upsampling — pure-JVM projections.

The reference engine stops at per-document extraction; assembling its
output into a training corpus needs three more operations every
large-scale pipeline ships (the GPT-3 / Gopher / LLaMA data sections all
describe them):

* **hash_split** — train/validation/test assignment that is a PURE
  FUNCTION of (key, salt): stable across runs, machines, partitionings
  and re-shuffles, with no RNG state to checkpoint.  Changing ``salt``
  re-deals the whole corpus; keeping it pins every document forever
  (the property that makes eval sets trustworthy).
* **mixture_sample** — per-source sampling rates (the "Common Crawl at
  0.3, Wikipedia at 2.5 epochs" table): rates < 1 subsample
  deterministically, rates >= 1 emit floor(rate) full copies plus a
  deterministically-sampled fractional copy, as an epoch/copy column.
* **stratified split counts** fall out of the same bucket column.

Scale: all three are zero-shuffle, zero-Python narrow projections
(whole-stage codegen), so they compose into the same scan as the C4 /
Gopher gates.  The only data movement is whatever the caller does with
the result.

Portability: the bucket hash is ``int(md5(key||':'||salt)[:15 hex], 16)``
— 60 bits, expressible identically in Spark
(``conv(substr(md5(..),1,15),16,10)``) and DuckDB
(``('0x'||substr(md5(..),1,15))::BIGINT``), so the driver oracle replays
the exact assignment.  xxhash64 would be cheaper but is Spark-only; at
100 TB the md5 cost is still trivial next to the scan, and a caller who
wants xxhash64 can pass ``hash_expr``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET_BITS = 60
_BUCKET_SPACE = float(1 << _BUCKET_BITS)


def _unit_hash(key: str | Column, salt: str) -> Column:
    """Deterministic u in [0, 1): 60-bit md5 prefix of ``key:salt``."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
            / F.lit(_BUCKET_SPACE))


def _split_label(key: str | Column, weights: dict[str, float],
                 salt: str) -> Column:
    """The split label as a pure expression of the key (shared by
    hash_split and the zero-join leakage check)."""
    total = float(sum(weights.values()))
    u = _unit_hash(key, salt)
    expr, acc = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return F.lit(names[0]) if expr is None else expr.otherwise(names[-1])


def unit_hash_sql(key_expr: str, salt: str) -> str:
    """The DuckDB-identical SQL for :func:`_unit_hash` (oracle side)."""
    return (f"(('0x' || substr(md5({key_expr} || ':{salt}'), 1, 15))::BIGINT"
            f" / {_BUCKET_SPACE!r})")


def hash_split(df: DataFrame, weights: dict[str, float] | None = None,
               key_col: str = "doc_id", salt: str = "v1",
               out_col: str = "split") -> DataFrame:
    """Assign each row to a named split with the given weights,
    deterministically in (``key_col``, ``salt``).

    ``weights`` preserve insertion order; they are normalized, so
    ``{"train": 98, "val": 1, "test": 1}`` works.  One narrow projection —
    no shuffle, no sampling state; re-running over a re-partitioned or
    incrementally-grown corpus never reassigns an existing key (the
    leakage guarantee a persisted random split cannot give without
    carrying state).
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn(out_col, _split_label(key_col, weights, salt))


def mixture_sample(df: DataFrame, rates: dict[str, float],
                   source_col: str = "source", key_col: str = "doc_id",
                   salt: str = "mix-v1",
                   default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-source mixture sampling with epoch upsampling.

    Every row whose source has rate r emits ``floor(r)`` guaranteed
    copies plus one more iff ``u < frac(r)`` (u deterministic in
    (key, salt)), as an ``epoch`` column numbered 1..n.  r < 1 is plain
    subsampling; r = 2.5 is "2 full epochs + half the corpus a third
    time" — the standard mixture-table semantics.  Sources missing from
    ``rates`` get ``default_rate``.

    Plan: Project (rate lookup via a literal CASE — no join for the
    handful of corpus names) -> Filter -> Generate(explode) — still
    narrow, zero Exchange; expected output size = sum(rate_s * |s|).
    """
    u = _unit_hash(key_col, salt)
    rate = None
    for name, r in rates.items():
        cond = F.col(source_col) == name
        rate = (F.when(cond, float(r)) if rate is None
                else rate.when(cond, float(r)))
    rate = (F.lit(float(default_rate)) if rate is None
            else rate.otherwise(float(default_rate)))
    n = (F.floor(rate) + (u < rate - F.floor(rate)).cast("int")).cast("int")
    return (df.withColumn("_n_copies", n)
              .filter(F.col("_n_copies") >= 1)
              .withColumn("epoch",
                          F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
              .drop("_n_copies"))


def split_leakage_check(pairs: DataFrame,
                        weights: dict[str, float] | None = None,
                        salt: str = "v1", a_col: str = "doc_a",
                        b_col: str = "doc_b") -> DataFrame:
    """Cross-split contamination over near-duplicate pairs: every pair
    whose endpoints land in DIFFERENT splits (a near-copy of a test
    document inside train — the leak eval sets die of).

    Because :func:`hash_split` is a pure function of (key, salt), the
    split of each endpoint is recomputed INLINE — no join against the
    labeled corpus, no shuffle beyond whatever produced ``pairs``.  Feed
    it the pair output of minhash/simhash/embedding near-dup (or
    exact-dup groups exploded to pairs); an empty result is the
    clean-split certificate.  At 100 TB the cost is |pairs| hash
    evaluations — independent of corpus size.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return (pairs
            .withColumn("split_a", _split_label(F.col(a_col), weights, salt))
            .withColumn("split_b", _split_label(F.col(b_col), weights, salt))
            .filter(F.col("split_a") != F.col("split_b")))
