"""As-of (point-in-time) join — the classic temporal-correctness operator.

Joins each left row to the LATEST right row at-or-before its timestamp per
key: events to the state that was in force when they happened, turns to
the model/config snapshot that produced them.  Training pipelines need it
to avoid time-travel leakage (joining features computed AFTER the event).

Spark has no built-in as-of join; the pandas route (`merge_asof` inside
``applyInPandas``) materializes each key group in python.  This
implementation is fully relational — the union trick:

    tag left rows 1 / right rows 0
    union -> ONE Exchange on the key -> sort (ts, tag)
    last(value, ignorenulls=True) over rows-unbounded-preceding
    keep tagged-left rows

One shuffle + one sort, no Python, no per-group materialization; skewed
keys ride AQE like any other window.  Right rows sort BEFORE left rows at
equal timestamps, so an exactly-simultaneous state change is visible to
the event (inclusive backward semantics, `merge_asof`'s default).

The DuckDB oracle replays it with the engine's native ``ASOF JOIN`` —
two independent implementations of the semantics, value-pinned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c: Column) -> Column:
    """Epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ cannot
    cast to BIGINT directly; the two-step cast interprets it in the
    session zone, consistently for every column in the same job)."""
    return c.cast("timestamp").cast("long")


def range_join(left: DataFrame, right: DataFrame, on: str | None = None,
               ts_col: str = "ts", start_col: str = "start",
               end_col: str = "end",
               bucket_seconds: int = 3600,
               max_buckets_per_interval: int | None = 100_000) -> DataFrame:
    """Point-in-interval join: pair every left row with every right
    interval containing its timestamp (``start <= ts < end``), optionally
    under an extra equi-key ``on``.

    Spark plans a naive ``l.ts >= r.start AND l.ts < r.end`` as
    BroadcastNestedLoopJoin — O(|left| x |right|) and a driver-memory
    bomb when neither side is small.  This implementation buckets time:
    each interval explodes to the ``bucket_seconds`` buckets it overlaps,
    each point computes its single bucket, and the join becomes a plain
    hash EQUI-join on (bucket [, key]) followed by the exact range
    filter.  A point's bucket matches exactly one exploded row per
    containing interval, so no dedup is needed.  Cost:
    O(|right| x interval_len/bucket) explode + one shuffle — pick
    ``bucket_seconds`` near the typical interval length (explode factor
    ~= 1-2; a pathological interval spanning 10^6 buckets should use a
    coarser bucket or the as-of form).

    Hostile-input guards: degenerate intervals (``end <= start``) are
    dropped BEFORE the explode — they can never match the exact filter,
    but Spark's sequence(stop < start) would otherwise generate a
    DESCENDING bucket array, so one epoch-0 sentinel row explodes into
    decades of buckets.  ``max_buckets_per_interval`` (default 100k) is
    a ZERO-COST runtime tripwire: an ``assert_true`` rides the sequence
    bounds (one comparison per right row, no extra scan or job), so an
    interval that would explode past the cap fails its task LOUDLY with
    the coarsen-or-asof advice instead of silently eating task
    memory/time.  Pass ``None`` to disable.  (The buckets-per-interval
    histogram, when wanted, is one zero-shuffle agg:
    ``right.select(((epoch(end)-1-epoch(start)) / bucket + 1).alias('nb'))
    .agg(max('nb'), avg('nb'))``.)
    """
    bucket = F.floor(_epoch(F.col(ts_col)) / bucket_seconds)
    start_b = F.floor(_epoch(F.col(start_col)) / bucket_seconds)
    # end is exclusive: an interval ending exactly on a bucket boundary
    # does not reach into that bucket
    end_b = F.floor((_epoch(F.col(end_col)) - 1) / bucket_seconds)
    right = right.filter(_epoch(F.col(end_col)) > _epoch(F.col(start_col)))
    if max_buckets_per_interval is not None:
        nb = end_b - start_b + 1
        guard = F.assert_true(
            nb <= max_buckets_per_interval,
            F.concat(F.lit("range_join: an interval spans "),
                     nb.cast("string"),
                     F.lit(f" buckets of {bucket_seconds}s (cap "
                           f"{max_buckets_per_interval}) — coarsen "
                           f"bucket_seconds, use asof_join, or "
                           f"raise/disable max_buckets_per_interval")))
        # assert_true is NULL on success: fold it into the start bound so
        # the guard cannot be pruned away as an unused column
        start_b = start_b + F.coalesce(guard.cast("long"), F.lit(0))
    r_buckets = F.sequence(start_b, end_b)
    keys = ["_bucket"] + ([on] if on else [])
    lt = left.withColumn("_bucket", bucket)
    rt = right.withColumn("_bucket", F.explode(r_buckets))
    return (lt.join(rt, keys)
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) < F.col(end_col)))
            .drop("_bucket"))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              ts_col: str = "ts", right_ts_col: str | None = None,
              tolerance_seconds: int | None = None,
              matched_ts_col: str = "matched_ts") -> DataFrame:
    """Backward inclusive as-of join: every ``left`` row picks up the value
    columns of the latest ``right`` row with ``right.ts <= left.ts`` on the
    same key (nulls when no prior right row exists — left-outer shape).

    ``right_ts_col`` names the right table's timestamp when it differs;
    ``matched_ts_col`` receives the matched right timestamp (null = no
    match).  ``tolerance_seconds`` voids matches older than the window
    (values null out, like ``merge_asof(tolerance=...)``).

    Value columns must not collide with left column names — rename before
    joining (raises to avoid silent shadowing).
    """
    rts = right_ts_col or ts_col
    value_cols = [c for c in right.columns if c not in (on, rts)]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join value columns collide with left "
                         f"columns: {sorted(clash)} — rename them first")
    l_rest = [c for c in left.columns if c not in (on, ts_col)]
    r_types = {c: right.schema[c].dataType for c in value_cols}
    l_types = {c: left.schema[c].dataType for c in l_rest}
    ts_type = left.schema[ts_col].dataType

    lt = left.select(
        F.col(on), F.col(ts_col), F.lit(1).alias("_is_left"),
        *[F.col(c) for c in l_rest],
        *[F.lit(None).cast(r_types[c]).alias(c) for c in value_cols],
        F.lit(None).cast(ts_type).alias("_r_ts"))
    rt = right.select(
        F.col(on), F.col(rts).alias(ts_col), F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in l_rest],
        *[F.col(c) for c in value_cols],
        F.col(rts).alias("_r_ts"))

    w = (Window.partitionBy(on).orderBy(ts_col, "_is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = [F.last(c, ignorenulls=True).over(w).alias(c)
              for c in value_cols + ["_r_ts"]]
    out = (lt.unionByName(rt)
           .select(on, ts_col, "_is_left", *l_rest, *filled)
           .filter(F.col("_is_left") == 1)
           .drop("_is_left")
           .withColumnRenamed("_r_ts", matched_ts_col))
    if tolerance_seconds is not None:
        stale = (_epoch(F.col(ts_col))
                 - _epoch(F.col(matched_ts_col))) > tolerance_seconds
        out = out.select(
            on, ts_col, *l_rest,
            *[F.when(stale, None).otherwise(F.col(c)).alias(c)
              for c in value_cols],
            F.when(stale, None).otherwise(F.col(matched_ts_col))
             .alias(matched_ts_col))
    return out
