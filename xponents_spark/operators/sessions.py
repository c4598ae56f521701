"""Inactivity-gap sessionization of turn/event streams.

Multi-turn agent transcripts (the north-rule input) arrive as one long
``conv_id`` stream; training pipelines re-segment them into EPISODES at
inactivity gaps ("the user came back next day" is a new task).  The same
operator sessionizes any keyed event stream (the classic web-analytics
30-minute rule).

Spark shape: two window functions over ``(key) ORDER BY (ts, tiebreak)``
— ``lag`` marks gap starts, a running ``sum`` numbers the sessions.  ONE
Exchange on the key (none at all when the input is already bucketed by
``conv_id``, the north-rule Iceberg layout — Catalyst sees the child
partitioning satisfies the window's distribution).  No Python, no state
store; at 100 TB this is strictly cheaper than the conversation-scope
two-pass because it is a single window stage.

The streaming twin is ``streaming.session_spans`` (Spark's native
``session_window``, watermark-evicted state); this is the batch/backfill
path with per-ROW session labels and an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(df: DataFrame, ts_col: str):
    """ts column -> epoch seconds, tolerating TIMESTAMP_NTZ inputs.

    Spark 4 forbids the direct NTZ->long cast; route NTZ through a
    session-timezone cast first (the engine pins the session to UTC in
    session.py, so the instant is deterministic).  Plain TIMESTAMP and
    numeric columns keep the original single-cast expression.
    """
    c = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        c = c.cast("timestamp")
    return c.cast("long")


def sessionize(df: DataFrame, key_col: str = "conv_id",
               ts_col: str = "ts", gap_seconds: int = 1800,
               tiebreak_col: str = "turn_idx",
               out_col: str = "session_id") -> DataFrame:
    """Assign each row a session: a new one starts at the first row of a
    key and whenever the gap since the previous row exceeds
    ``gap_seconds``.  Adds ``session_seq`` (1-based per key) and
    ``out_col`` = ``key#seq`` (globally unique, stable).

    ``tiebreak_col`` makes ordering total when timestamps collide —
    without it, equal-ts rows make the lag/sum pair nondeterministic
    across runs (the session boundary could land on either row).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    epoch = _epoch_seconds(df, ts_col)
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return (df
            .withColumn("session_seq",
                        F.sum(new_session).over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .withColumn(out_col,
                        F.concat_ws("#", F.col(key_col),
                                    F.col("session_seq").cast("string"))))


def session_stats(df: DataFrame, key_col: str = "conv_id",
                  ts_col: str = "ts",
                  session_col: str = "session_id") -> DataFrame:
    """Per-session rollup: turn count + wall-clock span — the episode
    length distribution every transcript-curation pipeline reports.
    One partial-agg shuffle on the session id."""
    epoch = _epoch_seconds(df, ts_col)
    return (df.groupBy(key_col, session_col)
              .agg(F.count("*").alias("n_turns"),
                   (F.max(epoch) - F.min(epoch)).alias("span_sec")))
