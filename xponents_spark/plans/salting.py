"""Skew handling + deterministic ordering.

A 10^6-turn conversation must not pin one task (SURVEY.md §4.3.5).  Because
extraction is per-turn independent, the safe salt is simply to spread rows by
``hash(conv_id, turn_idx)`` — no conversation state is needed until the
optional conversation-scope aggregation pass, which re-shuffles by conv_id
with AQE skew-join handling enabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Spread turns uniformly regardless of conversation skew.

    ``repartition(hash(conv_id, turn_idx))`` is a full-width round-robin-like
    exchange: long conversations fan out across all tasks.  Catalyst keeps
    the downstream mapInPandas pipelined with the exchange output.
    """
    cols = [F.col("conv_id"), F.col("turn_idx")]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def ordered_output(df: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx) global ordering for output/verify parity
    (the north rule's 'stable turn ordering').  A total sort is a range
    exchange — only apply at the final write/collect."""
    return df.orderBy("conv_id", "turn_idx")
