"""Sources: transcript readers and the deterministic synthesizer.

The engine's runtime input is a transcripts table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (BASELINE.json input_hint).  For tests/benchmarks the table
is synthesized deterministically from the driver's ``documents`` parquet by
appending fixed entity payloads chosen by ``doc_id % N`` — a construction
simple enough to express identically in Spark and in the DuckDB oracle SQL
(see :mod:`xponents_spark.sources.payloads`).
"""

from .transcripts import (  # noqa: F401
    synthesize_transcripts,
    transcripts_oracle_cte,
    read_transcripts,
)
