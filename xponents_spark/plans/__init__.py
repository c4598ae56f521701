"""Plan helpers: skew salting, stable output ordering, resumable runs with
per-partition lineage + metrics manifests (BASELINE.json north_rule).
"""

from .salting import (salted_repartition, ordered_output,  # noqa: F401
                      spread_small_input)
from .checkpoints import run_resumable, read_manifests  # noqa: F401
from .bucketing import (write_bucketed, read_bucketed,  # noqa: F401
                        bucket_metadata, prepare_input)
