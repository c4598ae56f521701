"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's extraction operators, a 100 TB corpus pipeline needs
dedup, similarity search, text analysis, and multimodal plumbing — all
implemented Spark-first: JVM-side expressions where possible, Arrow-batched
pandas UDFs where vector math is needed, never row-at-a-time Python UDFs.
"""

from .textstats import token_stats, quality_score, lang_id, fingerprint, gopher_quality_filter, gopher_quality_filter_single_pass  # noqa: F401
from .dedup import exact_dedup, prefix_dedup, minhash_signatures, minhash_near_dups, ngram_jaccard_pairs, simhash_near_dups, decontaminate  # noqa: F401
from .redact import redact_pii  # noqa: F401
from .corpus import hash_split, mixture_sample, split_leakage_check  # noqa: F401
from .similarity import cosine_topk_bruteforce, cosine_topk_lsh  # noqa: F401
