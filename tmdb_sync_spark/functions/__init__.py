"""Large-scale training-data-pipeline operators (SURVEY.md §7 Phase 5).

Beyond reference parity: deduplication, similarity search, text analysis,
and multimodal-column plumbing over the ``documents`` / ``embeddings``
tables. Importing this package populates the query registry.
"""

from tmdb_sync_spark.functions import (  # noqa: F401
    chunking,
    dedup,
    dedup_index,
    diff,
    export,
    multimodal,
    normalize,
    pipeline,
    sampling,
    similarity,
    stats,
    text,
    vector_index,
    winnow,
    winnow_index,
)

# audit imports last — it composes the lens modules above, and keeping
# it out of the alphabetical block preserves the driver-window
# registration order exactly as it was before the module registered a
# query (audit_verdicts lands in the retired/local-parity window).
from tmdb_sync_spark.functions import audit  # noqa: E402,F401

# leakage registers only into the retired/local-parity window
# (lk_split_leakage), so its import position cannot perturb the
# driver's 50-slot registration order either.
from tmdb_sync_spark.functions import leakage  # noqa: E402,F401
