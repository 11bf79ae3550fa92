"""Registry/docs consistency gate (r10 verdict #7).

The driver verifies EXACTLY the first 50 registration-order entries of
``queries()`` — slot 51 would silently never run. The rotation rule
(adding a driver query REQUIRES retiring one) is enforced here
mechanically so the window can never drift, and the retired set is
pinned by name so COVERAGE.md's rotation log can be checked against the
registry instead of hand-counted (r10's log said "7 retired"; the
registry had 6).
"""

from __future__ import annotations

DRIVER_WINDOW = 50

# The local-parity-window log: every query rotated out of the driver
# window, plus queries registered directly into the local window.
# r12 (optimization round): the driver window is FROZEN to the exact
# r11-certified 50-query set — the external driver reads a disappeared
# declared query as a regression, so no rotation happens during the
# optimization rounds. audit_verdicts therefore lives in the local
# parity window (same oracle bar). Update THIS LIST (and COVERAGE.md)
# when rotating — the assert below re-derives the actual set from the
# registry.
# r12 additions (registered directly into the local window, never
# driver slots): lk_split_leakage (lexical cross-split audit),
# sp_cap_per_group (skew-safe per-group quota vs the naive one-window
# oracle), dd_cluster_representatives (keep-policy tail of the
# components family), st_file_drop_ingest (JSONL drop-dir drain:
# file-source exactly-once + parse + dead-letter + fold + MERGE).
RETIRED_NAMES = {
    "a9_percentiles",
    "audit_verdicts",
    "dd_cluster_representatives",
    "dd_ngram_jaccard",
    "lk_split_leakage",
    "p12_prefix_filter",
    "s2_discover_years",
    "s3_category_source",
    "sp_cap_per_group",
    "st_dedup_within_watermark",
    "st_file_drop_ingest",
    "w1_array_argmax",
}


def test_driver_window_is_exactly_50():
    import tmdb_sync_spark.all_queries  # noqa: F401

    from tmdb_sync_spark.registry import QUERIES

    assert len(QUERIES) == DRIVER_WINDOW, (
        f"driver window must be exactly {DRIVER_WINDOW} queries "
        f"(got {len(QUERIES)}); the driver only verifies the first 50 — "
        "rotate a query to RETIRED before adding a new one"
    )


def test_retired_set_matches_rotation_log():
    import tmdb_sync_spark.all_queries  # noqa: F401

    from tmdb_sync_spark.registry import RETIRED_QUERIES

    assert set(RETIRED_QUERIES) == RETIRED_NAMES, (
        "retired registry diverged from the rotation log — update "
        "RETIRED_NAMES here and the count in COVERAGE.md: "
        f"registry-only={set(RETIRED_QUERIES) - RETIRED_NAMES}, "
        f"log-only={RETIRED_NAMES - set(RETIRED_QUERIES)}"
    )


def test_every_driver_query_has_an_oracle_or_documented_exemption():
    """Rows-only checks are weaker; any query without an oracle must be
    a deliberate, named exemption (none currently)."""
    import tmdb_sync_spark.all_queries  # noqa: F401

    from tmdb_sync_spark.registry import ORACLES, QUERIES

    rows_only_exemptions: set[str] = set()
    missing = set(QUERIES) - set(ORACLES) - rows_only_exemptions
    assert missing == set(), f"driver queries without an oracle: {missing}"


def test_retired_queries_keep_their_oracles():
    import tmdb_sync_spark.all_queries  # noqa: F401

    from tmdb_sync_spark.registry import RETIRED_ORACLES, RETIRED_QUERIES

    missing = set(RETIRED_QUERIES) - set(RETIRED_ORACLES)
    assert missing == set(), f"retired queries lost their oracle: {missing}"
