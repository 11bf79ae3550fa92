"""Corpus version diff — "what changed between train_v1 and train_v2",
answered from the data instead of trusted release notes.

Every corpus re-release (new drops ingested, a gate threshold moved, a
dedup pass re-run) ships with a claim about what changed; the diff
operator makes the claim checkable: full-outer join the two versions
on the document key, compare content FINGERPRINTS (md5 — never raw
text through the shuffle), and classify every key as ``added`` /
``removed`` / ``changed`` / ``unchanged``. The detail frame keeps the
dims a release note slices by; the summary rolls it up per dim.

Scale shape: ONE full-outer shuffle join on the key — a diff is
irreducibly a join, so the cost is declared, not hidden. Both sides
project to (key, dims, md5) BEFORE the exchange: the shuffle moves
~50 bytes/doc, never document bodies. On bucketed corpus tables the
join co-locates and the exchange disappears entirely; text is read
once per side and only for hashing (column pruning serves just
``content_col`` + dims to the scan).

Cross-engine: md5 fingerprints and single-pass conditional counts —
the DuckDB twin in tests/test_diff.py is byte-exact (same rules as the
registry's oracles; NULL content hashes as NULL and two NULLs compare
equal via the null-safe comparison, so a doc whose text is NULL in
both versions is ``unchanged``, not ``changed``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def diff_corpora(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str = "doc_id",
    content_col: str = "text",
    dims: Sequence[str] = ("source",),
    check_keys: bool = True,
) -> DataFrame:
    """Per-document diff detail: ``(key, status, <dims>)``.

    ``status``: ``added`` (key only in ``new``), ``removed`` (only in
    ``old``), ``changed`` (both, different content fingerprint),
    ``unchanged`` (both, same — NULL content equal to NULL content).
    Dims come from whichever side has the row; for ``changed`` the NEW
    side wins (the release's current slicing).

    ``check_keys`` (r9 hostile pass): a diff is per-DOCUMENT, so each
    version must identify documents — a duplicated or NULL key fans the
    full-outer join out silently (every old×new pairing of that key
    becomes a row) and the summary's counts stop being document counts.
    Enforced IN the plan with the MERGE's ``assert_true``-filter idiom
    (plans/merge.py): the first violating row fails the job with the
    side named. Structurally free: the per-side count window partitions
    by the key the join shuffles on, so no extra exchange is added.
    Opt out only for a corpus some OTHER guard already proved unique
    (e.g. freshly read from a MERGE-maintained table, whose writer
    enforces key uniqueness).
    """
    for side, df in (("old", old), ("new", new)):
        for c in (key, content_col, *dims):
            if c not in df.columns:
                raise ValueError(f"diff_corpora: {side} has no {c!r} column")

    def fp(df: DataFrame, tag: str) -> DataFrame:
        out = df.select(
            F.col(key),
            F.md5(F.col(content_col).cast("binary")).alias(f"_h_{tag}"),
            *[F.col(d).alias(f"_{d}_{tag}") for d in dims],
            F.lit(True).alias(f"_in_{tag}"),
        )
        if check_keys:
            n = F.count(F.lit(1)).over(Window.partitionBy(key))
            guard = F.assert_true(
                F.col(key).isNotNull() & (F.col("_n") == 1),
                F.lit(
                    f"diff_corpora: {tag} version has a duplicate or "
                    f"NULL {key!r} — a diff is per-document; "
                    "deduplicate (or filter NULL keys) first"
                ),
            )
            out = (
                out.withColumn("_n", n)
                .where(guard.isNull())
                .drop("_n")
            )
        return out

    joined = fp(old, "old").join(fp(new, "new"), key, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        # null-safe: NULL text in both versions is the SAME (absent)
        # content, not a change
        .when(F.col("_h_old").eqNullSafe(F.col("_h_new")), "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        key,
        status.alias("status"),
        *[
            F.coalesce(F.col(f"_{d}_new"), F.col(f"_{d}_old")).alias(d)
            for d in dims
        ],
    )


def diff_summary(detail: DataFrame, dims: Sequence[str] = ("source",)) -> DataFrame:
    """Roll the detail up to one row per dims group:
    ``(<dims>, n_added, n_removed, n_changed, n_unchanged, n_old,
    n_new)`` — ``n_old``/``n_new`` are derivable (and derived here) so
    a release note's "the corpus grew by X" is checkable against the
    same frame that explains WHY."""
    counts = [
        F.count_if(F.col("status") == s).alias(f"n_{s}") for s in STATUSES
    ]
    return detail.groupBy(*dims).agg(
        *counts,
        (
            F.count_if(F.col("status") != "added")
        ).alias("n_old"),
        (
            F.count_if(F.col("status") != "removed")
        ).alias("n_new"),
    )
