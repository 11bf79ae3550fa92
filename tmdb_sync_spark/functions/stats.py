"""Sketch-based corpus profiling — approximate distincts, quantiles and
per-slice rollups in ONE pass, the "know your corpus" report every
100 TB pipeline runs before and after each curation stage.

Exact profiling at corpus scale is the wrong tool: COUNT(DISTINCT)
shuffles every key, exact percentiles sort every row. This module's
report is built ONLY from mergeable sketches and algebraic aggregates —
HyperLogLog++ for distincts, Greenwald-Khanna (``percentile_approx``)
for quantiles, sum/count/max for mass — so the whole report is one scan
with map-side partial aggregation: each task folds its rows into
fixed-size sketch state, and the shuffle moves sketches (KB per group),
never rows. That is the property that makes the report O(groups) at any
corpus size, and it is exactly what Spark's built-in aggregate pipeline
gives for free when the plan is declared with these functions.

Error contracts (both are published bounds, tested against exact
answers in tests/test_stats.py):

- ``approx_count_distinct(col, rsd)``: HLL++ relative standard
  deviation ``rsd`` (default here 2%); error is RELATIVE, so a 10^9-key
  slice is as well-estimated as a 10^3-key one.
- ``percentile_approx(col, q, accuracy)``: rank error ≤ n/accuracy —
  the returned value's rank is within ``n/accuracy`` positions of the
  true quantile's rank (an actual corpus value, not an interpolation).

Multi-granularity: the report is grouped by ``ROLLUP(dims)`` (or CUBE),
so every level — per-(source, lang), per-source, corpus total — comes
out of the same single pass; sketches merge across levels inside the
aggregate, which is the entire point of sketch-shaped state (totals are
NOT sums of leaf approximations — each level is its own merged sketch
with its own bound). Cost declaration: Catalyst implements rollup/cube
via ``Expand`` — each input row is replicated once per grouping level
(d+1 for a d-dim rollup) BEFORE the partial aggregate. That is a
map-side CPU multiplier, not a shuffle multiplier (the exchange still
moves only sketch state), and for the 2-3 dims a corpus report slices
by it is far cheaper than running d+1 separate jobs' scans.

``grouping_id`` disambiguates a genuine NULL dim value (a document with
lang=NULL) from the rolled-up "all" level — consumers filter on it, not
on dim NULLs (the classic rollup-reading bug, pinned in the tests).

Beyond-registry (the 50-entry driver window is full); tested against
exact answers computed by Spark itself plus a DuckDB cross-check of the
exact columns, since sketches have no cross-engine value parity.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_QUANTILES = (0.5, 0.9, 0.99)


def corpus_report(
    df: DataFrame,
    dims: Sequence[str] = ("source", "lang"),
    *,
    key: str = "doc_id",
    size_col: str = "n_chars",
    quantiles: Sequence[float] = DEFAULT_QUANTILES,
    rsd: float = 0.02,
    accuracy: int = 10_000,
    cube: bool = False,
) -> DataFrame:
    """Per-slice corpus profile over ``ROLLUP(dims)`` (or ``CUBE`` when
    ``cube=True``).

    Output: the ``dims`` columns (NULL at rolled-up levels),
    ``grouping_id`` (bitmask of rolled-up dims — 0 is the leaf level,
    2^d - 1 the grand total), ``n_docs``, ``n_distinct_keys_approx``
    (HLL++, ``rsd``), ``total_size``/``mean_size``/``max_size`` over
    ``size_col``, and ``size_q`` — an array parallel to ``quantiles``
    with the approximate quantile values (rank error ≤ n/``accuracy``).

    ``n_distinct_keys_approx`` vs ``n_docs`` is the report's built-in
    integrity probe: on a corpus whose ``key`` contract (unique doc ids)
    holds, the two agree within the HLL bound — a slice where distinct
    falls far below count is a duplicated-id signal, caught in the same
    pass that profiles sizes, for free.

    NULL ``size_col`` values are ignored by sum/avg/max/percentile
    (standard SQL aggregate semantics) but the rows still count in
    ``n_docs`` — a slice of NULL-sized docs reports mass NULL, count
    honest.
    """
    if not dims:
        raise ValueError("corpus_report: dims must be non-empty (use the "
                         "grand-total row of a 1-dim rollup for a global "
                         "report)")
    for d in dims:
        if d not in df.columns:
            raise ValueError(f"corpus_report: no {d!r} column")
    if not (0 < rsd < 1):
        raise ValueError(f"corpus_report: rsd must be in (0, 1), got {rsd}")
    qs = [float(q) for q in quantiles]
    if any(not (0 <= q <= 1) for q in qs):
        raise ValueError(f"corpus_report: quantiles outside [0, 1]: {qs}")

    size = F.col(size_col)
    grouped = df.cube(*dims) if cube else df.rollup(*dims)
    return grouped.agg(
        F.grouping_id().alias("grouping_id"),
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct(F.col(key), rsd).alias(
            "n_distinct_keys_approx"
        ),
        F.sum(size).alias("total_size"),
        F.avg(size).alias("mean_size"),
        F.max(size).alias("max_size"),
        F.percentile_approx(
            size, F.array(*[F.lit(q) for q in qs]), F.lit(int(accuracy))
        ).alias("size_q"),
    )
