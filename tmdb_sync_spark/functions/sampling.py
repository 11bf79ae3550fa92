"""Corpus split / stratified sampling / sequence packing — the
training-data-prep tail of the pipeline operator family.

Three operations every large-scale pretraining pipeline runs between
curation (functions/pipeline.py) and the trainer, each expressed so the
100 TB shape is the natural one:

- **Deterministic split** (train/val/test): a pure PROJECTION — label =
  bucket of ``xxhash64(key, seed)`` against cumulative weight
  boundaries. No shuffle, no sampling state, no action; the same row
  lands in the same split on every run, on any cluster layout, under
  any partitioning, so split membership is reproducible metadata rather
  than a materialized artifact. This is how production corpora pin
  eval-set membership (hash-of-id, not ``rand()``): re-running the
  pipeline over a grown corpus never migrates an old row between
  splits, because the hash depends only on (key, seed).

- **Stratified sampling**: per-stratum hash-threshold keep — again a
  pure projection (``pmod(hash) < fraction * M``), with the per-stratum
  fraction map folded into ONE small case expression. Unlike
  ``df.sampleBy`` (Bernoulli on a per-partition RNG stream), the
  hash-threshold keep is deterministic AND stable under repartitioning;
  a sampled row stays sampled when the corpus is re-laid-out. Distinct
  hash salts decorrelate the sample from the split above.

- **Sequence packing**: greedy first-fit-decreasing of documents into
  fixed-token-budget packs (the training-batch construction step).
  Global bin packing is inherently sequential, so the distributed form
  buckets documents by hash and packs WITHIN each bucket via
  ``applyInPandas`` — embarrassingly parallel, one shuffle on the
  bucket key. The quality loss vs a global pack is bounded: FFD wastes
  < max_item in every open bin, and with B buckets the extra waste is
  at most B partially-filled trailing packs — negligible when each
  bucket holds ≫ 1 pack's worth of tokens, which the bucket-count
  contract below guarantees. Pack ids are globally unique by
  construction (``bucket * 2^32 + local``), no coordination.

Oracle coverage: the hash split/sample have no DuckDB twin
(``xxhash64`` has no DuckDB equivalent) and the packing is defined by
an imperative greedy rule, so those contracts are pinned by property
tests (tests/test_sampling.py: partition-of-corpus, repartition
stability, per-stratum tolerance, pack-budget bound, exactly-once
membership, determinism) instead of SQL parity — the same
weaker-but-honest treatment the survey prescribes for non-SQL ops.
:func:`cap_per_group` IS fully SQL-expressible, so it carries a
registered local-parity row (``sp_cap_per_group``) whose DuckDB twin
is the naive single-window form — pinning that the skew-safe
two-phase plan computes exactly the one-window semantics.

These compose with the registered surface — e.g. split the curation
pipeline's kept corpus, pack the train split.
"""

from __future__ import annotations

from typing import Iterator, Mapping, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tmdb_sync_spark.registry import register_retired

# Hash-space modulus for split/sample bucketing. 1e6 buckets bounds the
# fraction quantization error at 1e-6 — far below sampling noise at any
# corpus size worth splitting.
_M = 1_000_000

# Distinct salt spaces so split/sample/pack hashes are mutually
# independent: a doc's split label must not bias its sample keep or its
# pack bucket.
_SPLIT_SALT = "split"
_SAMPLE_SALT = "sample"
_PACK_SALT = "pack"


def _bucket(key: Column, salt: str, seed: int) -> Column:
    """Uniform bucket in [0, _M) from (key, salt, seed) — xxhash64 is
    Spark-native (JVM, codegen'd), seedable, and 64-bit, so pmod bias is
    2^-44-scale: irrelevant.

    NULL keys: xxhash64 SKIPS null arguments, so every NULL-key row
    hashes to the same (salt, seed)-dependent bucket — deterministically
    in ONE split / one keep-or-drop decision per stratum, never spread.
    That is the projection-pure behavior (a guard would cost every row);
    corpora where NULL ids are an error should assert upstream. Pinned
    in tests/test_sampling.py::test_null_keys_deterministic."""
    return F.pmod(F.xxhash64(key, F.lit(salt), F.lit(seed)), F.lit(_M))


def split_expr(
    key: Column,
    weights: Mapping[str, float],
    seed: int = 0,
) -> Column:
    """Split-label column: deterministic hash of ``key`` against the
    cumulative ``weights`` boundaries. Weights need not sum to 1 — they
    are normalized; iteration order of the mapping fixes the boundary
    order (dicts are ordered, and the tests pin the convention).

    Pure projection: composes with any plan, costs one hash + a chain
    of comparisons, and never shuffles. The label for a key is a pure
    function of (key, weights, seed) — adding corpus rows later can
    never move an existing row between splits.
    """
    if not weights:
        raise ValueError("split_expr: weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        # a negative weight makes the cumulative boundaries
        # non-monotonic and silently mis-buckets every later label
        raise ValueError(f"split_expr: negative weight in {weights}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split_expr: weights must sum > 0")
    b = _bucket(key, _SPLIT_SALT, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(round(acc * _M))
        cond = b < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def split_corpus(
    df: DataFrame,
    key: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    seed: int = 0,
    out: str = "split",
) -> DataFrame:
    """``df`` + a ``split`` label column (default 98/1/1 train/val/test
    — the pretraining convention where eval sets are small but corpus
    fractions, not fixed counts)."""
    w = weights if weights is not None else {
        "train": 0.98, "val": 0.01, "test": 0.01,
    }
    return df.withColumn(out, split_expr(F.col(key), w, seed))


def stratified_sample(
    df: DataFrame,
    strata: str,
    fractions: Mapping[str, float] | float,
    key: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its hash bucket
    clears the stratum's fraction threshold.

    ``fractions``: one float for every stratum, or a per-stratum map —
    strata ABSENT from the map are kept at fraction 0 (dropped), the
    conservative reading (an unlisted language should not silently ride
    through at 100%). The map folds into one CASE expression, so this
    stays a single filtered scan whatever the map size; at 100 TB the
    filter sits on the parquet scan with nothing upstream of it.

    vs ``DataFrame.sampleBy``: same contract, but reproducible across
    runs/layouts (hash-of-key, not RNG-stream), and exact enough that
    the tests can assert per-stratum counts, not just expectations.
    """
    b = _bucket(F.col(key), _SAMPLE_SALT, seed)
    if isinstance(fractions, Mapping):
        thr = None
        for name, frac in fractions.items():
            bound = F.lit(int(round(float(frac) * _M)))
            cond = F.col(strata) == name
            thr = F.when(cond, bound) if thr is None else thr.when(
                cond, bound
            )
        thr = F.lit(0) if thr is None else thr.otherwise(F.lit(0))
    else:
        thr = F.lit(int(round(float(fractions) * _M)))
    return df.where(b < thr)


# --- sequence packing ------------------------------------------------

def ffd_pack(
    sizes: Sequence[int], budget: int
) -> tuple[list[int], list[int], list[bool]]:
    """The pure first-fit packing kernel: ``sizes`` (already in the
    caller's chosen order — :func:`pack_sequences` feeds it
    longest-first, making this FFD) → ``(assign, totals, oversize)``,
    parallel to ``sizes``/``totals``: item i goes to pack ``assign[i]``,
    pack p holds ``totals[p]`` tokens, and ``oversize[i]`` marks items
    alone over budget (their single-item pack is never reopened).

    Extracted module-level so the Hypothesis suite can hammer it
    directly (tests/test_sampling.py): the first draft of this loop
    silently dropped every bin-opening item from ``assign`` — exactly
    the class of imperative slip a pure, property-tested kernel
    prevents from reaching the Arrow path. First-fit state is the open
    list ``bins = [remaining, pack_index]``; memory O(packs)."""
    bins: list[list[int]] = []
    totals: list[int] = []
    assign: list[int] = []
    oversize: list[bool] = []
    for n in sizes:
        n = int(n)
        if n > budget:
            assign.append(len(totals))
            totals.append(n)
            oversize.append(True)
            continue
        for b in bins:
            if b[0] >= n:
                b[0] -= n
                totals[b[1]] += n
                assign.append(b[1])
                oversize.append(False)
                break
        else:
            bins.append([budget - n, len(totals)])
            assign.append(len(totals))
            totals.append(n)
            oversize.append(False)
    return assign, totals, oversize


# Per-bucket token mass targeted by pack_sequences' default bucket
# count: each bucket should hold many packs' worth of tokens so the
# trailing partially-filled pack per bucket is amortized away. 64 packs
# per bucket ⇒ ≤ ~1.6% waste from bucketing even if every trailing pack
# were empty.
_PACKS_PER_BUCKET = 64


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    doc_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Greedy first-fit-decreasing packing of documents into packs of
    ≤ ``max_tokens`` total tokens — the training-batch construction
    step, distributed.

    Returns ``(doc_col, n_tokens, bucket, pack_id, pack_tokens,
    oversize)``: every input doc appears EXACTLY once; ``pack_tokens``
    is its pack's total; docs with ``n_tokens > max_tokens`` become
    single-doc packs flagged ``oversize`` (the caller's
    truncate-or-split policy decision, surfaced rather than guessed);
    NULL/negative token counts raise inside the kernel (a corrupt token
    count silently packed as 0 would over-fill real batches).

    Scale shape: ONE shuffle (hash bucket), then an embarrassingly
    parallel per-bucket FFD in an ``applyInPandas`` kernel whose state
    is a plain open-bins list — memory is O(open bins) = O(bucket
    tokens / max_tokens), and each bucket holds ~``_PACKS_PER_BUCKET``
    packs by the default sizing. ``n_buckets`` is derived from a cheap
    token-sum action when not given (one map-side partial-agg job);
    callers at known scale pass it explicitly and the plan runs with no
    action at all. Pack ids are ``bucket * 2**32 + local_index`` —
    globally unique with zero coordination; determinism follows from
    the hash bucketing + a full sort inside the kernel (ties broken on
    ``doc_col``), pinned by the repartition-stability test.
    """
    if max_tokens <= 0:
        raise ValueError("pack_sequences: max_tokens must be positive")
    if n_buckets is None:
        mass = df.agg(
            F.sum(F.col(tokens_col).cast("long")).alias("s")
        ).collect()[0]["s"] or 0
        n_buckets = max(1, int(mass // (max_tokens * _PACKS_PER_BUCKET)))

    out_schema = (
        f"{doc_col} long, n_tokens long, bucket long, pack_id long, "
        "pack_tokens long, oversize boolean"
    )
    budget = int(max_tokens)
    dcol = doc_col
    tcol = tokens_col

    def pack_bucket(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            if pdf[dcol].isna().any():
                # without this, a NULL id dies as a cryptic pandas
                # IntCastingNaNError deep in the Arrow kernel (probed)
                raise ValueError(
                    f"pack_sequences: NULL {dcol} in the corpus — doc "
                    "ids are the pack contract's key; fix upstream"
                )
            if pdf[tcol].isna().any() or (pdf[tcol] < 0).any():
                bad = pdf.loc[
                    pdf[tcol].isna() | (pdf[tcol] < 0), dcol
                ].head(3).tolist()
                raise ValueError(
                    f"pack_sequences: NULL/negative {tcol} for docs "
                    f"{bad} — fix token counts upstream"
                )
            bucket = int(pdf["_pb"].iloc[0])
            # FFD: longest first, doc id tiebreak ⇒ deterministic for
            # the bucket's SET of docs, however they arrived
            pdf = pdf.sort_values(
                [tcol, dcol], ascending=[False, True]
            )
            assign, totals, oversize = ffd_pack(
                [int(n) for n in pdf[tcol].astype("int64")], budget
            )
            base = bucket << 32
            yield pd.DataFrame({
                dcol: pdf[dcol].astype("int64").values,
                "n_tokens": pdf[tcol].astype("int64").values,
                "bucket": [bucket] * len(assign),
                "pack_id": [base + a for a in assign],
                "pack_tokens": [totals[a] for a in assign],
                "oversize": oversize,
            })

    bucketed = df.select(
        F.col(dcol), F.col(tcol),
        F.pmod(
            _bucket(F.col(dcol), _PACK_SALT, seed), F.lit(int(n_buckets))
        ).alias("_pb"),
    )
    return (
        bucketed.groupBy("_pb")
        .applyInPandas(pack_bucket, schema=out_schema)
    )


# --- per-group caps (domain quota sampling) ---------------------------

def cap_per_group(
    df: DataFrame,
    group: str,
    rank_col: str,
    k: int,
    *,
    key: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``k`` rows per ``group``, best-first by ``rank_col``
    (ties broken ascending on ``key``) — the per-domain quota step
    (CCNet-style: cap each web domain at its k best-quality pages so no
    single host dominates the corpus).

    Deterministic: the kept set is defined by the total order
    ``(rank_col, key)`` alone. Requires unique ``key`` (the corpus
    contract); duplicate keys make the tie-break ambiguous.

    Scale shape — the naive single window (`row_number() OVER
    (PARTITION BY group)`) funnels each group through ONE task before
    cutting it, so a hot domain (one host = 10⁹ pages) becomes a
    straggler exactly like the LSH hot bucket pairs.py tiles. Two
    phases instead:

    1. local top-k within ``(group, arrival partition)`` — the
       arrival-partition id spreads any hot group across however many
       tasks already hold its rows, and every row of the TRUE global
       top-k survives its local cut (a row beaten by k rows locally is
       beaten by k rows globally);
    2. global top-k per group over the ≤ k·P survivors — by then the
       hot group is at most k·P rows, not 10⁹.

    The arrival-partition id is layout-dependent, but only the
    SUPERSET it shapes is — phase 2's total order makes the final kept
    set layout-independent (pinned by the repartition test).
    """
    if k <= 0:
        raise ValueError("cap_per_group: k must be positive")
    from pyspark.sql import Window

    rank = F.col(rank_col).desc() if descending else F.col(rank_col).asc()
    ordering = [rank, F.col(key).asc()]

    w_local = Window.partitionBy(group, "_cap_salt").orderBy(*ordering)
    survivors = (
        df.withColumn("_cap_salt", F.spark_partition_id())
        .withColumn("_cap_rn", F.row_number().over(w_local))
        .where(F.col("_cap_rn") <= k)
        .drop("_cap_salt", "_cap_rn")
    )
    w_global = Window.partitionBy(group).orderBy(*ordering)
    return (
        survivors.withColumn("_cap_rn", F.row_number().over(w_global))
        .where(F.col("_cap_rn") <= k)
        .drop("_cap_rn")
    )


# Registered cap: k best documents per language by size. Small enough
# that the sf0.01 result is a readable frame, large enough that ties
# and the NULL-lang group are exercised.
_CAP_K = 5


@register_retired(
    "sp_cap_per_group",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY n_chars DESC NULLS LAST, doc_id ASC
               ) AS rn
        FROM documents
    )
    WHERE rn <= {_CAP_K}
    """,
)
def sp_cap_per_group(spark, sf_dir: str) -> DataFrame:
    """Per-group quota cap (CCNet-style domain cap) over ``documents``:
    keep the ``_CAP_K`` largest docs per ``lang``, ties broken ascending
    on ``doc_id``. The oracle is the NAIVE single-window form; the Spark
    plan is :func:`cap_per_group`'s two-phase local-then-global top-k
    (a hot group is pre-cut inside every arrival partition, so one
    10⁹-page domain never funnels through one task) — the parity row
    pins that the skew-safe plan computes exactly the one-window
    semantics, NULL groups and NULL ranks included (Spark ``desc`` =
    DuckDB ``DESC NULLS LAST``; a NULL ``lang`` is one group in both
    engines)."""
    from tmdb_sync_spark.io import parallel_table

    docs = parallel_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return cap_per_group(docs, "lang", "n_chars", _CAP_K, key="doc_id")


# --- pack materialization (the trainer-input last mile) ----------------

# Default end-of-document separator woven between packed docs — a
# sentinel the whitespace tokenizer sees as ONE token, so a pack's
# materialized token count is Σ member tokens + (members − 1).
EOD_SEP = "<|endofdoc|>"


def materialize_packs(
    docs: DataFrame,
    assignments: DataFrame,
    *,
    doc_col: str = "doc_id",
    text_col: str = "text",
    sep: str = EOD_SEP,
) -> DataFrame:
    """Turn :func:`pack_sequences` assignments into actual trainer
    inputs: one row per pack — ``(pack_id, doc_ids, n_docs,
    pack_tokens, oversize, text)`` with members' texts joined by
    ``\\n<sep>\\n`` in the pack's insertion order.

    Insertion order is reconstructed, not stored: FFD inserts a pack's
    members longest-first with the id tie-break, so sorting members by
    ``(n_tokens desc, doc id asc)`` reproduces it exactly — the
    assignment table stays narrow and the order is still deterministic
    end to end. ``doc_ids`` carries provenance in the same order, the
    column a loss-masking or attention-boundary consumer derives spans
    from (spans are re-derivable from the member texts + separator
    length; storing offsets would duplicate what the text already
    pins).

    Scale shape: one equi-join on ``doc_col`` (the docs side carries
    the heavy text column straight from its scan; the assignment side
    is narrow), then ONE shuffle on ``pack_id`` whose per-group state —
    ``collect_list`` of member structs — is bounded by the pack budget
    (≤ max_tokens of text per group by construction), so no group can
    outgrow a task. A pack whose members are missing from ``docs``
    (inner join) simply shrinks: callers feed the same frame they
    packed, and the tests pin the every-doc-exactly-once contract.

    ``oversize`` is true iff the pack is a single-doc over-budget pack
    (FFD flags the doc; the pack inherits it).
    """
    member = F.struct(
        (-F.col("n_tokens")).alias("_neg"),
        F.col("_mid").alias("_mid"),
        F.col(text_col).alias("_txt"),
    )
    joined = assignments.select(
        F.col(doc_col).alias("_mid"), "n_tokens", "pack_id",
        "pack_tokens", "oversize",
    ).join(
        docs.select(F.col(doc_col).alias("_mid"), text_col), "_mid"
    )
    ordered = F.array_sort(F.collect_list(member))
    return (
        joined.groupBy("pack_id")
        .agg(
            F.max("pack_tokens").alias("pack_tokens"),
            F.max("oversize").alias("oversize"),
            ordered.alias("_m"),
        )
        .select(
            "pack_id",
            F.transform(F.col("_m"), lambda m: m["_mid"]).alias("doc_ids"),
            F.size("_m").alias("n_docs"),
            "pack_tokens",
            "oversize",
            F.array_join(
                F.transform(F.col("_m"), lambda m: m["_txt"]),
                f"\n{sep}\n",
            ).alias(text_col),
        )
    )
