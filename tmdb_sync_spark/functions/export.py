"""Deterministic sharded training export + weighted source mixing — the
trainer handoff at the end of the curation pipeline.

Two operations between a curated corpus (functions/pipeline.py →
functions/sampling.py) and a training job, each expressed so the 100 TB
shape is the natural one:

- **Sharded export with a deterministic global shuffle.** Trainers
  consume fixed shard files in a reproducible pseudo-random document
  order — "shuffle once at export, stream shards at train time" — so
  the export must pin BOTH shard membership and within-shard order as
  pure functions of (key, seed), never of cluster layout. Shard =
  ``pmod(xxhash64(key, salt, seed), n_shards)``; order within a shard =
  ascending ``xxhash64(key, order_salt, seed)`` (an independent salt,
  so order is decorrelated from membership). One shuffle total: rows
  are repartitioned BY the shard column and sorted within partitions,
  so the partitioned writer emits exactly ONE file per shard, already
  in final order — no global sort, no second pass, no driver funnel.
  A new seed is a new epoch order; re-exporting a grown corpus moves no
  existing row between shards beyond the modulus change the caller
  asked for.

- **Weighted source mixing**: combine N source frames into one corpus
  matching target proportions, without replacement — the
  domain-mixture step every pretraining run tunes. The largest corpus
  honoring the proportions is taken: the binding source (smallest
  count/weight ratio) rides through whole; every other source is
  hash-threshold downsampled (sampling.py's deterministic keep) to its
  share. One bounded count() per source at plan-build; the plan itself
  is a union of filtered scans — no shuffle at all.

Crash safety: the export stages into a writer-unique
``<out>._staging-<pid>-<seq>`` and publishes with one atomic rename — a reader never sees a half-written shard set,
and a crashed export leaves only a staging dir the next run clears
(same single-writer contract as the MERGE swap, without the journal:
an export target is immutable once published, so there is nothing to
roll forward). The manifest (per-shard rows/tokens/bytes) is written
INSIDE the staging dir before the rename, so its presence certifies a
complete export.

Oracle surface (r8 rotation): the LAYOUT contract — deterministic
(key → shard, rank) — is driver-verified through ``export_shard_layout``
using the md5 hash variant (DuckDB has no xxhash64; the registry's
md5-only rule). The file-side contracts (atomic publish, manifest,
one-file-per-shard) have no SQL-parity surface and stay pinned by the
property tests in tests/test_export.py.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.registry import register

# Salt spaces, disjoint from sampling.py's: a doc's split label, sample
# keep, pack bucket, shard, order rank, and mix keep must be mutually
# independent hashes.
_SHARD_SALT = "shard"
_ORDER_SALT = "order"
_MIX_SALT = "mix"

# sampling.py's hash-space modulus — same quantization bound (1e-6).
from tmdb_sync_spark.functions.sampling import _M  # noqa: E402

MANIFEST_NAME = "_export_manifest.json"

# writer-unique staging suffix counter (see export_training_shards)
import itertools as _itertools  # noqa: E402

_STAGING_SEQ = _itertools.count()


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


STAGING_MAX_AGE_S = 24 * 3600


def _stale_stagings(base: str) -> list:
    """Leftover staging dirs for ``base`` from CRASHED runs — never a
    live concurrent exporter's. Staging names embed the writer pid;
    a dir whose pid is still alive is (or may be) an in-flight write
    and sweeping it would fail that exporter mid-job (review finding:
    the sweep used to take every ``._staging-*``, breaking exactly the
    benign-race contract writer-unique naming bought).

    Two honest limits of the pid probe (second review pass): pid
    REUSE can park a crashed dir behind an unrelated long-lived
    process, so dirs older than ``STAGING_MAX_AGE_S`` are swept
    regardless (no real export stages for a day); and the probe sees
    only the LOCAL process table — on a shared filesystem with
    writers on several hosts, this sweep is not safe and exporters
    should stage to versioned target paths instead (the engine's
    single-host contract, same as the merge writer lock)."""
    import glob as _glob
    import time as _time

    out = []
    now = _time.time()
    for d in _glob.glob(base + "._staging-*"):
        tail = d[len(base + "._staging-"):]
        pid_s = tail.split("-", 1)[0]
        if pid_s.isdigit() and _pid_alive(int(pid_s)):
            # age of the NEWEST entry in the tree, not the top dir:
            # nested task-dir writes don't touch the top-level mtime,
            # and sweeping a live slow writer on that would kill its
            # export mid-job (r8 advice; shared fix with stats.py)
            from tmdb_sync_spark.util import newest_tree_mtime

            try:
                age = now - newest_tree_mtime(d)
            except OSError:
                continue
            if age <= STAGING_MAX_AGE_S:
                continue
        out.append(d)
    # the pre-writer-unique shared name: no pid, always stale
    if os.path.exists(base + "._staging"):
        out.append(base + "._staging")
    return out


def shard_expr(
    key: Column, n_shards: int, seed: int = 0, *,
    hash_fn: str = "xxhash64",
) -> Column:
    """Deterministic shard index in [0, n_shards) for ``key``.

    ``hash_fn``: ``xxhash64`` (default — JVM-native, the production
    layout) or ``md5`` (first 8 hex chars parsed as an int — the
    cross-engine variant the driver oracle verifies, since DuckDB has
    no xxhash64; the registry's md5-only rule)."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"shard_expr: unknown hash_fn {hash_fn!r}")
    if hash_fn == "md5":
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            key.cast("string"), F.lit(f"|shard|{seed}")
                        ).cast("binary")
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
            F.lit(n_shards),
        )
    return F.pmod(
        F.xxhash64(key, F.lit(_SHARD_SALT), F.lit(seed)), F.lit(n_shards)
    )


def order_expr(
    key: Column, seed: int = 0, *, hash_fn: str = "xxhash64"
) -> Column:
    """Deterministic pseudo-shuffle rank — independent of shard
    membership (distinct salt). Ties are possible only on hash
    collisions; the writer breaks them on the key itself, so the
    exported order is total either way. ``md5`` mode uses 13 hex chars
    (52 bits — exact in every engine's double path, under the 2^53
    canonicalization hazard)."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"order_expr: unknown hash_fn {hash_fn!r}")
    if hash_fn == "md5":
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        key.cast("string"), F.lit(f"|order|{seed}")
                    ).cast("binary")
                ),
                1, 13,
            ),
            16, 10,
        ).cast("long")
    return F.xxhash64(key, F.lit(_ORDER_SALT), F.lit(seed))


def shard_layout(
    df: DataFrame,
    n_shards: int,
    *,
    key: str = "doc_id",
    seed: int = 0,
    keep_order_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The export's physical layout, exposed for plan assertion: rows
    with their ``shard`` column, range-partitioned BY shard (values
    0..n-1 into n partitions ≈ one shard per task — hash-partitioning
    the shard value collides ~1/e of tasks into 2-3 shards, a 2-3×
    write straggler at scale) and sorted within partitions by
    ``(shard, rank, key)`` — the key tie-break makes the order total
    under rank collisions. ONE exchange total; ``partitionBy("shard")``
    on this frame emits one file per shard, already in final order."""
    # 'shard' and '_rank' are RESERVED layout names, recomputed here:
    # a frame that already carries them (the documented round-trip —
    # read_training_shards returns 'shard') would otherwise end with
    # duplicate columns and an AMBIGUOUS_REFERENCE at write time
    # (review finding). keep_order_col is different: the caller NAMES
    # it, so a collision with an existing data column is ambiguous —
    # silently replacing user data with the layout rank would corrupt
    # trainer shards; refuse instead (second review pass).
    if keep_order_col and keep_order_col not in ("shard", "_rank") \
            and keep_order_col in df.columns:
        raise ValueError(
            f"shard_layout: keep_order_col {keep_order_col!r} collides "
            "with an existing data column — rename or drop it first"
        )
    for reserved in ("shard", "_rank"):
        if reserved in df.columns:
            df = df.drop(reserved)
    kcol = F.col(key)
    laid = df.withColumn(
        "shard", shard_expr(kcol, n_shards, seed, hash_fn=hash_fn)
    ).withColumn("_rank", order_expr(kcol, seed, hash_fn=hash_fn))
    out_cols = [c for c in df.columns] + (
        ["_rank"] if keep_order_col else []
    )
    laid = (
        laid.repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", "_rank", key)
        .select("shard", *out_cols)
    )
    if keep_order_col:
        laid = laid.withColumnRenamed("_rank", keep_order_col)
    return laid


@register(
    "export_shard_layout",
    oracle="""
    SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|shard|0'),
                           1, 8))::BIGINT % 8 AS shard,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|order|0'),
                           1, 13))::BIGINT AS rank
    FROM documents
    """,
)
def export_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver registration (r8 rotation) of the trainer export's layout
    contract: every document's (shard, rank) as a pure function of its
    key — shard membership and within-shard order must be reproducible
    on any cluster, any partitioning, any run. Verified per-row against
    DuckDB through the md5 hash variant (the real layout machinery —
    :func:`shard_layout`'s reserved-name handling, range exchange, and
    within-partition sort — with only the hash expression swapped;
    xxhash64 has no DuckDB mirror)."""
    from tmdb_sync_spark.io import parallel_table

    docs = parallel_table(spark, sf_dir, "documents").select("doc_id")
    return shard_layout(
        docs, 8, key="doc_id", keep_order_col="rank", hash_fn="md5"
    ).select("doc_id", "shard", "rank")


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    *,
    key: str = "doc_id",
    seed: int = 0,
    fmt: str = "parquet",
    tokens_col: str | None = None,
    keep_order_col: str | None = None,
) -> dict:
    """Publish ``df`` as ``n_shards`` shard files under ``out_dir`` in a
    deterministic pseudo-random order, plus a manifest.

    Layout: ``out_dir/shard=<i>/part-...`` with exactly one data file
    per shard (one writer task per shard value by construction), rows
    inside each file in ascending ``order_expr`` — so a loader that
    streams shards sequentially replays the same document order on
    every run, any cluster, any input partitioning. ``fmt``:
    ``parquet`` or ``jsonl``.

    The manifest (``out_dir/_export_manifest.json``) records per-shard
    ``rows`` (and ``tokens`` when ``tokens_col`` is given) plus totals
    — the loader's integrity check, computed from the DATA in the same
    job (one extra bounded aggregate of ``n_shards`` rows), not trusted
    bookkeeping. Returns the manifest dict.

    ``keep_order_col``: also write the rank under this name (tests use
    it to assert order; trainers normally leave it out).

    Sizing: one task writes each shard, so pick ``n_shards`` to land
    shards in the loader-friendly 100 MB–1 GB band (a 100 TB corpus ⇒
    ~10⁵ shards) — that simultaneously bounds writer-task memory and
    keeps the range exchange wide.

    Crash/replay contract: refuses an existing ``out_dir`` (exports are
    immutable, version the path); stale ``._staging-*`` dirs from
    crashed or raced runs are cleared and redone; publish is one atomic
    rename. Staging is writer-unique, so two racing exporters to the
    same target write privately — the first rename publishes, the
    second fails loudly on the existing target.

    Precondition: ``key`` is unique (the curated corpus's contract —
    dedup runs upstream). Duplicate keys still export exactly once each,
    but their relative order within the shard is unpinned (shard, rank,
    and tie-break are all functions of the key alone).

    ``df`` must be deterministic between actions (the manifest aggregate
    is a second scan — a frame derived from ``rand()`` could publish a
    manifest disagreeing with its own data; a table-backed frame, the
    normal input, cannot). Same contract as the engine's other
    plan-time-probe operators (pairs.tiled_self_pairs).
    """
    if n_shards <= 0:
        raise ValueError("export_training_shards: n_shards must be > 0")
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(
            f"export_training_shards: fmt {fmt!r} not in "
            "('parquet', 'jsonl')"
        )
    if os.path.exists(out_dir):
        raise ValueError(
            f"export_training_shards: {out_dir!r} exists — exports are "
            "immutable; write to a new (versioned) path"
        )
    if key not in df.columns:
        raise ValueError(f"export_training_shards: no {key!r} column")

    # staging is WRITER-UNIQUE (pid + monotonic counter): with a shared
    # staging name, two concurrent exporters to the same target would
    # rmtree each other's half-written staging and interleave their
    # task files — found by this round's own review. Unique staging
    # makes the race benign: both write privately, the first atomic
    # rename publishes, the second fails LOUDLY on the existing target.
    # Leftovers from crashed/raced runs match the glob prefix and are
    # cleared here, where the immutable-target check already passed —
    # any surviving *._staging-* under a published target is dead by
    # construction (its rename can never succeed).
    base = out_dir.rstrip("/")
    for stale in _stale_stagings(base):
        shutil.rmtree(stale, ignore_errors=True)
    staging = f"{base}._staging-{os.getpid()}-{next(_STAGING_SEQ)}"

    # manifest from the data itself (n_shards bounded rows) — computed
    # BEFORE the staged write, so a token-accounting contract violation
    # raises before the job pays the full export write (review finding:
    # a NULL tokens sum used to surface as a bare TypeError after
    # staging completed)
    aggs = [F.count(F.lit(1)).alias("rows")]
    if tokens_col is not None:
        aggs.append(F.sum(F.col(tokens_col).cast("long")).alias("tokens"))
        aggs.append(
            F.count_if(F.col(tokens_col).isNull()).alias("_null_tokens")
        )
    per_shard = {
        int(r["shard"]): {
            k: (None if r[k] is None else int(r[k]))
            for k in r.asDict() if k != "shard"
        }
        for r in df.withColumn(
            "shard", shard_expr(F.col(key), n_shards, seed)
        ).groupBy("shard").agg(*aggs).collect()
    }
    if tokens_col is not None:
        n_null = sum(s.pop("_null_tokens") for s in per_shard.values())
        if n_null:
            raise ValueError(
                f"export_training_shards: {n_null} rows have NULL "
                f"{tokens_col!r} — token accounting requires every "
                "exported row to carry its count (compute or filter "
                "upstream, or export without tokens_col)"
            )

    laid = shard_layout(
        df, n_shards, key=key, seed=seed, keep_order_col=keep_order_col
    )

    writer = laid.write.mode("errorifexists").partitionBy("shard")
    if fmt == "parquet":
        writer.parquet(staging)
    else:
        writer.json(staging)

    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "key": key,
        "format": fmt,
        "shards": {str(i): per_shard.get(i, {"rows": 0}) for i in
                   range(n_shards)},
        "total_rows": sum(s["rows"] for s in per_shard.values()),
    }
    if tokens_col is not None:
        manifest["total_tokens"] = sum(
            s.get("tokens", 0) for s in per_shard.values()
        )
    with open(os.path.join(staging, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)

    os.rename(staging, out_dir)   # the publish point — atomic
    return manifest


def read_manifest(out_dir: str) -> dict:
    """The published export's manifest; raises if absent (an export dir
    without one was never published — a staging leak or a foreign
    directory, either way not a readable export)."""
    p = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(p):
        raise ValueError(f"read_manifest: no manifest at {p!r}")
    with open(p) as f:
        return json.load(f)


def read_training_shards(
    spark, out_dir: str, *, verify: bool = True
) -> DataFrame:
    """The loader side: the published export as a DataFrame (with its
    ``shard`` column), after checking the data against the manifest.

    ``verify=True`` (default) runs ONE bounded aggregate — per-shard
    row counts vs the manifest's — and raises listing every diverging
    shard. This is the integrity check the manifest exists for: a
    shard file lost to a partial copy, or rows lost to a corrupted
    transfer, fails loudly here instead of silently shortening an
    epoch. (Token sums are deliberately not re-verified: rows are the
    file-loss signal; re-summing a token column costs a full column
    scan for no additional detection power.) Skip it only on hot paths
    that re-read an export they just verified.

    Order note: Spark does not guarantee row order across a parquet
    scan — a trainer that needs the exported order streams shard files
    directly (their physical row order IS the rank order); this reader
    is for set-oriented consumers (stats, re-mixing, re-export).
    """
    m = read_manifest(out_dir)
    df = (
        spark.read.parquet(out_dir) if m.get("format") == "parquet"
        else spark.read.json(out_dir)
    )
    if verify:
        got = {
            int(r["shard"]): r["n"]
            for r in df.groupBy("shard").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        bad = []
        for i in range(m["n_shards"]):
            want = m["shards"][str(i)]["rows"]
            have = got.get(i, 0)
            if want != have:
                bad.append(f"shard {i}: manifest={want} data={have}")
        if bad:
            raise ValueError(
                f"read_training_shards: {out_dir!r} fails integrity: "
                + "; ".join(bad)
            )
    return df


def mix_sources(
    sources: Mapping[str, tuple[DataFrame, float]],
    *,
    key: str = "doc_id",
    seed: int = 0,
    source_col: str = "source",
) -> DataFrame:
    """Union of the sources downsampled to target proportions, without
    replacement — the largest corpus honoring the weights.

    ``sources``: ``{name: (frame, weight)}``. The binding source
    (smallest ``count/weight``) passes whole; each other source keeps a
    deterministic hash fraction of its rows so realized proportions
    track the weights (quantized at 1e-6 + hash noise ~ 1/sqrt(n) —
    proportions are targets, not exact counts; an exact-count mix needs
    a global rank, i.e. a sort, which the hash keep deliberately
    avoids). Output carries ``source_col`` naming each row's origin.

    Plan shape: one bounded ``count()`` per source at build time, then
    a union of filtered scans — the keep predicate sits directly on
    each source's scan, no shuffle anywhere. Deterministic per
    (key, seed): re-running, repartitioning, or growing OTHER sources
    never flips a kept row, and the mix salt is independent of the
    split/sample/shard salts so downstream sampling stays unbiased.
    """
    if not sources:
        raise ValueError("mix_sources: sources must be non-empty")
    for name, (sdf, w) in sources.items():
        if w <= 0:
            raise ValueError(
                f"mix_sources: weight for {name!r} must be > 0 (drop the "
                "source instead of zero-weighting it)"
            )
        if key not in sdf.columns:
            raise ValueError(f"mix_sources: {name!r} has no {key!r} column")

    counts = {
        name: sdf.count() for name, (sdf, _) in sources.items()
    }
    empty = [n for n, c in counts.items() if c == 0]
    if empty:
        raise ValueError(
            f"mix_sources: empty source(s) {empty} — a zero-row source "
            "forces the whole mix to zero; drop it explicitly"
        )
    # the binding source fixes the scale: take_i = weight_i * scale
    scale = min(counts[n] / w for n, (_, w) in sources.items())

    parts = []
    for name, (sdf, w) in sources.items():
        frac = min(1.0, (w * scale) / counts[name])
        # keep/drop is per (key, SOURCE NAME, seed) — without the name,
        # sources sharing key values make correlated decisions (the
        # same rows survive in both), biasing any downstream join or
        # dedup between them (ADVICE r7, mirrored from the by-tokens fix)
        b = F.pmod(
            F.xxhash64(F.col(key), F.lit(_MIX_SALT), F.lit(name),
                       F.lit(seed)),
            F.lit(_M),
        )
        kept = sdf.where(b < F.lit(int(round(frac * _M))))
        parts.append(kept.withColumn(source_col, F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_sources_by_tokens(
    sources: Mapping[str, tuple[DataFrame, float]],
    total_tokens: int,
    *,
    tokens_col: str = "n_tokens",
    key: str = "doc_id",
    seed: int = 0,
    source_col: str = "source",
    epoch_col: str = "epoch",
    max_repeats: int = 10,
) -> tuple[DataFrame, dict]:
    """The trainer's mixing contract: allocate a TOKEN budget across
    sources, up-sampling small high-quality sources by repetition —
    :func:`mix_sources` thinks in rows and only downsamples; training
    recipes think in tokens and routinely run a small corpus for 2-4
    epochs while a web crawl runs for 0.3.

    ``sources``: ``{name: (frame, weight)}``; each source gets
    ``total_tokens * weight / Σweights`` of budget. A source whose
    budget exceeds its mass is repeated: ``floor(ratio)`` full copies
    plus a deterministic hash-kept remainder fraction, each copy
    tagged with ``epoch_col`` (0-based) — so downstream stages can
    tell the third pass over a doc from the first, and the output key
    is (``key``, ``epoch_col``), NOT ``key`` alone (re-key or export
    with a composite key; export_training_shards' unique-key
    precondition is on the caller). ``max_repeats`` bounds the
    up-sampling — needing more than ~10 epochs of a source is a recipe
    smell, refused loudly rather than silently looped.

    Realized tokens per source ≈ budget with hash noise on the
    remainder slice only (full copies are exact); proportions are
    targets, not exact counts — the same contract as
    :func:`mix_sources`, for the same reason (exactness needs a global
    sort). NULL ``tokens_col`` rows are refused: unaccountable mass
    breaks budget arithmetic (same contract as the export manifest).

    Plan shape: one bounded aggregate per source (sum + NULL count,
    map-side partial), then a union of pure filtered scans —
    ``repeats+1`` scan branches per source, no shuffle anywhere,
    deterministic per (key, seed, epoch).

    Returns ``(frame, plan)`` — ``plan`` records per source the
    available tokens, budget, full repeats and remainder fraction the
    mix was built from (audit/logging; computed from the same aggs the
    plan used, not re-derived).
    """
    if total_tokens <= 0:
        raise ValueError("mix_sources_by_tokens: total_tokens must be > 0")
    if not sources:
        raise ValueError("mix_sources_by_tokens: sources must be non-empty")
    for name, (sdf, w) in sources.items():
        if w <= 0:
            raise ValueError(
                f"mix_sources_by_tokens: weight for {name!r} must be > 0"
            )
        for c in (key, tokens_col):
            if c not in sdf.columns:
                raise ValueError(
                    f"mix_sources_by_tokens: {name!r} has no {c!r} column"
                )

    stats = {}
    for name, (sdf, _) in sources.items():
        r = sdf.agg(
            F.sum(F.col(tokens_col).cast("long")).alias("t"),
            F.count_if(F.col(tokens_col).isNull()).alias("nn"),
        ).collect()[0]
        if r["nn"]:
            raise ValueError(
                f"mix_sources_by_tokens: {r['nn']} rows of {name!r} have "
                f"NULL {tokens_col!r} — token budgets need every row "
                "accounted (compute or filter upstream)"
            )
        if not r["t"]:
            raise ValueError(
                f"mix_sources_by_tokens: source {name!r} has no token "
                "mass — drop it explicitly"
            )
        stats[name] = int(r["t"])

    wsum = float(sum(w for _, w in sources.values()))
    plan = {}
    parts = []
    for name, (sdf, w) in sources.items():
        budget = total_tokens * (w / wsum)
        ratio = budget / stats[name]
        if ratio > max_repeats:
            raise ValueError(
                f"mix_sources_by_tokens: {name!r} would repeat "
                f"{ratio:.1f}x (> max_repeats={max_repeats}) — raise its "
                "mass, lower its weight, or raise max_repeats explicitly"
            )
        repeats = int(ratio)
        frac = ratio - repeats
        plan[name] = {
            "weight": w,
            "available_tokens": stats[name],
            "budget_tokens": int(round(budget)),
            "repeats": repeats,
            "remainder_frac": round(frac, 6),
        }
        tagged = sdf.withColumn(source_col, F.lit(name))
        for e in range(repeats):
            parts.append(
                tagged.withColumn(epoch_col, F.lit(e).cast("int"))
            )
        if frac > 0:
            # the source NAME is part of the hash (ADVICE r7): two
            # sources sharing key values — or a pipeline composing
            # mix_sources with this under the same salt/seed — must
            # make INDEPENDENT keep/drop decisions, not correlated ones
            b = F.pmod(
                F.xxhash64(
                    F.col(key), F.lit(_MIX_SALT), F.lit(name),
                    F.lit(seed), F.lit(repeats),
                ),
                F.lit(_M),
            )
            parts.append(
                tagged.where(b < F.lit(int(round(frac * _M))))
                .withColumn(epoch_col, F.lit(repeats).cast("int"))
            )
    if not parts:
        raise ValueError(
            "mix_sources_by_tokens: every source rounded to zero budget"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, plan


# --- embedding payload quantization (export compression) --------------

def quantize_embedding_expr(emb: Column):
    """``(codes, scale)`` column pair: symmetric per-vector int8
    quantization — ``codes[i] = round(emb[i] / scale)`` with
    ``scale = max(|emb|) / 127`` — the standard 4× storage cut for
    embedding payloads riding a training export (float32 → int8 +
    one float scale). Pure Catalyst (two array HOFs, no shuffle, no
    UDF); reconstruction error per component is ≤ scale/2 by
    construction.

    Degenerate inputs follow the engine's embedding conventions: a
    NULL embedding yields NULL codes/scale; an all-zero vector yields
    zero codes with scale 0 (dequantizing reproduces it exactly).
    Non-finite components are the caller's problem (run the validity
    contract first — similarity._valid_expr — exactly as the index
    builders do): NaN poisons its own vector only.
    """
    mx = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    scale = (mx / F.lit(127.0)).cast("float")
    codes = F.when(
        scale > 0,
        F.transform(
            emb, lambda x: F.round(x / scale).cast("tinyint")
        ),
    ).otherwise(
        F.when(
            emb.isNotNull(),
            F.transform(emb, lambda x: F.lit(0).cast("tinyint")),
        )
    )
    return codes, scale


def dequantize_embedding_expr(codes: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_embedding_expr`:
    ``codes[i] * scale`` as float — zero-scale vectors reconstruct to
    exact zeros, NULLs stay NULL."""
    return F.when(
        codes.isNotNull(),
        F.transform(codes, lambda c: (c * scale).cast("float")),
    )


def shard_read_order(n_shards: int, epoch: int, seed: int = 0) -> list:
    """Deterministic shard permutation for an epoch — the cheap way to
    vary training order across epochs WITHOUT re-exporting: write the
    corpus once, stream shards in ``shard_read_order(n, epoch)`` order
    each epoch (plus any loader-side buffer shuffle). Fisher–Yates
    driven by the same xxhash64 family via Python's seeded Random —
    pure driver-side arithmetic, identical on every machine and
    every Python build (random.Random is version-stable by contract).
    Epoch 0 is already shuffled (the permutation, not identity)."""
    if n_shards <= 0:
        raise ValueError("shard_read_order: n_shards must be > 0")
    import random

    order = list(range(n_shards))
    random.Random(f"shard-order:{seed}:{epoch}").shuffle(order)
    return order
