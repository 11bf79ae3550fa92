"""Test-data catalog: read the driver-generated parquet star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an ``sf_dir``.

Reads are plain ``spark.read.parquet`` so Catalyst keeps full pushdown /
pruning freedom; nothing is cached here (operators decide).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, LongType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# (path, mtime_ns, size) -> whether events' ts is TIMESTAMP(NANOS)
_EVENTS_NANOS: dict[tuple, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """Footer sniff: does this events table encode ``ts`` as
    TIMESTAMP(NANOS)? Cached per (path, mtime, size) so a driver-side
    testdata regeneration is re-sniffed."""
    f = path
    if os.path.isdir(path):
        parts = sorted(
            e.path for e in os.scandir(path) if e.name.endswith(".parquet")
        )
        if parts:
            f = parts[0]
    try:
        st = os.stat(f)
        key = (f, st.st_mtime_ns, st.st_size)
    except OSError:
        return False          # let the Spark read produce the real error
    cached = _EVENTS_NANOS.get(key)
    if cached is None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            cached = pq.read_schema(f).field("ts").type == pa.timestamp("ns")
        except Exception:
            cached = False    # unreadable/odd footer → Spark's error wins
        _EVENTS_NANOS[key] = cached
    return cached


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Query semantics (date_format/year rendering, timestamp arithmetic)
    # assume UTC naive-timestamp parity with the reference and the DuckDB
    # oracle (SURVEY §7 hard-part 7). The driver's session may not pin a
    # zone — enforce it at every table access (runtime-settable conf).
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet's ts encoding varies across driver testdata
        # versions: TIMESTAMP(NANOS) (which the Spark parquet reader
        # rejects — read nanos as long, truncate to micros) or plain
        # TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ). Normalize both to
        # session-zone TimestampType under the UTC session pinned above —
        # the same naive-UTC values DuckDB's reader produces, so oracle
        # comparisons line up exactly.
        # nanosAsLong is set ONLY when the footer actually says NANOS: it
        # is session-global and consulted again at query EXECUTION, so it
        # cannot be scoped set-read-restore (the later action would see
        # the restored value and fail) — but when the encoding is MICROS
        # it need never be touched, so a session that never meets a nanos
        # table keeps default parquet timestamp semantics everywhere.
        path = f"{sf_dir}/{name}.parquet"
        if _events_ts_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", events_ts_norm(df.schema["ts"].dataType))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_ts_norm(raw_type: DataType) -> Column:
    """Expression normalizing the on-disk ``ts`` encoding to TimestampType."""
    if isinstance(raw_type, LongType):  # TIMESTAMP(NANOS) read as long
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


# On-disk ceiling for a size-gated broadcast hint. 64 MB of compressed
# parquet decompresses to a few hundred MB of rows — near the top of what
# a production driver/executor should hold as a broadcast relation, and
# ~3 orders of magnitude above the sf0.1 dimension slices, so the gate
# never changes local plans.
DIM_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def _path_bytes(path: str) -> int:
    """Total on-disk bytes of a parquet file or directory tree."""
    if not os.path.isdir(path):
        try:
            return os.stat(path).st_size
        except OSError:
            return 0
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.stat(os.path.join(dirpath, fn)).st_size
            except OSError:
                pass
    return total


def broadcast_if_dim(
    df: DataFrame, sf_dir: str, name: str, limit: int | None = None
) -> DataFrame:
    """Broadcast hint gated on the BACKING TABLE's on-disk size.

    An unconditional ``F.broadcast`` on a dimension that scales with the
    data (customer grows with SF, unlike nation/region's fixed 25/5 rows)
    is a 100 TB scale bug: the hint overrides Spark's own size checks, so
    at SF≈100k the driver tries to collect a multi-TB relation and dies.
    Gating on the source table's on-disk footprint keeps the hint (and
    the shuffle-free plan) wherever it is provably safe and otherwise
    leaves the join to Catalyst/AQE, which broadcasts at runtime when the
    FILTERED side turns out small — the correct behavior at scale. The
    gate reads the base table's size even when ``df`` is a filtered
    slice: a conservative upper bound that never broadcasts on hope.
    """
    if limit is None:
        limit = DIM_BROADCAST_MAX_BYTES
    if _path_bytes(f"{sf_dir}/{name}.parquet") <= limit:
        return F.broadcast(df)
    return df


# (path, mtime_ns, size) -> footer row count (O(1) metadata read)
_TABLE_ROWS: dict[tuple, int | None] = {}


def table_rows_from_footer(path: str) -> int | None:
    """Row count from parquet footer metadata (no data read), cached per
    content stamp; ``None`` when unreadable — callers fall back to the
    session default."""
    f = path
    if os.path.isdir(path):
        parts = sorted(
            e.path for e in os.scandir(path) if e.name.endswith(".parquet")
        )
        if not parts:
            return None
        f = parts[0]
        many = len(parts) > 1
    else:
        many = False
    try:
        st = os.stat(f)
        key = (f, st.st_mtime_ns, st.st_size)
    except OSError:
        return None
    if key not in _TABLE_ROWS:
        try:
            import pyarrow.parquet as pq

            n = pq.ParquetFile(f).metadata.num_rows
            if many:
                # multi-file dir: first footer is a LOWER bound; good
                # enough for a partition-count floor, and one footer
                # read keeps this O(1) in file count (same rationale as
                # winnow's capped footer walk)
                n = None
        except Exception:
            n = None
        _TABLE_ROWS[key] = n
    return _TABLE_ROWS[key]


def parallel_table(
    spark: SparkSession, sf_dir: str, name: str,
    rows_per_task: int | None = None,
) -> DataFrame:
    """Like :func:`table`, but round-robin repartitioned to the session's
    default parallelism.

    The sf* test tables arrive as one small parquet file → one scan
    partition, which serializes CPU-heavy per-row work (md5 shingling,
    regex token stats, Arrow decode) onto a single core. On a production
    lake the scan is already split across many files/row-groups and this
    shuffle is unnecessary — operators use this helper only in front of
    compute whose cost per row dwarfs the one-time small-table exchange.

    ``rows_per_task`` keys the spread to the table's OWN volume (guide
    §2.2 right-sizing, the winnow/components pattern): partition count =
    ``ceil(footer_rows / rows_per_task)`` CAPPED at the session default
    parallelism, so a production-scale table always keeps the full
    spread and only small tables stop scheduling near-empty tasks. Pass
    it for cheap-per-row compute (the vectorized embedding scorers);
    omit it for heavy per-row work (md5 winnowing/shingling), where even
    a handful of rows per task is worth a core."""
    parts = spark.sparkContext.defaultParallelism
    if rows_per_task is not None:
        rows = table_rows_from_footer(f"{sf_dir}/{name}.parquet")
        if rows is not None:
            parts = max(1, min(parts, -(-rows // rows_per_task)))
    return table(spark, sf_dir, name).repartition(parts)


# session -> (sf_dir, per-table content fingerprints) of the CURRENT
# registration. Registration is idempotent METADATA (temp views over
# fixed paths), not computed results: re-running it per query
# construction re-read ten parquet footers and re-analyzed ten reads
# for nothing (~0.7 s per q1_sql construction at sf0.1 — r12, guide
# §1.2). The fingerprints re-checked on every call keep the memo honest
# against the driver regenerating /root/testdata in place: any table's
# (mtime, size) change re-registers the whole set. ONE entry per
# session — the view names are shared, so a different sf_dir always
# re-registers (and a later switch back re-registers again). Weak keys:
# a dropped SparkSession must not pin its catalog state alive.
_VIEWS_REGISTERED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (for spark.sql-style operators).

    Idempotent per (session, sf_dir, table-content): a repeated call
    with unchanged table files is a ten-``os.stat`` no-op."""
    from tmdb_sync_spark.util import file_fingerprint

    fps = tuple(
        file_fingerprint(f"{sf_dir}/{t}.parquet") for t in TABLES
    )
    if _VIEWS_REGISTERED.get(spark) == (sf_dir, fps):
        return
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_REGISTERED[spark] = (sf_dir, fps)
