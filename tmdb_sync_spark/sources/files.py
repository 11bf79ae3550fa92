"""Schema-explicit JSONL / CSV file sources with corrupt-row
dead-lettering — the training-data interchange boundary.

Parquet is the engine's table format (plans/partitioned.py); real
corpora ARRIVE as JSON-lines and CSV. These readers make that boundary
safe at 100 TB the same way the HTTP ingest is (streaming/ingest.py's
dead-letter taxonomy, ST4):

- **Explicit schema, always.** Schema inference is a FULL extra pass
  over the data before the real read — at 100 TB that is a second
  100 TB scan, and a schema that drifts with the sample. Callers pass
  the ``StructType`` (or DDL string); these functions refuse to infer.
- **One text scan, then parse-as-expression.** The files are read as
  lines (``spark.read.text`` — splittable exactly like the native
  json/csv readers) and parsed with ``from_json`` / ``from_csv``
  carrying an explicit corrupt-record field. This sidesteps Spark's
  internal-corrupt-column restriction on raw json/csv scans
  (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the native
  reader's corrupt column may not be queried alone without caching the
  whole parse), keeps ONE scan feeding both the clean and dead sides,
  and preserves each malformed line VERBATIM.
- **Dead-letter contract** (probed, tests/test_file_sources.py):
  unparseable lines AND type-mismatched fields (``"doc_id": "oops"``)
  populate the corrupt record; an empty-but-valid document (``{}``)
  parses clean with null fields. Never lose the payload you failed to
  parse; never kill a 1000-executor job over one bad line (FAILFAST);
  never silently drop it (DROPMALFORMED).
- **Splittability**: uncompressed / bzip2 text splits by
  ``maxPartitionBytes`` like parquet; gzip does NOT (one whole file
  per task) — ship many medium gzip files, never one giant one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}


def _full_schema(schema: StructType | str) -> StructType:
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"files: schema already contains {CORRUPT_COL!r}"
        )
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def _split(
    parsed: DataFrame, data_cols: list[str], carry: Sequence[str] = ()
) -> tuple[DataFrame, DataFrame]:
    clean = (
        parsed.where(F.col(f"p.{CORRUPT_COL}").isNull())
        .select(*[f"p.{c}" for c in data_cols], *carry)
    )
    dead = (
        parsed.where(F.col(f"p.{CORRUPT_COL}").isNotNull())
        .select(F.col(f"p.{CORRUPT_COL}").alias("raw_record"))
    )
    return clean, dead


def parse_jsonl_lines(
    lines: DataFrame, schema: StructType | str, carry: Sequence[str] = ()
) -> tuple[DataFrame, DataFrame]:
    """The shared JSONL parser over a ``value string`` line frame —
    one code path for the batch reader and the streaming file ingest
    (streaming/file_ingest.py), so their dead-letter semantics can
    never drift. Blank lines are skipped (not dead-lettered): trailing
    newlines are an artifact of file concatenation, not data.

    ``carry``: extra columns of ``lines`` (e.g. file provenance from
    ``_metadata``) passed through onto the CLEAN side unchanged; the
    dead side keeps its one-verbatim-column contract."""
    full = _full_schema(schema)
    data_cols = [f.name for f in full.fields[:-1]]
    kept = lines.where(F.trim(F.col("value")) != "")
    parsed = kept.select(
        F.from_json("value", full, _OPTS).alias("p"), *carry
    )
    return _split(parsed, data_cols, carry)


def read_jsonl(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines read → ``(clean, dead_letter)``.

    ``clean`` has exactly the caller's schema; ``dead_letter`` is one
    string column ``raw_record`` holding each malformed line verbatim.
    Multiline JSON is deliberately unsupported — a multiline document
    forces one task per file, the anti-pattern JSONL exists to avoid."""
    _full_schema(schema)          # validate before touching the path
    paths = [path] if isinstance(path, str) else list(path)
    return parse_jsonl_lines(spark.read.text(paths), schema)


def parse_csv_lines(
    lines: DataFrame,
    schema: StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
    carry: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """The shared CSV parser over a ``value string`` line frame — the
    :func:`parse_jsonl_lines` twin, shared by :func:`read_csv` and the
    streaming file ingest. Header lines (exact schema match) are
    dropped PER LINE, which is what makes headers safe under file
    splitting and multi-file micro-batches alike."""
    full = _full_schema(schema)
    data_cols = [f.name for f in full.fields[:-1]]
    kept = lines.where(F.trim(F.col("value")) != "")
    if header:
        kept = kept.where(F.col("value") != sep.join(data_cols))
    parsed = kept.select(
        F.from_csv("value", F.lit(_csv_ddl(full)), _OPTS).alias("p"),
        *carry,
    )
    return _split(parsed, data_cols, carry)


def read_csv(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV read → ``(clean, dead_letter)``, same contract as
    :func:`read_jsonl`.

    ``header=True`` drops lines exactly equal to the schema's own
    header (field names joined by ``sep``) — the text scan sees every
    file's header as a data line, and per-partition "first line"
    heuristics break under splitting. A file whose header does NOT
    match the declared schema dead-letters its header line loudly
    (names won't type-parse), which is the right failure for a
    drifted-schema delivery.

    Quoted fields containing the SEPARATOR parse fine; a quoted field
    containing a NEWLINE does not — the line scan splits it and both
    halves dead-letter (pinned in tests). That is the same trade the
    splittable path of Spark's native CSV reader makes (multiLine=true
    forces one task per file); data with embedded newlines belongs in
    JSONL. One knowable edge: with an ALL-STRING schema, a data row
    byte-identical to the header line is dropped as a header (with any
    non-string column the header can't type-parse as data, so the edge
    vanishes)."""
    _full_schema(schema)          # validate before touching the path
    paths = [path] if isinstance(path, str) else list(path)
    return parse_csv_lines(
        spark.read.text(paths), schema, header=header, sep=sep
    )


def _csv_ddl(schema: StructType) -> str:
    """DDL string for from_csv (which takes a schema literal)."""
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )


def write_jsonl(df: DataFrame, path: str, *, compression: str | None = None):
    """Write a frame as JSON-lines (the corpus export format). Gzip
    output is fine for EXPORT (downstream rereads split per-file —
    write enough files via the frame's partitioning); leave
    ``compression`` None when a splittable re-read matters."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
