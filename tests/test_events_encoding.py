"""events.ts on-disk encoding portability (io.table / events_ts_norm).

The driver regenerates /root/testdata between rounds and has shipped the
events table with two different parquet encodings of ``ts`` so far:
TIMESTAMP(NANOS) (unreadable by Spark's vectorized reader without
``nanosAsLong`` + manual µs truncation) and plain TIMESTAMP(MICROS)
(which loads as TIMESTAMP_NTZ). ``io.table`` must normalize BOTH to the
same session-zone TimestampType values, or every events-backed query —
batch and streaming — breaks on the next regeneration.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from tmdb_sync_spark.io import table

# nanosecond payload whose sub-µs tail (…789) must truncate identically
# on the nanos-as-long path (div 1000) and in a µs rewrite
_NS_VALUES = [1_767_330_245_123_456_789, 1_767_333_845_000_000_000]
_EXPECTED = [
    dt.datetime(2026, 1, 2, 5, 4, 5, 123456),
    dt.datetime(2026, 1, 2, 6, 4, 5, 0),
]


def _write_events(dirpath: str, ts_array: pa.Array) -> str:
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "value": pa.array([1.5, 2.5], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(dirpath, "events.parquet"), version="2.6")
    return dirpath


@pytest.mark.parametrize(
    "unit", ["ns", "us"], ids=["timestamp-nanos", "timestamp-micros"]
)
def test_table_normalizes_either_ts_encoding(spark, tmp_path, unit):
    arr = pa.array(
        [v // (1 if unit == "ns" else 1000) for v in _NS_VALUES],
        pa.timestamp(unit),
    )
    sf_dir = _write_events(str(tmp_path), arr)
    written = pq.read_schema(os.path.join(sf_dir, "events.parquet"))
    assert str(written.field("ts").type) == f"timestamp[{unit}]"

    df = table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == _EXPECTED


def test_micros_events_do_not_set_nanos_conf(spark, tmp_path):
    """The session-global nanosAsLong conf is consulted again at query
    EXECUTION, so it cannot be scoped set-read-restore — instead it must
    only be SET when the footer actually says NANOS. A MICROS table read
    on a fresh session leaves the conf untouched."""
    arr = pa.array([v // 1000 for v in _NS_VALUES], pa.timestamp("us"))
    sf_dir = _write_events(str(tmp_path), arr)
    sub = spark.newSession()
    df = table(sub, sf_dir, "events")
    assert [r.ts for r in df.orderBy("event_id").select("ts").collect()] \
        == _EXPECTED
    assert sub.conf.get(
        "spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
