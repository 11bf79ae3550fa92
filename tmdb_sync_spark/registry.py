"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- (usually) a matching ANSI-SQL oracle string for DuckDB.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over these
dicts. Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.

Cross-engine determinism rules used throughout (see SURVEY.md §5):
- Money/decimal aggregates: cast inputs to DECIMAL before SUM (exact,
  order-independent), cast the final result to DOUBLE. Never sum raw
  doubles across rows.
- Ratios: one DOUBLE division of exact operands (IEEE754-deterministic).
- Arrays: never hash raw arrays; emit ``array_join(array_sort(...))``
  canonical strings on both sides.
- Pagination: total order with a unique key tiebreak.
- Hashes: md5 only (identical across Spark/DuckDB); never engine-native
  ``hash()``.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable:
    """Decorator: register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Callable) -> Callable:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        fn.__query_name__ = name
        return fn

    return deco
