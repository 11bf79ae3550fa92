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

# Rotated OUT of the 50-entry driver window (round-8 rotation: the
# window is a budget, and redundant/trivial entries were spending slots
# the trainer-pipeline operators needed — r7 verdict top item). Retired
# queries keep their oracle and run in the LOCAL parity gate
# (tests/test_oracle_parity.py) at exactly the registered bar; they are
# simply not part of __spark_entry__'s driver contract anymore.
RETIRED_QUERIES: dict[str, Callable[..., Any]] = {}
RETIRED_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable:
    """Decorator: register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Callable) -> Callable:
        if name in QUERIES or name in RETIRED_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        fn.__query_name__ = name
        return fn

    return deco


def register_retired(name: str, oracle: str | None = None) -> Callable:
    """Like :func:`register`, but into the retired (local-parity-only)
    registry — the query stays implemented, tested, and oracle-checked;
    it just no longer occupies one of the driver's 50 slots."""

    def deco(fn: Callable) -> Callable:
        if name in QUERIES or name in RETIRED_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        RETIRED_QUERIES[name] = fn
        if oracle is not None:
            RETIRED_ORACLES[name] = textwrap.dedent(oracle).strip()
        fn.__query_name__ = name
        return fn

    return deco
