#!/usr/bin/env python3
"""Capture .explain('formatted') for every declared query into
plans/r13/<stage>/ (stage = before|after, argv[1]).

Same session shape as bench.py (engine session factory, local[32]) so
plan shapes match what the bench executes. Queries that execute work at
construction (streaming drains, winnow checkpoints, components fixpoint)
run that work here — the captured plan is the returned frame's, exactly
as in r12's plan dumps.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r13", STAGE,
)


def main() -> None:
    from tmdb_sync_spark.session import get_spark

    spark = get_spark("r13-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT, exist_ok=True)
    names = ONLY or sorted(QUERIES)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        print(f"captured {name} ({len(txt)} chars)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
