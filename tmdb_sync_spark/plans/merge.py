"""Pure-Spark MERGE INTO (upsert) as a full-outer-join rewrite.

The reference's core write is ``update_one({id,_type}, {$set, $setOnInsert},
upsert=True)`` per document (``app/catalog/upsert.py:99-103``) — an N+1
read-modify-write loop. Here it is one set-oriented plan (SURVEY §2.3 J1,
§7 Phase 3): when Delta Lake is unavailable (this environment), MERGE is a
FULL OUTER join on the key columns plus per-column merge expressions.

Scale notes:
- Both sides shuffle once on the merge key; with a bucketed/partitioned
  target, rewrite only the partitions the source touches (partition-pruned
  MERGE) — the helper takes the already-pruned target.
- ``WHEN MATCHED / NOT MATCHED`` classification comes out as a
  ``merge_action`` column, giving the reference's inserted/updated counters
  (``app/sync_top.py:267-273``) via one ``groupBy(merge_action).count()``
  instead of per-row bookkeeping.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTION_COL = "merge_action"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    matched_update: Mapping[str, Column] | None = None,
    not_matched_insert: Mapping[str, Column] | None = None,
    with_action: bool = False,
) -> DataFrame:
    """Compute the post-MERGE state of ``target`` upserted with ``source``.

    - ``matched_update``: output column -> expression over aliases ``t``/``s``
      applied when the key matches (default: take ``s``'s value if the
      column exists in source, else keep ``t``'s — Mongo ``$set`` semantics).
    - ``not_matched_insert``: expressions for source-only rows (default:
      ``s``'s value, NULL for target-only columns — ``$setOnInsert``).
    - ``with_action``: append 'update' | 'insert' | 'noop' per row.

    Rows present only in the target pass through unchanged. Key columns are
    assumed non-null (the reference's ``(id,_type)`` unique index).
    """
    matched_update = dict(matched_update or {})
    not_matched_insert = dict(not_matched_insert or {})
    t, s = target.alias("t"), source.alias("s")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
    )
    joined = t.join(s, cond, "full_outer")
    t_exists = F.col(f"t.{keys[0]}").isNotNull()
    s_exists = F.col(f"s.{keys[0]}").isNotNull()

    out: list[Column] = []
    for c in target.columns:
        in_source = c in source.columns
        upd = matched_update.get(
            c, F.col(f"s.{c}") if in_source else F.col(f"t.{c}")
        )
        ins = not_matched_insert.get(
            c, F.col(f"s.{c}") if in_source else F.lit(None)
        )
        out.append(
            F.when(t_exists & s_exists, upd)
            .when(t_exists, F.col(f"t.{c}"))
            .otherwise(ins)
            .alias(c)
        )
    if with_action:
        out.append(
            F.when(~t_exists, F.lit("insert"))
            .when(~s_exists, F.lit("noop"))
            .otherwise(F.lit("update"))
            .alias(ACTION_COL)
        )
    return joined.select(*out)
