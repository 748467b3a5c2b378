"""MERGE / upsert (SCD Type 1) as one full-outer join — the incremental
corpus-maintenance primitive (daily re-crawl upserting into a standing
document store; metadata corrections flowing into a fact table). Spark's
SQL ``MERGE INTO`` needs a v2 transactional catalog; over plain
parquet/object-store tables the same semantics are this single declarative
join, which Catalyst/AQE then shuffle-plans (skew-splits, bucketed
co-location if both sides are bucketed on the key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    action_col: str = "action",
) -> DataFrame:
    """SCD1 source-wins merge: every key in ``source`` inserts or
    overwrites its ``target`` row; unmatched target rows pass through.
    Both inputs must share the same schema. Returns the merged table plus
    an ``action`` column labeling each output row:

    * ``insert`` — key only in source;
    * ``update`` — key in both, at least one non-key column differs
      (null-safe comparison);
    * ``unchanged`` — key in both, all columns equal (source copy kept —
      identical by definition);
    * ``keep`` — key only in target.

    Scale shape: ONE full-outer shuffle join on the key — the irreducible
    cost of a merge; there is no per-row driver logic, no second pass for
    the action labels (they fall out of the same join's null pattern), and
    the value columns ride the join instead of being re-fetched. With both
    sides bucketed on the key the exchange disappears entirely
    (tests/test_bucketing.py demonstrates the plan); at 100 TB the source
    is typically small relative to target, and AQE picks the cheaper side
    to stream.

    The action split is exactly the reference's batch-update topology
    (map: tag origin / reduce: pick winner per key) expressed as one
    declarative join.
    """
    if target.columns != source.columns:
        raise ValueError(
            f"merge_upsert requires identical schemas; "
            f"target={target.columns} source={source.columns}"
        )
    value_cols = [c for c in target.columns if c not in key_cols]
    # Presence markers, not key-null checks: a NULL-keyed row must still
    # be detected as present on its own side (NULL keys never join-match,
    # so a NULL-keyed source row is an 'insert', not a mislabeled 'keep').
    t = target.select(
        F.lit(True).alias("_t_present"),
        *[F.col(c).alias(f"_t_{c}") for c in target.columns],
    )
    s = source.select(
        F.lit(True).alias("_s_present"),
        *[F.col(c).alias(f"_s_{c}") for c in source.columns],
    )
    cond: Column = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"_t_{k}") == F.col(f"_s_{k}"))
    joined = t.join(s, cond, "full_outer")
    in_t = F.col("_t_present").isNotNull()
    in_s = F.col("_s_present").isNotNull()
    same: Column = F.lit(True)
    for c in value_cols:
        same = same & F.col(f"_t_{c}").eqNullSafe(F.col(f"_s_{c}"))
    action = (
        F.when(in_t & in_s & same, F.lit("unchanged"))
        .when(in_t & in_s, F.lit("update"))
        .when(in_s, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    # Source WINS when present — including a source NULL overwriting a
    # target value (coalesce would silently resurrect the old value).
    merged = [
        F.when(in_s, F.col(f"_s_{c}")).otherwise(F.col(f"_t_{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*merged, action.alias(action_col))
