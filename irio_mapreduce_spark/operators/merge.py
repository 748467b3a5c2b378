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


def _assert_unique_keys(df: DataFrame, key_cols: list[str], side: str) -> DataFrame:
    """In-plan uniqueness guard: raise on the first duplicated key tuple.

    ``count(*) over (partition by key)`` + ``assert_true`` keeps the check
    fully distributed (no driver collect, no separate count job) and
    short-circuits the job at the first offending partition. NULL keys are
    exempt: NULL never join-matches, so duplicate NULL-keyed rows cannot
    fan out (each becomes its own insert/keep row, same as SQL MERGE).
    """
    from pyspark.sql import Window

    key_null = F.lit(False)
    for k in key_cols:
        key_null = key_null | F.col(k).isNull()
    n_over_key = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    guard = F.assert_true(
        key_null | (F.col("_key_n") == 1),
        F.concat(
            F.lit(f"merge_upsert: duplicate key in {side} for ("),
            F.concat_ws(", ", *[F.col(k).cast("string") for k in key_cols]),
            F.lit(")"),
        ),
    )
    # The guard lives in a FILTER (assert_true yields NULL on success, so
    # isNull() keeps every row) — a merely-projected-then-dropped column
    # would be pruned by Catalyst and never evaluate.
    return (
        df.withColumn("_key_n", n_over_key)
        .filter(guard.isNull())
        .drop("_key_n")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    action_col: str = "action",
    check_duplicate_keys: bool = False,
) -> DataFrame:
    """SCD1 source-wins merge: every key in ``source`` inserts or
    overwrites its ``target`` row; unmatched target rows pass through.
    Both inputs must share the same schema.

    PRECONDITION: ``key_cols`` uniquely identify rows on BOTH sides.
    Duplicate keys on either side fan out through the full-outer join and
    produce a multi-row "merge" where SQL ``MERGE`` would raise
    ``Multiple source rows matched``. With ``check_duplicate_keys=True``
    the plan itself enforces this: a per-key ``count(*) over (partition
    by key)`` guard on each side raises mid-job on the first duplicate.
    The guard's window hash-partitions by the same key the join shuffles
    on, so it adds no NEW exchange under AQE-reused partitioning, but it
    does add a per-side sort — off by default for trusted inputs (e.g.
    the catalog entry, whose inputs are keyed tables).

    Returns the merged table plus an ``action`` column labeling each
    output row:

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
    if check_duplicate_keys:
        target = _assert_unique_keys(target, key_cols, "target")
        source = _assert_unique_keys(source, key_cols, "source")
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
