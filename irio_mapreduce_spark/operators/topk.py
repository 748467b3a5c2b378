"""Top-k operators.

Global top-k: ``orderBy(...).limit(k)`` — Spark plans TakeOrderedAndProject
(per-partition heap + driver merge of k·P rows), never a full global sort.
Per-group top-k: ``row_number`` over a window — one shuffle on the group key.
Both need a *deterministic total order*: callers pass unique tie-break
columns, same stance as SURVEY.md §7 "key-sorted reduce output".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no global sort)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via ``row_number`` (dense per-group heap
    semantics; one shuffle on the group key)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)
