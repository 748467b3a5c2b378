"""Shared exact-moment statistics operators.

The repeated shape (r10 review finding): Pearson-style correlation on
integer-valued columns via exact BIGINT moments, finished with a fixed
sequence of correctly-rounded IEEE ops (* − / sqrt — no transcendentals),
so the unrounded DOUBLE hash-matches DuckDB computing the same expression
tree. Used by ``stats_spearman_rank`` (on doubled midranks),
``events_acf_multilag`` (per-lag), and ``graph_degree_assortativity``
(edge-endpoint degrees); the DuckDB side of each entry spells out the
identical SQL.

Reference parity: this is the two-pass-free "distribute integer moments,
finish with scalar math" reduce shape the reference's reduce binaries
express imperatively (``mr-bins/reduce/reduce.cpp:22-29``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pearson_exact(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact-moment Pearson correlation of integer columns ``x``/``y``
    (optionally per group): one map-side-partial aggregate to BIGINT
    moments, then ``r = (n·Sxy − SxSy) / (sqrt(n·Sxx − Sx²)·sqrt(n·Syy −
    Sy²))`` as correctly-rounded IEEE ops on exactly-cast moments.

    Returns columns ``group_cols + (n, num, den_x, den_y, r)`` with
    ``r`` NULL (never an ANSI DIVIDE_BY_ZERO) when either variance is
    degenerate — the guard was present in only 2 of the 3 former copies.

    Caller contract: all |moment| values must stay below 2^63 (BIGINT)
    and the final products below double range — integer inputs after a
    domain-compacting pre-aggregation, per the catalog conventions.
    """
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(F.col(x) * F.col(y)).cast("long").alias("sxy"),
        F.sum(F.col(x) * F.col(x)).cast("long").alias("sxx"),
        F.sum(F.col(y) * F.col(y)).cast("long").alias("syy"),
    ]
    mom = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
    num: Column = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("long")
    den_x: Column = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("long")
    den_y: Column = (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("long")
    r = F.when(
        (den_x == 0) | (den_y == 0), F.lit(None).cast("double")
    ).otherwise(
        num.cast("double")
        / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double")))
    )
    return mom.select(
        *group_cols,
        "n",
        num.alias("num"),
        den_x.alias("den_x"),
        den_y.alias("den_y"),
        r.alias("r"),
    )
