"""Python UDF/UDAF implementations — the Spark-native analog of the
reference's map/reduce binaries (``mr-bins/map/map.cpp:6-27``,
``mr-bins/reduce/reduce.cpp:9-40``).

All semantics here are deliberately SQL-expressible so the driver's DuckDB
oracle can hash-check the results (queries/udf_q.py): the point of these
entries is proving the UDF *machinery* (Arrow batching, grouped-agg state,
grouped-map schema contracts), not inventing non-relational logic.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType


@pandas_udf(DoubleType())
def taxed_price_pandas(price: pd.Series, tax: pd.Series) -> pd.Series:
    """Series->Series scalar pandas UDF (Arrow-vectorized): price after
    tax. ~10-100x faster than a row-at-a-time F.udf — each call processes
    a whole Arrow batch with numpy arithmetic."""
    return price * (1.0 + tax)


@pandas_udf(DoubleType())
def weighted_avg_grouped_agg(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (the reduce-binary analog): quantity-weighted
    mean price. Spark feeds each group's full columns as pandas Series;
    the return is the group's scalar."""
    denom = qty.sum()
    return float((price * qty).sum() / denom) if denom else float("nan")


def normalize_by_group(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Grouped-map via ``applyInPandas``: per-group mean-centering as EXACT
    integer arithmetic — ``dev`` = value-in-cents x group size minus the
    group's cent total (i.e. the mean-deviation scaled by 100·n). Output
    schema = input + ``dev`` (bigint).

    Why scaled integers and not ``value - mean``: 2-decimal money values
    make raw deviations land EXACTLY on decimal rounding boundaries
    whenever the group size divides a power of ten times two, so the two
    engines' float summation noise flips the rounded digit in either
    direction — a systematic oracle-hash hazard, observed at sf0.1.
    Integer math is bit-exact in both engines at any scale.

    NOTE the scale contract of grouped-map: one pandas frame PER GROUP must
    fit in executor memory — correct for bounded groups (per-customer,
    per-session), wrong for whole-partition-sized groups; use window
    functions for those (as subq_orders_vs_customer_avg does).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    # Copy, don't df.schema.add(...): add() mutates the DataFrame's CACHED
    # schema object, corrupting df.columns with the not-yet-existing field.
    schema = StructType(list(df.schema.fields) + [StructField("dev", LongType())])

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf[value_col] * 100).round().astype("int64")
        return pdf.assign(dev=cents * len(pdf) - cents.sum())

    return df.groupBy(*keys).applyInPandas(norm, schema=schema)


@F.udf(StringType())
def priority_code_udf(priority: str) -> str:
    """Row-at-a-time Python UDF — the SLOW path (per-row Python round
    trip), present to declare the surface; any real pipeline should write
    this as a built-in expression (substring/split)."""
    return priority.split("-", 1)[0] if priority else None


def month_surcharge_iter_udf():
    """SCALAR_ITER pandas UDF (Iterator[batches] -> Iterator[Series]) —
    the variant whose POINT is per-executor-task initialization: the
    function body runs ONCE per Arrow-batch iterator, so expensive state
    (a model, a tokenizer, a lookup table) loads once per task and every
    batch streams through it — where a plain SCALAR UDF would re-enter
    per batch with no place to hold state. Here the "model" is a
    12-entry integer surcharge table built before the loop — the
    deterministic stand-in for a real model load. Returned as a factory
    so importing this module never constructs the UDF for sessions that
    don't use it."""
    @pandas_udf("long")
    def month_surcharge(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # once-per-iterator "model load"
        factors = [100 + 3 * m for m in range(1, 13)]
        for month, qty in batches:
            yield (
                qty.astype("int64")
                * month.astype("int64").map(lambda m: factors[m - 1])
            )

    return month_surcharge


@pandas_udf(DoubleType())
def running_wavg_milli(cents: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDF used OVER A WINDOW FRAME
    (queries/udf_q.py:udf_pandas_agg_over_window): running quantity-
    weighted average price in exact fixed-point — int64 sums inside the
    UDF, floor-scaled x1000, so the DOUBLE return value is an exactly
    representable integer and the driver hash matches DuckDB's integer
    window form bit-for-bit."""
    return float(int((cents * qty).sum()) * 1000 // int(qty.sum()))
