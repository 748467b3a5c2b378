"""Deliberate slow-path demos, registered at the catalog TAIL (after
``relational`` — see queries/__init__.py order note): these entries exist
to declare and document anti-pattern surfaces, not to represent an operator
family, so they yield their front-window slot to first-class operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.functions.udfs import priority_code_udf
from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.queries.catalog import register


@register(
    "udf_row_at_a_time",
    oracle="""
    SELECT string_split(o_orderpriority, '-')[1] AS code, count(*) AS n
    FROM orders GROUP BY code
    """,
)
def udf_row_at_a_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time F.udf — declared surface, documented slow path (the
    per-row Python round trip breaks codegen; the oracle shows the
    built-in equivalent)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(priority_code_udf(F.col("o_orderpriority")).alias("code")).groupBy(
        "code"
    ).agg(F.count("*").alias("n"))
