"""UDF/UDAF catalog queries (SURVEY.md §2.2 "UDF / UDAF / UDTF") — each
Python-UDF mechanism proven against a DuckDB oracle stating the same
semantics in SQL. The external-binary mechanism (``RDD.pipe``) is covered
by tests/test_pipeline.py against the reference's e2e contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.functions import (
    normalize_by_group,
    taxed_price_pandas,
    weighted_avg_grouped_agg,
)
from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.queries.catalog import register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_extendedprice * (1 + l_tax)), 2) AS total_taxed
    FROM lineitem WHERE l_orderkey % 41 = 0
    GROUP BY l_linestatus
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized Series->Series pandas UDF in a projection, then a
    built-in aggregate over its output."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 41 == 0)
    taxed = li.withColumn(
        "taxed", taxed_price_pandas(F.col("l_extendedprice"), F.col("l_tax"))
    )
    return taxed.groupBy("l_linestatus").agg(
        F.round(F.sum("taxed"), 2).alias("total_taxed")
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the reference reduce-binary analog
    (``reduce.cpp:9-40``): one scalar per group from the group's columns."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg_grouped_agg(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("w_avg_price")
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  * (count(*) OVER (PARTITION BY o_custkey))
                - (sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   OVER (PARTITION BY o_custkey)) AS BIGINT) AS dev
    FROM orders
    WHERE o_custkey % 151 = 0
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (per-customer mean-centering, in
    exact cents-scaled integer form — see functions.normalize_by_group for
    why) — the oracle states the same thing as window aggregates, which is
    also the correct built-in at scale (one shuffle, no per-group pandas
    frames)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 151 == 0)
    return normalize_by_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"), ["o_custkey"], "o_totalprice"
    ).select("o_orderkey", "dev")


@register(
    "udf_python_udtf",
    oracle="""
    SELECT w AS word, length(w) AS wlen, count(*) AS n
    FROM (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                    t -> t <> '')) AS w
          FROM documents WHERE doc_id % 29 = 0)
    GROUP BY w
    """,
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (1 row -> N rows, the table-function analog of a map
    binary emitting many lines, reference R2): tokenize each document into
    (word, wlen) rows, then aggregate. The lateral-join shape is
    ``F.udtf`` + ``lateralJoin``; built-in explode remains the fast path
    for anything expressible without Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, wlen int")
    class Tokenize:
        def eval(self, text: str):
            for w in (text or "").lower().split():
                if w:
                    yield w, len(w)

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 0)
    words = docs.lateralJoin(Tokenize(F.col("text").outer()))
    return words.groupBy("word").agg(
        F.max("wlen").alias("wlen"), F.count("*").alias("n")
    )


# NB: udf_row_at_a_time (the documented row-UDF slow-path demo) lives in
# slowpath_q.py so it registers at the catalog tail, keeping this family's
# front-window slots for the vectorized surfaces above.
