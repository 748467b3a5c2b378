"""Pipeline-API queries: the reference's flagship MapReduce computation
(wordcount, ``mr-bins/map/map.cpp`` + ``mr-bins/reduce/reduce.cpp``) run
through :mod:`irio_mapreduce_spark.pipeline` on the ``documents`` table,
oracle-checked against DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import table_path
from irio_mapreduce_spark.pipeline import BatchSpec, submit_batch
from irio_mapreduce_spark.queries.catalog import register


@register(
    "mr_wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordcount over documents.text via the Batch pipeline API — exercises
    scan -> map chain -> hash partition -> reduce -> (no sink), i.e. every
    reference operator R1-R7 (SURVEY.md §2.1)."""
    spec = BatchSpec(
        input_path=table_path(sf_dir, "documents"),
        input_format="parquet",
        map_fns=[
            lambda df: df.select(
                F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
            ).filter(F.col("word") != "")
        ],
        partition_key="word",
        r_num=8,
        reduce_agg=[F.count("*").alias("cnt")],
    )
    return submit_batch(spark, spec)


@register(
    "mr_wordcount_top20",
    tail=True,  # variant of mr_wordcount, which holds the window slot
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def mr_wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over the pipeline result (TakeOrdered — no global sort)."""
    return (
        mr_wordcount(spark, sf_dir)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(20)
    )
