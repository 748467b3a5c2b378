"""User-defined function surface (SURVEY.md §2.2 "UDF / UDAF / UDTF").

The reference's entire user-code model is external binaries
(``mr-bins/map/map.cpp``, ``mr-bins/reduce/reduce.cpp``); the Spark-native
equivalents, in descending preference order:

1. built-in ``pyspark.sql.functions`` (JVM, codegen) — always first choice;
2. Arrow-vectorized ``pandas_udf`` (Series->Series scalar, GROUPED_AGG) and
   ``applyInPandas`` grouped-map — this package;
3. row-at-a-time ``F.udf`` — demonstrated, documented as the slow path;
4. ``RDD.pipe`` external binaries — pipeline.py (bit-compatible with the
   reference's fork/exec contract).
"""

from irio_mapreduce_spark.functions.udfs import (  # noqa: F401
    normalize_by_group,
    priority_code_udf,
    taxed_price_pandas,
    weighted_avg_grouped_agg,
)
