"""irio_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce system (adamgreloch/irio-mapreduce, surveyed in
/root/repo/SURVEY.md), re-expressed Spark-first:

* ``session``    — SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
* ``io``         — dataset catalog + parquet/csv/json/text readers/writers.
* ``pipeline``   — the reference's Batch-proto pipeline API
                   (map-chain -> hash-partition -> reduce-chain) on DataFrames,
                   plus an ``rdd.pipe`` external-binary compatibility mode.
* ``operators``  — relational operators: joins (incl. as-of / range),
                   aggregates (incl. salted), windows, set ops, sort/top-k.
* ``functions``  — scalar function families: text, vectors, hashing.
* ``llm``        — training-data pipeline ops: dedup (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard), similarity search, quality
                   scoring, multimodal column plumbing.
* ``streaming``  — Structured Streaming surface over the ``events`` table.
* ``queries``    — the declared, oracle-checked query catalog
                   (one entry per SURVEY.md §2 obligation).

Design stance (SURVEY.md §4): Catalyst/Tungsten/AQE supply the optimizer and
physical execution; this package declares plans with the DataFrame/SQL API and
drops to Arrow-vectorized pandas UDFs only where built-ins cannot express the
semantics. No RDD code outside the external-binary ``pipe`` compatibility path.
"""

__version__ = "0.1.0"

from irio_mapreduce_spark.session import get_spark  # noqa: F401
