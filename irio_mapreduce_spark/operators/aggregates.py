"""Aggregation helpers beyond plain ``groupBy().agg()``.

Plain grouped aggregation already gets map-side partial aggregation from
Catalyst (the reference's reducers see the full shuffled stream instead,
``ReduceProcessor.java:24-52`` — strictly more shuffle traffic). What needs
engine code is the *skewed* case: one hot key overwhelming a single reduce
partition. AQE's skew-join splitting handles joins; for aggregations whose
per-key state is large (``collect_list``-like, exact distincts), two-phase
salting below is the scale path (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    Phase 1 groups by ``(keys..., salt)``, spreading a hot key over up to
    ``n_salts`` reducers; phase 2 re-groups by ``keys`` to merge the
    partials. ``partial_aggs`` run in phase 1 and must be decomposable
    (sum/count/min/max/...); ``final_aggs`` merge them by the phase-1 output
    column names.

    The salt is ``spark_partition_id() % n_salts`` — deterministic under
    task retry and speculation (a re-executed task keeps its partition
    index), unlike ``monotonically_increasing_id``/``rand`` which can
    re-salt rows differently mid-retry and lose or duplicate partials
    (SPARK-23207-style). A hot key is spread across however many input
    partitions it occupies, which is exactly the parallelism available.

    Example::

        salted_agg(li, ["l_returnflag"],
                   [F.sum("l_quantity").alias("s"), F.count("*").alias("c")],
                   [F.sum("s").alias("sum_qty"), F.sum("c").alias("cnt")])
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)
