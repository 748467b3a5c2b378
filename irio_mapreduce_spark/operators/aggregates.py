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


def frequent_items(
    df: DataFrame,
    item_col: str,
    threshold_den: int,
    mg_counters: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters: every item whose count exceeds ``N /
    threshold_den`` (strictly: ``cnt * threshold_den > N``, kept in
    integer arithmetic), found with a **Misra–Gries sketch + exact
    verify** two-pass. Returns ``(item, cnt)``.

    Pass 1 runs a Misra–Gries summary with ``mg_counters`` counters
    (default ``2·threshold_den``) independently over every partition
    (``mapInPandas`` — one dict per partition, Arrow-batched, no shuffle)
    and emits only the surviving candidate items. The MG guarantee
    composes across partitions by an averaging argument: if an item's
    GLOBAL count exceeds ``N/(c+1)`` with ``c`` counters, its count in at
    least one partition exceeds that partition's ``n_p/(c+1)``, so it
    survives there — the union of partition survivors is a SUPERSET of
    the true heavy hitters (never a miss), at most ``partitions · c``
    rows of noise. Pass 2 computes exact counts for candidates only
    (broadcast semi-join, one aggregation keyed by the candidate set) and
    applies the integer threshold — so the OUTPUT is exact and
    partitioning-invariant even though the sketch contents are not.
    ``item_col`` must be a string column (the sketch schema is pinned to
    ``item string``); cast injectively first for other types.

    Why this beats one global groupBy at 100 TB: a full word count
    shuffles one row per DISTINCT item (billions of keys for web-scale
    token streams, dominated by the long tail that can never pass the
    threshold). Here the shuffle carries only ``partitions · c``
    candidate keys plus their per-partition partial counts — the tail
    dies in the map stage. ``threshold_den`` must satisfy
    ``mg_counters + 1 >= threshold_den`` or pass 1 could drop a true
    heavy hitter (enforced).
    """
    import pandas as pd

    c = mg_counters if mg_counters is not None else 2 * threshold_den
    if c + 1 < threshold_den:
        raise ValueError(
            f"mg_counters={c} cannot guarantee threshold N/{threshold_den}: "
            f"need mg_counters + 1 >= threshold_den"
        )
    items = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for it in pdf["item"]:
                if it in counters:
                    counters[it] += 1
                elif len(counters) < c:
                    counters[it] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"item": list(counters.keys())})

    candidates = items.mapInPandas(mg, schema="item string").distinct()
    n_df = items.agg(F.count("*").alias("_n"))
    exact = (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.join(F.broadcast(n_df))
        .filter(F.col("cnt") * threshold_den > F.col("_n"))
        .select("item", F.col("cnt").cast("long").alias("cnt"))
    )
