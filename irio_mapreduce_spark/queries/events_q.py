"""Event-table catalog queries: JSON over ``events.props`` (the column
exists precisely for this) and the batch forms of the streaming window
operators — tumbling, sliding, session — each oracle-checked against
DuckDB ``time_bucket`` / sessionization SQL. The streaming module
(irio_mapreduce_spark.streaming) runs the SAME shapes incrementally;
batch-equivalence is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table
from irio_mapreduce_spark.queries.catalog import register


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           count(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                      THEN NULL ELSE 1 END) AS n_missing_key
    FROM events
    GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props: get_json_object path extraction (hit
    and miss paths) + from_json into a typed struct, aggregated per event
    type. At scale prefer from_json once into a struct over repeated
    get_json_object calls — one parse instead of N."""
    e = read_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("p"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.col("p.k")), 4).alias("avg_k"),
        F.max(F.col("p.k")).alias("max_k"),
        F.count("missing").alias("n_missing_key"),
    )


@register(
    "events_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregate — the batch form of the streaming
    windowed agg (``F.window`` buckets are epoch-aligned, matching
    DuckDB ``time_bucket``)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH ex AS (
      SELECT unnest([
               to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)),
               to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 - 86400 AS BIGINT))
             ])::TIMESTAMP AS win_start,
             value
      FROM events)
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM ex GROUP BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2-day width, 1-day slide): every event lands in
    exactly two windows. Spark ``F.window(ts, "2 days", "1 day")`` is the
    declarative form; the oracle materializes the same two epoch-aligned
    window starts per event."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "total_value",
        )
    )


@register(
    "events_session_window",
    oracle="""
    WITH u AS (SELECT user_id, ts, value FROM events WHERE user_id % 101 = 0),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM u),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute gap) per user — Spark's
    ``session_window`` merges events whose gaps are < the timeout; the
    oracle is the classic lag/flag/cumsum sessionization. Batch form of
    the streaming session-window operator.

    Boundary semantics: a session window is END-EXCLUSIVE — an event at
    exactly ``prev_ts + 30min`` starts a NEW session, so the oracle's gap
    test is strict ``<`` (an ``<=`` would merge exactly-on-boundary events;
    latent on this corpus only because timestamps carry microsecond
    jitter)."""
    e = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 101 == 0)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )


@register(
    "events_multires_rollup",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 2) AS total_value,
           round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) / count(*), 6)
             AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style MULTI-RESOLUTION rollup: the daily aggregate is
    built FROM the hourly partial aggregates, not from raw events —
    count/sum are mergeable partials (avg is derived at the end from the
    merged sums, never averaged-of-averages). This is the continuous-
    aggregate maintenance pattern: at 100 TB the hourly rollup is the
    materialized artifact and coarser resolutions re-aggregate it, paying
    |hours| input rows instead of |events|. The oracle computes the daily
    directly from raw events, so the hash-match proves the partial-merge
    path is lossless. DECIMAL(38,10) accumulation on both sides keeps the
    double rounding partition-merge-order-proof (the hourly stage makes
    merge order differ from a direct daily sum by construction)."""
    e = read_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    hourly = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(dec)).alias("sum_value"),
    )
    daily = hourly.groupBy(
        F.date_format(F.window(F.col("w.start"), "1 day").start, "yyyy-MM-dd").alias(
            "day"
        ),
        "event_type",
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_dec"),
    )
    return daily.select(
        "day",
        "event_type",
        "n",
        F.round(F.col("sum_dec").cast("double"), 2).alias("total_value"),
        F.round(F.col("sum_dec").cast("double") / F.col("n"), 6).alias("avg_value"),
    )
