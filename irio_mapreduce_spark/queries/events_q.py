"""Event-table catalog queries: JSON over ``events.props`` (the column
exists precisely for this) and the batch forms of the streaming window
operators — tumbling, sliding, session — each oracle-checked against
DuckDB ``time_bucket`` / sessionization SQL. The streaming module
(irio_mapreduce_spark.streaming) runs the SAME shapes incrementally;
batch-equivalence is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2, any_value(s1.t1) AS t1
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click'
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s2.t2 AND e.ts <= s2.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s1) AS n_view,
           (SELECT count(*) FROM s2) AS n_click,
           (SELECT count(*) FROM s3) AS n_purchase,
           round(CAST((SELECT count(*) FROM s2) AS DOUBLE)
                 / (SELECT count(*) FROM s1), 6) AS click_rate,
           round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
                 / (SELECT count(*) FROM s1), 6) AS purchase_rate
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: view -> click -> purchase per user, each
    step strictly after the previous and within 7 days of the first view
    — the product-analytics staple the reference would run as three
    chained map/partition/reduce batches (one per stage, each feeding the
    next through ``final_dest_dir_id``).

    Stage k is a per-user MIN over events filtered by the stage-(k-1)
    timestamps — three aggregates all partitioned on user_id, so Spark
    reuses one hash partitioning across the chain; the per-stage user
    sets only ever shrink, and the stage outputs (one row per qualifying
    user) are broadcast back onto the events scan. At 100 TB the fact
    table is scanned once per stage with the stage filter pushed down
    (event_type is a scan predicate) — no self-join of raw events ever
    materializes. Final result is a single funnel row with conversion
    rates."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.any_value("t1").alias("t1"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count("*").alias("n_view"))
        .join(s2.agg(F.count("*").alias("n_click")))
        .join(s3.agg(F.count("*").alias("n_purchase")))
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        F.round(
            F.try_divide(F.col("n_click").cast("double"), F.col("n_view")), 6
        ).alias("click_rate"),
        F.round(
            F.try_divide(F.col("n_purchase").cast("double"), F.col("n_view")), 6
        ).alias("purchase_rate"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             time_bucket(INTERVAL 7 DAY, min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, time_bucket(INTERVAL 7 DAY, ts) AS week
      FROM events),
    joined AS (
      SELECT c.cohort_week, datediff('day', c.cohort_week, a.week) / 7 AS week_n,
             a.user_id
      FROM active a JOIN cohort c ON a.user_id = c.user_id),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM cohort GROUP BY cohort_week)
    SELECT strftime(j.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(j.week_n AS BIGINT) AS week_n,
           count(DISTINCT j.user_id) AS n_active,
           round(CAST(count(DISTINCT j.user_id) AS DOUBLE) / any_value(s.cohort_size), 6)
             AS retention
    FROM joined j JOIN sizes s ON j.cohort_week = s.cohort_week
    GROUP BY j.cohort_week, j.week_n
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the epoch-aligned week
    of their first event; each cell counts how many of that cohort were
    active ``week_n`` weeks later (week 0 = 100% by construction — the
    hash-check pins that invariant too).

    Week alignment: DuckDB's ``time_bucket(INTERVAL 7 DAY, ts)`` aligns
    to MONDAY (its multi-day origin is 2000-01-03), while Spark's
    ``F.window`` aligns to the 1970-01-01 epoch — a Thursday. The Spark
    side therefore passes ``startTime='4 days'`` (1970-01-05 was a
    Monday) so both engines bucket weeks Monday-to-Sunday.
    Plan: one distinct over (user, week) + one per-user min — both
    partition on user_id and reuse the exchange; the cohort dimension
    (#users rows) broadcasts onto the activity frame. At 100 TB the
    (user, week) distinct is the only wide state and it is exactly the
    active-users rollup a warehouse materializes anyway."""
    e = read_table(spark, sf_dir, "events")
    week = lambda c: F.window(c, "7 days", "7 days", "4 days").start  # noqa: E731
    # bucket AFTER aggregating: F.window injects an implicit ts-not-null
    # filter that is illegal over an aggregate expression
    cohort = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", week(F.col("first_ts")).alias("cohort_week"))
    )
    active = e.select("user_id", week(F.col("ts")).alias("week")).distinct()
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    joined = active.join(F.broadcast(cohort), "user_id").select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long").alias(
            "week_n"
        ),
        "user_id",
    )
    return (
        joined.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_n")
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.round(
                F.try_divide(
                    F.count_distinct("user_id").cast("double"),
                    F.any_value("cohort_size"),
                ),
                6,
            ).alias("retention"),
        )
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_n",
            "n_active",
            "retention",
        )
    )


@register(
    "events_daily_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS day,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS sum_dec
      FROM events GROUP BY 1, 2),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
    spine AS (
      SELECT s.user_id, unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS day
      FROM span s),
    joined AS (
      SELECT sp.user_id, sp.day, coalesce(d.n, 0) AS n,
             CAST(d.sum_dec AS DOUBLE) / d.n AS avg_raw
      FROM spine sp LEFT JOIN daily d
        ON d.user_id = sp.user_id AND d.day = sp.day)
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
           round(last_value(avg_raw IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS avg_value_ffill,
           (n = 0) AS is_gap
    FROM joined
    """,
)
def events_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per-user daily resample onto a dense
    date spine (generated per user from their first to last active day)
    with forward-fill of the daily mean across gap days — the
    prepare-for-modeling step every time-series pipeline needs and plain
    SQL engines make painful.

    The spine is ``explode(sequence(d0, d1, 1 day))`` off the per-user
    span — generated, never stored, and linear in output size. The
    left join back to the daily partials and the forward-fill window both
    partition on user_id, so the whole plan is one exchange of the
    (tiny) daily aggregate frame. Forward fill is ``last(ignorenulls)``
    over an unbounded-preceding row frame — no UDF, no driver loop.
    The daily mean divides a DECIMAL-exact sum by the day count once,
    before filling, so the copied values are bitwise-stable."""
    e = read_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    daily = e.groupBy(
        "user_id", F.window("ts", "1 day").start.alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(dec)).alias("sum_dec"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.try_divide(F.col("sum_dec").cast("double"), F.col("n")).alias("avg_raw"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(F.last("avg_raw", ignorenulls=True).over(w), 6).alias(
            "avg_value_ffill"
        ),
        (F.col("n") == 0).alias("is_gap"),
    )


@register(
    "events_type_change_intervals",
    oracle="""
    WITH u AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE user_id % 10 = 0),
    seq AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM u),
    changes AS (
      SELECT user_id, event_type, ts FROM seq
      WHERE prev_type IS NULL OR prev_type <> event_type),
    iv AS (
      SELECT user_id, event_type, ts AS vf,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS vt,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS change_seq
      FROM changes)
    SELECT user_id, event_type,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(vt, '%Y-%m-%d %H:%M:%S'),
                    '9999-01-01 00:00:00') AS valid_to,
           CAST(change_seq AS BIGINT) AS change_seq
    FROM iv
    """,
)
def events_type_change_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style change-interval reconstruction: collapse each user's
    event stream into [valid_from, valid_to) intervals of constant
    event_type — the slowly-changing-dimension history a warehouse
    maintains for point-in-time ("as of") queries (the open interval
    carries the far-future sentinel, the SCD2 convention).

    Change capture is lag-over-(user, time) != current; interval ends
    are lead over the change rows only. Both windows and the change
    filter share ONE user_id partitioning — Spark plans a single
    exchange for the whole reconstruction. Ordering ties are broken by
    event_id so the lag comparison is deterministic under jitter-free
    duplicate timestamps. At 100 TB this is the standard CDC-compaction
    pass: state per user is one open interval, and the incremental twin
    is ``streaming.ops.stateful_change_intervals``
    (applyInPandasWithState; closed-interval equivalence proven in
    tests/test_streaming.py)."""
    from pyspark.sql.window import Window

    e = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w_seq).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w_ch = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w_ch), "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-01-01 00:00:00"),
        ).alias("valid_to"),
        F.row_number().over(w_ch).cast("long").alias("change_seq"),
    )


@register(
    "events_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    islands AS (
      SELECT user_id,
             datediff('day', DATE '1970-01-01', d)
               - row_number() OVER (PARTITION BY user_id ORDER BY d)
               AS island
      FROM days),
    streaks AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS len
      FROM islands GROUP BY user_id, island)
    SELECT user_id,
           max(len) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id
    """,
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (plus streak count
    and total active days) — the classic GAPS-AND-ISLANDS shape: distinct
    active dates, then ``epoch_day - row_number`` is constant exactly
    within a consecutive run, so one grouping on that key measures every
    streak. Two shuffles total (distinct on (user, day), then the user
    window + the integer-key groupings share the user partitioning).
    All-integer output — exact at any scale. The engagement-continuity
    signal of behavioral curation (bot runs show as implausibly long
    streaks)."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        (F.datediff(F.col("d"), F.lit("1970-01-01")) - F.row_number().over(w)).alias(
            "island"
        ),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS vc,
             epoch_us(ts) AS t,
             epoch_us(lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS t_next
      FROM events WHERE user_id % 7 = 0),
    iv AS (SELECT user_id, vc, t_next - t AS dt
           FROM seq WHERE t_next IS NOT NULL AND t_next > t)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(vc * dt) AS BIGINT) // CAST(sum(dt) AS BIGINT)
             AS twap_cents
    FROM iv GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average value per user (each reading weighted by how
    long it was current — the telemetry/financial TWAP shape that a
    plain avg() silently gets wrong under irregular sampling). One user
    window for the lead(ts), then exact integer arithmetic end to end:
    cent-scaled values × MICROSECOND durations (``unix_micros`` /
    ``epoch_us`` — whole seconds diverge because DuckDB's ``epoch()``
    keeps the fractional part and the BIGINT cast rounds it while
    Spark's ``unix_timestamp`` truncates, found as a 1-cent mismatch),
    integer-division final ratio (both engines truncate toward zero).
    Zero-length intervals (duplicate timestamps) are excluded on BOTH
    sides, which also removes the only /0 risk. Overflow: |vc·dt_us| ≤
    4.9e4 · dt_us — exact below ~60 user-years per single gap and ~10^4
    user-years summed; switch the weight unit to ms/s for longer spans."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        F.unix_micros("ts").alias("t"),
        F.unix_micros(F.lead("ts").over(w)).alias("t_next"),
    )
    iv = seq.filter(
        F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t"))
    ).select("user_id", "vc", (F.col("t_next") - F.col("t")).alias("dt"))
    return iv.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.expr("sum(vc * dt) div sum(dt)").alias("twap_cents"),
    )


@register(
    "events_last_touch_attribution",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, ts,
             CAST(round(value * 100) AS BIGINT) AS vc,
             max(CASE WHEN event_type = 'click'
                      THEN epoch_us(ts) ELSE NULL END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_us
      FROM events),
    conv AS (
      SELECT user_id, event_id, vc, last_click_us,
             epoch_us(ts) AS t_us
      FROM seq WHERE event_type = 'purchase')
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(*) FILTER (
             last_click_us IS NOT NULL
             AND t_us - last_click_us <= CAST(604800000000 AS BIGINT))
             AS BIGINT) AS n_attributed,
           CAST(sum(CASE WHEN last_click_us IS NOT NULL
                          AND t_us - last_click_us <= CAST(604800000000 AS BIGINT)
                         THEN vc ELSE 0 END) AS BIGINT) AS attributed_cents
    FROM conv GROUP BY user_id
    """,
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH conversion attribution with a 7-day window: each
    purchase credits the user's most recent STRICTLY-PRECEDING click
    (a running conditional max over the per-user sequence — the as-of
    lookup expressed as one window, no join), summed per user in exact
    cents. The ROWS ... 1 PRECEDING frame keeps a same-timestamp click
    from attributing its own purchase; microsecond epoch arithmetic for
    the cutoff (the ``events_time_weighted_avg`` exactness note). One
    user_id exchange shared by the window and the final rollup. The
    marketing/causal twin of the purchase-funnel entry, and the window
    formulation beats the naive purchases⋈clicks range join (which
    fans out per (purchase, click) pair before re-aggregating)."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        F.unix_micros("ts").alias("t_us"),
        F.max(
            F.when(F.col("event_type") == "click", F.unix_micros("ts"))
        )
        .over(w)
        .alias("last_click_us"),
    )
    attributed = F.col("last_click_us").isNotNull() & (
        F.col("t_us") - F.col("last_click_us") <= 7 * 86400 * 1000000
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(attributed.cast("long")).cast("long").alias("n_attributed"),
            F.sum(F.when(attributed, F.col("vc")).otherwise(0))
            .cast("long")
            .alias("attributed_cents"),
        )
    )


@register(
    "events_cusum_drift",
    oracle="""
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL 1 DAY, ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, day),
    span AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1
      FROM daily GROUP BY event_type),
    spine AS (
      SELECT s.event_type,
             unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS day
      FROM span s),
    grid AS (
      SELECT sp.event_type, sp.day, coalesce(d.x, 0) AS x
      FROM spine sp LEFT JOIN daily d
        ON d.event_type = sp.event_type AND d.day = sp.day),
    tot AS (
      SELECT event_type, day, x,
             CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS t,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS d
      FROM grid),
    pre AS (
      SELECT event_type, day, x, t,
             CAST(sum(d * x - t) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS p
      FROM tot)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
           CAST(p - least(0, min(p) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             AS BIGINT) AS drift,
           CAST(p - least(0, min(p) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) > 2 * t
             AS INTEGER) AS alarm
    FROM pre
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection over per-type daily volumes — the change-point
    monitor a production ingest pipeline runs on its own telemetry. The
    textbook recursion ``S_t = max(0, S_{t-1} + (x_t - k))`` is not a
    window function, but it has a closed form that IS one:
    ``S_t = P_t - min(0, min_{j<=t} P_j)`` with ``P`` the prefix sum of
    ``(x_t - k)`` (the 0 term is the empty prefix — dropping it
    under-reports drift whenever the series starts above the reference
    level; caught by the identity grid test) — so the whole detector is
    two running windows over the
    gap-filled daily grid, no recursion, no UDF, no driver loop.

    Exactness: the reference level k is the mean daily count T/D —
    fractional, so everything is scaled by D (``P`` accumulates
    ``D*x - T``): all-integer, engine-exact at any scale (|P| <=
    D * total). The alarm rule ``drift > 2T`` (i.e., S > 2 days' mean
    volume in unscaled units) is an integer comparison. One exchange
    keys the daily aggregate by type; the spine is generated, never
    stored (``explode(sequence(...))``)."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.window("ts", "1 day").start.alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "event_type",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    grid = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    wt = Window.partitionBy("event_type")
    run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = grid.select(
        "event_type",
        "day",
        "x",
        F.sum("x").over(wt).cast("long").alias("t"),
        F.count("*").over(wt).cast("long").alias("d"),
    )
    pre = tot.withColumn(
        "p", F.sum(F.col("d") * F.col("x") - F.col("t")).over(run).cast("long")
    )
    drift = (F.col("p") - F.least(F.lit(0), F.min("p").over(run))).cast("long")
    return pre.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        drift.alias("drift"),
        (drift > 2 * F.col("t")).cast("int").alias("alarm"),
    )


@register(
    "events_path_triples",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT user_id, e1 || '>' || e2 || '>' || e3 AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
    counted AS (
      SELECT path,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM paths GROUP BY path)
    SELECT path, n, n_users FROM counted
    ORDER BY n DESC, path LIMIT 20
    """,
)
def events_path_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user JOURNEY triples (sequential path mining, the product-
    analytics 'what do users do next' query): each user's event stream in
    (ts, event_id) order — event_id is the unique tie-break, so
    same-timestamp events sequence deterministically — sliding a window of
    3 via two ``lead`` calls, then counting occurrences and distinct users
    per path. One window shuffle on user_id (sequences never leave their
    partition), one path aggregate, and a TakeOrdered top-k — no
    self-joins, no explosion beyond one row per event. The (n DESC, path)
    tie-break makes the LIMIT deterministic."""
    from irio_mapreduce_spark.operators.topk import top_k

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    counted = (
        seq.select(
            "user_id",
            F.concat_ws(">", "e1", "e2", "e3").alias("path"),
        )
        .groupBy("path")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
    return top_k(counted, [F.col("n").desc(), F.col("path")], 20)


@register(
    "events_ewma_fixed_point",
    oracle="""
    WITH pts AS (
      SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS t_us, event_id
      FROM events WHERE user_id % 17 = 0),
    lst AS (
      SELECT user_id, list(cents ORDER BY t_us, event_id) AS xs,
             CAST(count(*) AS BIGINT) AS n_events
      FROM pts GROUP BY user_id)
    SELECT user_id, n_events,
           CAST(list_reduce(xs, (acc, x) -> acc + (x - acc) // 4) AS BIGINT)
             AS ewma_cents
    FROM lst
    """,
)
def events_ewma_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIAL moving average as a FIXED-POINT integer fold: the
    recursive filter E_t = E_{t-1} + (x_t − E_{t-1}) div 4 (dyadic
    α = 1/4, E_0 = x_0) over each user's time-ordered cent-scaled values.
    Floats cannot cross the driver's exact-hash gate for a RECURSIVE
    statistic (error compounds per step and the engines' rounding paths
    differ); integer truncating division is bit-identical in both
    engines (Spark ``DIV`` and DuckDB ``//`` both truncate toward zero —
    probed on negatives, which (x − acc) regularly is).

    Shape: one grouped collect into a per-user ordered array, then a JVM
    higher-order ``aggregate`` fold — sequential per KEY (a recursive
    filter is inherently so) but embarrassingly parallel across users.
    Arrays are bounded by per-user event counts; for unbounded streams
    the same recurrence runs incrementally in the stateful streaming
    operator (the fold IS its state transition). DuckDB states the
    identical fold via ``list_reduce``, whose implicit init is the first
    element — the Spark side slices past element 1 to match."""
    pts = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 17 == 0
    ).select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    lst = pts.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("t_us", "event_id", "cents"))
        ).alias("seq"),
        F.count("*").cast("long").alias("n_events"),
    )
    return lst.select(
        "user_id",
        "n_events",
        F.expr(
            """
            aggregate(
              slice(transform(seq, s -> s.cents), 2, size(seq) - 1),
              element_at(transform(seq, s -> s.cents), 1),
              (acc, x) -> acc + (x - acc) DIV 4
            )
            """
        ).cast("long").alias("ewma_cents"),
    )


@register(
    "events_dynamic_session_gap",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN 2400000000 ELSE 1200000000 END AS g
      FROM events WHERE user_id % 19 = 0),
    seq AS (
      SELECT user_id, t, g,
             max(t + g) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end,
             event_id
      FROM pts),
    sid AS (
      SELECT user_id, t, g,
             sum(CASE WHEN prev_end IS NULL OR t >= prev_end
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS s
      FROM seq)
    SELECT user_id,
           CAST(min(t) AS BIGINT) AS start_us,
           CAST(max(t + g) AS BIGINT) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sid GROUP BY user_id, s
    """,
)
def events_dynamic_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap sessionization: ``session_window`` with a PER-EVENT
    gap expression (purchases hold a session open 40 minutes, everything
    else 20) — the engagement-dependent timeout the static 30-minute
    entry can't express. Semantics: each event spans [ts, ts+gap);
    overlapping spans merge; the session END is the max span end (not
    last-event + constant), and an event landing exactly on the running
    end starts a NEW session (end-exclusive, same as static windows —
    the oracle's ``t >= prev_end`` break test).

    The oracle derives the same sessions from first principles: running
    max of span ends over the (key, time) order, break flags, cumulative
    session ids, then per-session aggregates — an independent
    formulation, so a hash match pins Spark's merge semantics, not just
    its output shape. Same one-shuffle (key, time) plan as the static
    entry; the streaming form runs identically with a watermark."""
    e = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 19 == 0)
    gap = F.when(F.col("event_type") == "purchase", F.lit("40 minutes")).otherwise(
        F.lit("20 minutes")
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("start_us"),
            F.unix_micros("w.end").alias("end_us"),
            "n_events",
        )
    )


@register(
    "events_holt_linear_fixed_point",
    oracle="""
    WITH pts AS (
      SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS t_us, event_id
      FROM events WHERE user_id % 23 = 0),
    lst AS (
      SELECT user_id, list(cents ORDER BY t_us, event_id) AS xs,
             CAST(count(*) AS BIGINT) AS n_events
      FROM pts GROUP BY user_id),
    fold AS (
      SELECT user_id, n_events,
             list_reduce(
               list_transform(xs, x -> (x + 536870912) * 2147483648 + 536870912),
               (acc, x) -> ((acc // 2147483648 - 536870912) + (acc % 2147483648 - 536870912) + (((x // 2147483648 - 536870912) - (acc // 2147483648 - 536870912) - (acc % 2147483648 - 536870912)) // 4) + 536870912) * 2147483648 + ((acc % 2147483648 - 536870912) + (((x // 2147483648 - 536870912) - (acc // 2147483648 - 536870912) - (acc % 2147483648 - 536870912)) // 4) // 8 + 536870912)) AS st
      FROM lst)
    SELECT user_id, n_events,
           CAST(st // 2147483648 - 536870912 AS BIGINT) AS level_cents,
           CAST(st % 2147483648 - 536870912 AS BIGINT) AS trend_cents,
           CAST((st // 2147483648 - 536870912) + 3 * (st % 2147483648 - 536870912) AS BIGINT)
             AS forecast3_cents
    FROM fold
    """,
)
def events_holt_linear_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT LINEAR-TREND smoothing (double exponential) as a fixed-point
    integer fold — the level+trend extension of the EWMA entry:
    l_t = l+t + (x−l−t) div 4, t_t = t + ((x−l−t) div 4) div 8 (dyadic
    α=1/4, β=1/8; l_0 = x_0, t_0 = 0), plus the h=3 forecast l + 3t.
    Same exactness argument as EWMA: a recursive float statistic can
    never hash-match cross-engine; truncating integer division does.

    The two-component state is PACKED into one BIGINT
    (state = (l + 2^29)·2^31 + (t + 2^29), decoded with div/mod inside
    the lambda) on BOTH sides — not an optimization but a workaround
    with a finding behind it: DuckDB v1.0.0's ``list_reduce`` evaluates
    STRUCT-accumulator lambdas with misaligned field bindings (the
    second field's ``acc.t`` picked up the first field's intermediate —
    reproduced on a 3-element list; scalar accumulators are correct,
    cf. the EWMA entry). Cent values are |x| < 2^29 by corpus range, so
    the packing never overflows 2^61. Sequential per key, parallel
    across keys, as every recursive filter."""
    pts = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 23 == 0
    ).select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    lst = pts.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("t_us", "event_id", "cents"))
        ).alias("seq"),
        F.count("*").cast("long").alias("n_events"),
    )
    folded = lst.select(
        "user_id",
        "n_events",
        F.expr(
            """
            aggregate(
              slice(transform(seq, s -> (s.cents + 536870912L) * 2147483648L + 536870912L),
                    2, size(seq) - 1),
              element_at(
                transform(seq, s -> (s.cents + 536870912L) * 2147483648L + 536870912L), 1),
              (acc, x) -> ((acc DIV 2147483648L - 536870912L) + (acc % 2147483648L - 536870912L) + (((x DIV 2147483648L - 536870912L) - (acc DIV 2147483648L - 536870912L) - (acc % 2147483648L - 536870912L)) DIV 4) + 536870912L) * 2147483648L + ((acc % 2147483648L - 536870912L) + (((x DIV 2147483648L - 536870912L) - (acc DIV 2147483648L - 536870912L) - (acc % 2147483648L - 536870912L)) DIV 4) DIV 8 + 536870912L)
            )
            """
        ).alias("st"),
    )
    # decode with INTEGER div — st reaches ~2^61, past double precision,
    # so a float `/` here would corrupt the level
    lvl = F.expr("st DIV 2147483648L") - 536870912
    trd = (F.col("st") % 2147483648) - 536870912
    return folded.select(
        "user_id",
        "n_events",
        lvl.cast("long").alias("level_cents"),
        trd.cast("long").alias("trend_cents"),
        (lvl + 3 * trd).cast("long").alias("forecast3_cents"),
    )


@register(
    "events_cross_correlation_lag",
    oracle="""
    WITH g AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY 1, 2),
    v AS (SELECT d, n FROM g WHERE event_type = 'view'),
    p AS (SELECT d, n FROM g WHERE event_type = 'purchase'),
    lags AS (SELECT unnest(generate_series(0, 7)) AS lag)
    SELECT l.lag,
           CAST(coalesce(sum(v.n * p.n), 0) AS BIGINT) AS xcorr,
           CAST(count(*) AS BIGINT) AS n_days
    FROM lags l
      JOIN v ON TRUE
      JOIN p ON p.d = v.d + CAST(l.lag AS INTEGER)
    GROUP BY l.lag
    """,
)
def events_cross_correlation_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged CROSS-CORRELATION between two event streams — "how many
    days after a view surge does the purchase surge follow": the raw
    (unnormalized) cross-correlation r(lag) = Σ_d views(d)·purchases(d+
    lag) for lags 0..7, emitted as the full exact-integer lag profile
    (argmax is the lead time; normalization is a per-lag scalar that
    cannot move the argmax and would put floats in the hash). The
    time-series-alignment primitive behind lead/lag attribution and
    sensor sync.

    Scale shape = the compact-first rule (SCALE.md): one grouped pass
    collapses 100 TB of events to the |days| x 2 daily grid, and ALL lag
    arithmetic runs on that compacted relation — the 8-lag expansion is
    an equi-join on (day + lag), broadcast-sized by construction, never
    a self-join of raw events. Counts are BIGINT; daily products stay
    far under 2^62 at any realistic rate."""
    g = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(
            F.col("ts").cast("date").alias("d"), "event_type"
        )
        .agg(F.count("*").alias("n"))
    )
    v = g.filter(F.col("event_type") == "view").select(
        F.col("d").alias("vd"), F.col("n").alias("vn")
    )
    p = g.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("pd"), F.col("n").alias("pn")
    )
    lagged = v.select(
        "vd", "vn", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("lag")
    )
    joined = lagged.join(
        p, F.col("pd") == F.date_add(F.col("vd"), F.col("lag"))
    )
    return joined.groupBy("lag").agg(
        F.sum(F.col("vn") * F.col("pn")).cast("long").alias("xcorr"),
        F.count("*").cast("long").alias("n_days"),
    )


@register(
    "events_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 1000000
               AS e
      FROM events),
    marked AS (
      SELECT user_id, event_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max_e
      FROM iv),
    islands AS (
      SELECT user_id, s, e,
             CAST(sum(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      FROM marked),
    merged AS (
      SELECT user_id, island,
             CAST(count(*) AS BIGINT) AS n_raw,
             CAST(max(e) - min(s) AS BIGINT) AS covered_us
      FROM islands GROUP BY user_id, island)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_merged,
           CAST(sum(n_raw) AS BIGINT) AS n_raw,
           CAST(sum(covered_us) AS BIGINT) AS covered_us,
           CAST(max(covered_us) AS BIGINT) AS longest_us
    FROM merged GROUP BY user_id
    """,
)
def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL UNION (merge overlapping intervals) per user — the
    sweep-line classic behind "total engaged time", ad-break coverage and
    sensor-uptime rollups, where naive ``sum(duration)`` double-counts
    overlap. Each event opens an interval of ``value*100`` seconds
    (cent-scaled to BIGINT — exact on both engines since the double
    product is the same IEEE value everywhere); a new island starts when
    an interval's start exceeds the running ``max(end)`` of everything
    earlier (window cummax over rows-preceding), island ids are a running
    conditional sum, and per-island coverage is ``max(end) - min(start)``.

    All three windows and both aggregations share the ONE user_id
    partitioning — Spark plans a single exchange for the whole merge. At
    100 TB this is the streaming-compaction shape: per-user state is one
    open interval (the cummax), which is why the same algorithm runs as
    an incremental pass; timestamps stay integer microseconds end-to-end
    (``unix_micros`` / ``epoch_us``), so the oracle is exact."""
    from pyspark.sql.window import Window

    iv = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 100).cast("long") * F.lit(1000000)
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.max("e").over(w_prev).alias("prev_max_e"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.select(
        "user_id",
        "s",
        "e",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        )
        .over(w_run)
        .cast("long")
        .alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("n_raw"),
        (F.max("e") - F.min("s")).cast("long").alias("covered_us"),
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_merged"),
        F.sum("n_raw").cast("long").alias("n_raw"),
        F.sum("covered_us").cast("long").alias("covered_us"),
        F.max("covered_us").cast("long").alias("longest_us"),
    )


@register(
    "events_pattern_match_regex",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS seq
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v+p')) AS BIGINT) AS n_funnel,
           CAST(coalesce(list_max(list_transform(
                  regexp_extract_all(seq, 'v+p'), x -> length(x) - 1)), 0)
                AS BIGINT) AS max_views_before_buy,
           CAST(coalesce(list_max(list_transform(
                  regexp_extract_all(seq, 'e+'), x -> length(x))), 0)
                AS BIGINT) AS max_error_burst
    FROM seqs
    """,
)
def events_pattern_match_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PATTERN MATCHING (MATCH_RECOGNIZE semantics) via the
    string-fold trick: each user's event stream collapses to a compact
    type-initial string in (ts, event_id) order — c/s/e/v/p — and row
    patterns become regexes over it: ``v+p`` counts non-overlapping
    view-streak→purchase funnels (and the streak length that converted),
    ``e+`` finds the longest error burst. Greedy non-overlapping
    left-to-right scan is identical in Java regex and RE2 for these
    alternation-free patterns, so counts and lengths are cross-engine
    exact. This is how engines without MATCH_RECOGNIZE (Spark included)
    run arbitrary row-pattern queries at scale: ONE groupBy-collect per
    user (sequences never leave their partition), then pattern state
    machines as vectorized string ops — no self-joins, no per-pattern
    passes; at 100 TB the per-user string is bounded by per-user event
    cardinality, the same bound any MATCH_RECOGNIZE state machine needs."""
    seqs = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.unix_micros("ts").alias("t"),
                                F.col("event_id").alias("i"),
                                F.substring("event_type", 1, 1).alias("c"),
                            )
                        )
                    ),
                    lambda x: x["c"],
                ),
                "",
            ).alias("seq")
        )
    )
    funnels = F.regexp_extract_all("seq", F.lit("v+p"), 0)
    bursts = F.regexp_extract_all("seq", F.lit("e+"), 0)
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.size(funnels).cast("long").alias("n_funnel"),
        F.coalesce(
            F.array_max(F.transform(funnels, lambda x: F.length(x) - 1)),
            F.lit(0),
        )
        .cast("long")
        .alias("max_views_before_buy"),
        F.coalesce(
            F.array_max(F.transform(bursts, lambda x: F.length(x))),
            F.lit(0),
        )
        .cast("long")
        .alias("max_error_burst"),
    )


@register(
    "events_anomaly_3sigma",
    oracle="""
    WITH pts AS (
      SELECT event_type, event_id, epoch_us(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_type, c,
             CAST(count(*) OVER tw AS BIGINT) AS n,
             CAST(sum(c) OVER tw AS BIGINT) AS s,
             CAST(sum(c * c) OVER tw AS BIGINT) AS sq
      FROM pts
      WINDOW tw AS (PARTITION BY event_type ORDER BY t, event_id
                    ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
    flagged AS (
      SELECT event_type, n, c, s, sq,
             CASE WHEN n >= 20
                   AND (n*c - s)*(n*c - s) > 9*(n*sq - s*s)
                  THEN 1 ELSE 0 END AS is_anom
      FROM w)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN n >= 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_eligible,
           CAST(sum(is_anom) AS BIGINT) AS n_anomalies,
           CAST(max(CASE WHEN is_anom = 1 THEN c END) AS BIGINT)
             AS max_anom_cents
    FROM flagged GROUP BY event_type
    """,
)
def events_anomaly_3sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING 3-SIGMA ANOMALY DETECTION in exact-rational form — the
    monitoring classic (flag points > 3 standard deviations from the
    trailing-window mean) restated without sqrt so two engines agree
    bitwise: with trailing integer moments (n, S=Σc, Q=Σc²) over the
    last 100 points per event type, ``|x − S/n| > 3·σ`` squares to

        (n·x − S)² > 9·(n·Q − S²)

    — all BIGINT on cent-scaled values, no division, no sqrt, no float.
    A 20-point warm-up gate avoids flagging the unstable early window.
    One event_type exchange serves the moment window and the rollup. At
    100 TB the same trailing-moment state is O(1) per series, which is
    why this exact detector also runs incrementally (cf. the CUSUM and
    EWMA entries for the drift/trend-shaped variants)."""
    pts = read_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("t", "event_id")
        .rowsBetween(-99, 0)
    )
    w = pts.select(
        "event_type",
        "c",
        F.count("*").over(tw).cast("long").alias("n"),
        F.sum("c").over(tw).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(tw).cast("long").alias("sq"),
    )
    dev = F.col("n") * F.col("c") - F.col("s")
    var_n2 = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    flagged = w.select(
        "event_type",
        "n",
        "c",
        F.when(
            (F.col("n") >= 20) & (dev * dev > 9 * var_n2), 1
        )
        .otherwise(0)
        .alias("is_anom"),
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.sum(F.when(F.col("n") >= 20, 1).otherwise(0))
        .cast("long")
        .alias("n_eligible"),
        F.sum("is_anom").cast("long").alias("n_anomalies"),
        F.max(F.when(F.col("is_anom") == 1, F.col("c")))
        .cast("long")
        .alias("max_anom_cents"),
    )


@register(
    "events_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT time_bucket(INTERVAL 1 DAY, ts) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY d),
    tr AS (
      SELECT d, cents,
             CAST(date_diff('day', DATE '1970-01-01', CAST(d AS DATE))
                  AS BIGINT) AS epoch_day,
             CASE WHEN count(*) OVER cw = 7
                  THEN CAST(sum(cents) OVER cw AS BIGINT) END AS trend7
      FROM daily
      WINDOW cw AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    dowd AS (
      SELECT d, cents, trend7, (epoch_day + 4) % 7 AS dow,
             7 * cents - trend7 AS detr7
      FROM tr),
    seas AS (
      SELECT dow,
             CAST(sum(detr7) AS BIGINT) AS seas_num,
             CAST(7 * count(detr7) AS BIGINT) AS seas_den
      FROM dowd WHERE detr7 IS NOT NULL GROUP BY dow)
    SELECT strftime(d, '%Y-%m-%d') AS day, cents,
           CAST(dow AS BIGINT) AS dow, trend7, seas_num, seas_den,
           CAST(7 * seas_den * cents - seas_den * trend7
                - 7 * seas_num AS BIGINT) AS resid_scaled
    FROM dowd JOIN seas USING (dow)
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL SEASONAL DECOMPOSITION (trend + day-of-week seasonal +
    residual, the moving-average method behind STL's initial pass) on the
    daily value series, in EXACT integer form: trend is the centered
    7-day moving average kept as its numerator ``trend7 = Σ₇ cents``
    (full windows only), the seasonal component is the day-of-week mean
    of the detrended series kept as ``seas_num/seas_den`` with
    ``detr7 = 7·cents − trend7``, and the residual is the decomposition
    identity cleared of ALL denominators:
    ``resid·(7·seas_den) = 7·seas_den·cents − seas_den·trend7 − 7·seas_num``.
    No quotient is ever materialized — detrended values go NEGATIVE and
    integer division on negatives is the one arithmetic the engines
    disagree on (Spark ``div`` truncates toward zero, DuckDB ``//``
    floors), so the entry returns exact numerator/denominator pairs.
    Day-of-week is pure arithmetic ``(epoch_day + 4) % 7`` (1970-01-01
    was a Thursday) — immune to the engines' different dayofweek
    conventions. Shape: one day rollup, one 7-row window, one 7-group
    broadcast join — at 100 TB the raw scan dominates and everything
    downstream is O(days)."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").start.alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    cw = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "cents",
        F.datediff(F.col("d").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
        F.when(
            F.count("*").over(cw) == 7, F.sum("cents").over(cw).cast("long")
        ).alias("trend7"),
    )
    dowd = tr.select(
        "d",
        "cents",
        "trend7",
        F.pmod(F.col("epoch_day") + 4, F.lit(7)).alias("dow"),
        (7 * F.col("cents") - F.col("trend7")).alias("detr7"),
    )
    seas = (
        dowd.where(F.col("detr7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum("detr7").cast("long").alias("seas_num"),
            (7 * F.count("detr7")).cast("long").alias("seas_den"),
        )
    )
    return dowd.join(F.broadcast(seas), "dow").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "cents",
        F.col("dow").cast("long").alias("dow"),
        "trend7",
        "seas_num",
        "seas_den",
        (
            7 * F.col("seas_den") * F.col("cents")
            - F.col("seas_den") * F.col("trend7")
            - 7 * F.col("seas_num")
        )
        .cast("long")
        .alias("resid_scaled"),
    )


@register(
    "events_session_capped",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, epoch_us(ts) AS t
      FROM events WHERE user_id % 11 = 0),
    flagged AS (
      SELECT user_id, t, event_id,
             CASE WHEN t - lag(t) OVER (PARTITION BY user_id
                                        ORDER BY t, event_id)
                       < 1800000000 THEN 0 ELSE 1 END AS new_s
      FROM pts),
    sess AS (
      SELECT user_id, t, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    capped AS (
      SELECT user_id, sid, t,
             (t - min(t) OVER (PARTITION BY user_id, sid)) // 7200000000
               AS chunk
      FROM sess),
    per AS (
      SELECT user_id, sid, chunk,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(t) - min(t) AS BIGINT) AS span_us
      FROM capped GROUP BY user_id, sid, chunk)
    SELECT user_id,
           CAST(count(DISTINCT sid) AS BIGINT) AS n_gap_sessions,
           CAST(count(*) AS BIGINT) AS n_capped_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(span_us) AS BIGINT) AS max_span_us
    FROM per GROUP BY user_id
    """,
)
def events_session_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPPED SESSIONIZATION — inactivity-gap sessions (30 min) that are
    ADDITIONALLY split when they run past a 2-hour duration cap, the
    product-analytics convention (Amplitude/Snowplow) that stops one
    long-lived tab from producing an unbounded session. Two-pass window
    composition over ONE user_id exchange: the classic lag/flag/cumsum
    gap sessionization, then a per-session ``(t − session_start) div 2h``
    chunk split — floor division on non-negative elapsed micros, so both
    engines truncate identically, and every capped chunk's span is < 2 h
    by construction (the oracle's max_span_us proves it). The capped
    variant is what keeps per-key streaming state bounded at 100 TB:
    session growth is capped, so eviction is time-driven even without a
    gap. All-integer microseconds; (ts, event_id) is the deterministic
    tie-break throughout."""
    pts = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 11 == 0)
        .select("user_id", "event_id", F.unix_micros("ts").alias("t"))
    )
    w_seq = Window.partitionBy("user_id").orderBy("t", "event_id")
    flagged = pts.select(
        "user_id",
        "t",
        "event_id",
        F.when(
            F.col("t") - F.lag("t").over(w_seq) < 1800000000, 0
        )
        .otherwise(1)
        .alias("new_s"),
    )
    sess = flagged.select(
        "user_id",
        "t",
        F.sum("new_s")
        .over(w_seq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    w_sess = Window.partitionBy("user_id", "sid")
    capped = sess.select(
        "user_id",
        "sid",
        "t",
        F.expr(
            "CAST((t - min(t) OVER (PARTITION BY user_id, sid))"
            " div 7200000000 AS BIGINT)"
        ).alias("chunk"),
    )
    per = capped.groupBy("user_id", "sid", "chunk").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("t") - F.min("t")).cast("long").alias("span_us"),
    )
    return per.groupBy("user_id").agg(
        F.countDistinct("sid").cast("long").alias("n_gap_sessions"),
        F.count("*").cast("long").alias("n_capped_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("span_us").cast("long").alias("max_span_us"),
    )


@register(
    "events_sliding_distinct_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(time_bucket(INTERVAL 1 DAY, ts) AS DATE))
                  AS BIGINT) AS d
      FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
      SELECT ud.user_id, days.d AS target_d
      FROM ud JOIN days ON days.d BETWEEN ud.d AND ud.d + 6)
    SELECT target_d AS epoch_day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib GROUP BY target_d
    """,
)
def events_sliding_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT SLIDING DISTINCT COUNT (trailing-7-day active users — the
    WAU metric) — the aggregate windowed COUNT(DISTINCT) cannot express
    (no engine supports distinct over moving frames) and HLL only
    approximates. The scalable exact form: dedupe to (user, day) FIRST —
    the only corpus-sized shuffle, and it shrinks the frame to at most
    |users|·|days| — then each (user, day) contributes to the 7 target
    days it keeps the user active for, and the per-target-day distinct
    count runs on the contributions. The fan-out factor equals the
    window length (7), paid on the DEDUPED frame, never on raw events —
    at 100 TB that is the difference between 7×|user-days| and
    7×|events|. Spark side generates contributions with a JVM
    ``explode(sequence(d, d+6))`` (no join); the oracle uses the
    equivalent day-range join. All-integer epoch days."""
    ud = (
        read_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("d"),
        )
        .distinct()
    )
    days = ud.select("d").distinct().withColumnRenamed("d", "target_d")
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + 6)
        ).alias("target_d"),
    ).join(F.broadcast(days), "target_d", "left_semi")
    return contrib.groupBy(F.col("target_d").alias("epoch_day")).agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )


@register(
    "events_kaplan_meier",
    oracle="""
    WITH users AS (
      SELECT user_id % 3 AS cohort,
             CAST(date_diff('day',
                    CAST(min(ts) AS DATE),
                    CAST(coalesce(
                      min(CASE WHEN event_type = 'purchase' THEN ts END),
                      max(ts)) AS DATE)) AS BIGINT) AS dur,
             CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END)
                       IS NULL THEN 0 ELSE 1 END AS ev
      FROM events GROUP BY user_id),
    pts AS (
      SELECT cohort, dur,
             CAST(sum(ev) AS BIGINT) AS e,
             CAST(sum(1 - ev) AS BIGINT) AS c
      FROM users GROUP BY 1, 2),
    risk AS (
      SELECT cohort, dur, e,
             CAST(sum(e + c) OVER (PARTITION BY cohort) -
                  coalesce(sum(e + c) OVER (
                    PARTITION BY cohort ORDER BY dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM pts),
    arrs AS (
      SELECT cohort,
             list(struct_pack(dur := dur, n_risk := n_risk, e := e)
                  ORDER BY dur) AS arr,
             list(CAST(n_risk - e AS DOUBLE) / CAST(n_risk AS DOUBLE)
                  ORDER BY dur) AS fl
      FROM risk GROUP BY cohort),
    survs AS (
      SELECT cohort,
             unnest(list_transform(arr, (x, i) -> struct_pack(
               dur := x.dur, n_risk := x.n_risk, e := x.e,
               surv := list_reduce(
                 list_slice(fl, 1, i), (a, b) -> a * b)))) AS s
      FROM arrs)
    SELECT CAST(cohort AS BIGINT) AS cohort,
           s.dur AS dur, s.n_risk AS n_risk, s.e AS n_event, s.surv AS surv
    FROM survs WHERE s.e > 0
    """,
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER SURVIVAL — time from a user's first event to first
    purchase, right-CENSORED at the last observed event for users who
    never purchase (dropping them instead would bias survival downward —
    the whole reason KM exists), per user_id%3 cohort. S(d) = prod over
    event days d_i<=d of (n_risk−e)/n_risk.

    Cross-engine exactness: the cumulative product has no reorder-free
    form (factors are rationals), so BOTH engines fold the SAME sorted
    per-cohort array sequentially — Spark ``transform(arr, (x,i) ->
    aggregate(slice(arr,1,i+1), 1.0, *))``, DuckDB ``list_transform(arr,
    (x,i) -> list_reduce(list_slice(arr,1,i), *))`` — identical operand
    order, identical IEEE roundings, so the unrounded DOUBLE
    hash-matches. n_risk comes from a reverse-cumulative window on exact
    BIGINTs. Scale: the per-user reduce is the only data-scale shuffle;
    the fold runs on the (cohort, day)-level frame, bounded by the
    calendar (<=~800 rows/cohort) — the O(k^2) slice-product is a
    constant, and ``arr`` is a materialized column so the lambda never
    recomputes upstream work (catalog nested-lambda rule)."""
    ev = read_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purch_ts"),
        F.max("ts").alias("last_ts"),
    )
    durs = users.select(
        (F.col("user_id") % 3).alias("cohort"),
        F.datediff(
            F.coalesce(F.col("purch_ts"), F.col("last_ts")).cast("date"),
            F.col("first_ts").cast("date"),
        )
        .cast("long")
        .alias("dur"),
        F.when(F.col("purch_ts").isNull(), 0).otherwise(1).alias("ev"),
    )
    pts = durs.groupBy("cohort", "dur").agg(
        F.sum("ev").cast("long").alias("e"),
        F.sum(1 - F.col("ev")).cast("long").alias("c"),
    )
    w_tot = Window.partitionBy("cohort")
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = pts.select(
        "cohort",
        "dur",
        "e",
        (
            F.sum(F.col("e") + F.col("c")).over(w_tot)
            - F.coalesce(
                F.sum(F.col("e") + F.col("c")).over(w_cum), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    arrs = risk.groupBy("cohort").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("dur"),
                    F.col("n_risk"),
                    F.col("e"),
                    (
                        (F.col("n_risk") - F.col("e")).cast("double")
                        / F.col("n_risk").cast("double")
                    ).alias("factor"),
                )
            )
        ).alias("arr")
    )
    survs = arrs.select(
        "cohort",
        F.explode(
            F.expr(
                "transform(arr, (x, i) -> struct("
                "x.dur AS dur, x.n_risk AS n_risk, x.e AS e, "
                "aggregate(slice(arr, 1, i + 1), CAST(1.0 AS DOUBLE), "
                "(a, y) -> a * y.factor) AS surv))"
            )
        ).alias("s"),
    )
    return survs.filter(F.col("s.e") > 0).select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("s.dur").alias("dur"),
        F.col("s.n_risk").alias("n_risk"),
        F.col("s.e").alias("n_event"),
        F.col("s.surv").alias("surv"),
    )


@register(
    "events_peak_concurrency",
    oracle="""
    WITH iv AS (
      SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS s,
             CAST(epoch_us(max(ts)) AS BIGINT) + 1 AS e,
             strftime(min(ts), '%Y-%m-%d') AS day
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    deltas AS (
      SELECT day, t, CAST(sum(d) AS BIGINT) AS delta
      FROM (SELECT day, s AS t, 1 AS d FROM iv
            UNION ALL SELECT day, e AS t, -1 AS d FROM iv) u
      GROUP BY 1, 2),
    sweep AS (
      SELECT day, t,
             CAST(sum(delta) OVER (PARTITION BY day ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS active
      FROM deltas)
    SELECT day,
           CAST(max(active) AS BIGINT) AS peak,
           CAST(min(CASE WHEN active = ranked.mx THEN t END) AS BIGINT)
             AS first_peak_us
    FROM (SELECT day, t, active,
                 max(active) OVER (PARTITION BY day) AS mx
          FROM sweep) ranked
    GROUP BY day
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENCY (interval max-overlap) — the capacity-planning
    primitive: how many users were simultaneously active at the busiest
    instant of each day? Each user's daily activity is an inclusive
    interval [first event, last event]; the classic +1/−1 SWEEP turns
    max-overlap into a running sum — no interval self-join (the naive
    O(n²) overlap join melts at scale), just one union, one per-(day,t)
    pre-aggregation of deltas, and one cumulative window per day. Ties
    at the same microsecond are pre-summed into one delta row, so the running
    sum is frame-order-free and deterministic. End boundaries use e+1
    (end-exclusive sweep == inclusive overlap on integer microseconds;
    epoch_us/unix_micros sidestep the DuckDB-rounds-vs-Spark-truncates
    whole-second trap documented at events_type_change_intervals). Peak
    plus the EARLIEST microsecond achieving it, all exact BIGINTs; ~2.4k
    output rows regardless of scale, and the sweep parallelizes by day
    partition at 100 TB."""
    ev = read_table(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(
        F.unix_micros(F.min("ts")).cast("long").alias("s"),
        (F.unix_micros(F.max("ts")).cast("long") + 1).alias("e"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
    )
    deltas = (
        iv.select("day", F.col("s").alias("t"), F.lit(1).alias("d"))
        .unionAll(
            iv.select("day", F.col("e").alias("t"), F.lit(-1).alias("d"))
        )
        .groupBy("day", "t")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w_cum = (
        Window.partitionBy("day")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = deltas.select(
        "day",
        "t",
        F.sum("delta").over(w_cum).cast("long").alias("active"),
    )
    ranked = sweep.select(
        "day",
        "t",
        "active",
        F.max("active").over(Window.partitionBy("day")).alias("mx"),
    )
    return ranked.groupBy("day").agg(
        F.max("active").cast("long").alias("peak"),
        F.min(F.when(F.col("active") == F.col("mx"), F.col("t")))
        .cast("long")
        .alias("first_peak_us"),
    )


@register(
    "events_acf_multilag",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(floor(CAST(sum(CASE WHEN value >= 0
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE -CAST(floor(-value * 100 + 0.5) AS BIGINT)
                      END) AS DOUBLE) / 100.0) AS BIGINT) AS v
      FROM events GROUP BY 1),
    pairs AS (
      SELECT t.range AS lag, a.v AS x, b.v AS y
      FROM range(1, 8) t
      JOIN daily a ON true
      JOIN daily b ON b.d = a.d + t.range),
    mom AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1)
    SELECT CAST(lag AS BIGINT) AS lag, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS r
    FROM mom
    """,
)
def events_acf_multilag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION FUNCTION at lags 1..7 — the weekly-seasonality
    detector (lag-7 spikes on weekly cycles) and the first diagnostic
    anyone runs before fitting a forecaster: Pearson correlation of the
    daily series against itself shifted by each lag. One pre-aggregation
    to the day level (the only data-scale shuffle; cents summed exactly
    then divided back to whole units so BIGINT moments survive ×100
    scale), then a 7-way lag join on the BOUNDED daily frame — at 100 TB
    this frame is ~3k rows whatever the input, so the fan-out costs
    nothing; moments in exact BIGINT and the r finish is the
    ``stats_spearman_rank`` correctly-rounded IEEE sequence, NULL on
    degenerate variance. Sibling of ``events_cross_correlation_lag``
    (two series there, one series at multiple lags here)."""
    cents = F.when(
        F.col("value") >= 0, F.floor(F.col("value") * 100 + 0.5)
    ).otherwise(-F.floor(-F.col("value") * 100 + 0.5))
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("d")
        )
        .agg(F.sum(cents.cast("long")).cast("long").alias("cents_sum"))
        # floor-division (matches DuckDB //, which floors; Spark's `div`
        # truncates toward zero and would disagree on a negative daily
        # total); |cents_sum| << 2^53 so the double quotient's floor is
        # exact off-boundary and exactly representable on-boundary
        .select(
            "d",
            F.floor(F.col("cents_sum") / F.lit(100.0))
            .cast("long")
            .alias("v"),
        )
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.d") == F.col("a.d") + F.col("lag"))
        .select(
            "lag", F.col("a.v").alias("x"), F.col("b.v").alias("y")
        )
    )
    from irio_mapreduce_spark.operators.stats import pearson_exact

    return pearson_exact(pairs, group_cols=("lag",)).select(
        F.col("lag").cast("long").alias("lag"), "n", "num", "r"
    )


@register(
    "events_allen_interval_relations",
    oracle="""
    WITH iv0 AS (
      SELECT user_id, event_type,
             CAST(min(epoch_us(ts)) AS BIGINT) AS s0,
             CAST(max(epoch_us(ts)) AS BIGINT) AS e0
      FROM events
      GROUP BY user_id, event_type, date_trunc('week', ts)),
    iv AS (
      SELECT user_id, event_type,
             (s0 // 3600000000) * 3600000000 AS s,
             ((e0 // 3600000000) + 1) * 3600000000 AS e
      FROM iv0),
    pair AS (
      SELECT user_id, s AS s1, e AS e1,
             lead(s) OVER w AS s2, lead(e) OVER w AS e2
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_type)),
    rel AS (
      SELECT CASE
               WHEN s1 = s2 AND e1 = e2 THEN 'equals'
               WHEN s1 = s2 THEN 'starts'
               WHEN e1 < s2 THEN 'precedes'
               WHEN e1 = s2 THEN 'meets'
               WHEN e1 = e2 THEN 'finished_by'
               WHEN e1 > e2 THEN 'contains'
               ELSE 'overlaps'
             END AS relation
      FROM pair WHERE s2 IS NOT NULL)
    SELECT relation, CAST(count(*) AS BIGINT) AS n
    FROM rel GROUP BY relation
    """,
)
def events_allen_interval_relations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ALLEN'S INTERVAL ALGEBRA — classify each pair of CONSECUTIVE
    per-user activity intervals (one interval per user × event type ×
    week, spanning first to last occurrence ROUNDED OUT to the enclosing
    hour grid — integer floor/ceil on epoch microseconds, the
    quantization that makes boundary relations like *meets* and *equals*
    reachable on jittered real timestamps instead of measure-zero) into
    Allen's temporal relations. Ordering pairs by (start, end) makes 7
    of the 13 relations reachable (the other 6 are inverses of these
    under pair swap): precedes, meets, overlaps, starts, finished_by,
    contains, equals — the exhaustive, mutually-exclusive case split on
    integer endpoint comparisons, the temporal-reasoning primitive
    behind conflict detection, downtime attribution, and entity-timeline
    alignment. Pairing is CONSECUTIVE-ONLY via one lead() window (the
    all-pairs variant is quadratic per user; consecutive pairs carry the
    same relation census for bounded per-user interval counts — here ≤
    one per event type), so the whole operator is one groupBy + one
    windowed pass: two shuffles on user co-location, no join.

    The Spark and oracle CASE cascades are ordered DIFFERENTLY (Spark
    tests each relation's full definition; the oracle relies on
    condition fall-through) so a mis-encoded boundary cannot cancel out;
    the shared relation semantics are additionally pinned on a hand-built
    corpus covering all 7 relations in tests/test_properties.py."""
    hour_us = 3600000000
    iv = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type", F.date_trunc("week", "ts"))
        .agg(
            F.min(F.unix_micros("ts")).cast("long").alias("s0"),
            F.max(F.unix_micros("ts")).cast("long").alias("e0"),
        )
        .select(
            "user_id",
            "event_type",
            F.expr(f"(s0 div {hour_us}) * {hour_us}").alias("s"),
            F.expr(f"((e0 div {hour_us}) + 1) * {hour_us}").alias("e"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("s", "e", "event_type")
    pair = iv.select(
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
        F.lead("s").over(w).alias("s2"),
        F.lead("e").over(w).alias("e2"),
    ).filter(F.col("s2").isNotNull())
    # full-definition tests, mutually exclusive by construction given
    # the (s1,e1) <= (s2,e2) lexicographic pair ordering
    relation = (
        F.when((F.col("e1") < F.col("s2")), "precedes")
        .when((F.col("s1") < F.col("s2")) & (F.col("e1") == F.col("s2")), "meets")
        .when(
            (F.col("s1") < F.col("s2"))
            & (F.col("s2") < F.col("e1"))
            & (F.col("e1") < F.col("e2")),
            "overlaps",
        )
        .when(
            (F.col("s1") < F.col("s2")) & (F.col("e1") == F.col("e2")),
            "finished_by",
        )
        .when(
            (F.col("s1") < F.col("s2")) & (F.col("e2") < F.col("e1")),
            "contains",
        )
        .when(
            (F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")),
            "starts",
        )
        .when(
            (F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")),
            "equals",
        )
    )
    return (
        pair.select(relation.alias("relation"))
        .groupBy("relation")
        .agg(F.count("*").cast("long").alias("n"))
    )


@register(
    "events_m4_downsample",
    oracle="""
    SELECT event_type,
           strftime(time_bucket(INTERVAL 6 HOUR, ts),
                    '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS v_min,
           CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS v_max,
           CAST(first(CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ORDER BY ts, event_id) AS BIGINT) AS v_first,
           CAST(last(CAST(floor(value * 100 + 0.5) AS BIGINT)
                     ORDER BY ts, event_id) AS BIGINT) AS v_last
    FROM events
    GROUP BY 1, 2
    """,
)
def events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 DOWNSAMPLING (Jugel et al., VLDB 2014) — the ERROR-FREE
    line-chart reducer: for each pixel-column time bucket keep exactly
    min, max, first and last of the series; a line chart rendered from
    those 4 points per column is pixel-identical to one rendered from
    ALL points, because no other sample can change which pixels the
    polyline covers. This is THE way to ship a 100 TB series to a
    dashboard: a single map-side-combinable groupBy collapses any
    volume to 4·(series × columns) rows — unlike iterative selectors
    (LTTB), M4 is embarrassingly parallel and exact. Buckets are
    6-hour epoch-aligned tumbles (sub-day bucket, so Spark's
    ``F.window`` and DuckDB's ``time_bucket`` agree on boundaries —
    the 7-day Monday-origin trap documented in FIXTURES.md doesn't
    bite); first/last are exact under ties via the (ts, event_id)
    struct ordering key (Spark ``min_by``/``max_by`` on a struct ==
    DuckDB ``first/last(.. ORDER BY ts, event_id)``); values ship as
    cents BIGINT. Reference parity: the closest reference shape is the
    per-key reduce fold (ReduceProcessor.java:24-52); M4 is that fold
    with a 4-slot state."""
    e = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    key = F.struct("ts", "event_id")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min(cents).cast("long").alias("v_min"),
            F.max(cents).cast("long").alias("v_max"),
            F.min_by(cents, key).cast("long").alias("v_first"),
            F.max_by(cents, key).cast("long").alias("v_last"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "n",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
        )
    )


@register(
    "events_ohlc_candles",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             (epoch_us(ts) - epoch_us(date_trunc('day', ts))) * 1000000
               + event_id AS k
      FROM events)
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(arg_min(cents, k) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(arg_max(cents, k) AS BIGINT) AS close_cents,
           CAST(sum(cents) AS BIGINT) AS volume_cents
    FROM pts GROUP BY event_type, day
    """,
)
def events_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars — the canonical time-series downsample for
    price-like streams: per (series, day) the first/last tick by event
    time plus the high/low/volume, all in ONE map-side-combinable
    aggregate (min_by/max_by carry the open/close, so no sort, no
    window, no self-join — the same selective-aggregate device as
    `events_m4_downsample`, specialised to the finance bar). The
    ordering key packs the within-day microsecond offset with the
    unique event id (offset·10⁶ + id — exact below 9.2e18 for ids
    under 10⁶ per day; at larger id spaces widen to a DECIMAL key or
    rank within the bar), so open/close ties are impossible by
    construction. Values are cent-scaled BIGINTs — every output cell
    integer-exact. Reference analog: per-key reduce emitting
    first/last/min/max of a numeric stream (ReduceProcessor.java:24-52).
    At 100 TB: one shuffle on (series, day) — the partial aggregates
    collapse each scan partition to one candle per open bar before the
    exchange, so the shuffle moves bars, not ticks."""
    pts = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (
            (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.date_trunc("day", F.col("ts")))
            )
            * F.lit(1000000)
            + F.col("event_id")
        ).alias("k"),
    )
    return pts.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("n_ticks"),
        F.min_by("cents", "k").cast("long").alias("open_cents"),
        F.max("cents").cast("long").alias("high_cents"),
        F.min("cents").cast("long").alias("low_cents"),
        F.max_by("cents", "k").cast("long").alias("close_cents"),
        F.sum("cents").cast("long").alias("volume_cents"),
    )


@register(
    "events_max_drawdown",
    oracle="""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    cumc AS (
      SELECT user_id, ts, event_id,
             CAST(sum(cents) OVER w AS BIGINT) AS cum
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    curve AS (
      SELECT user_id, cum,
             CAST(max(cum) OVER w AS BIGINT) AS peak
      FROM cumc
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, n_events, max_drawdown, peak_cum,
           CASE WHEN peak_cum > 0
                THEN (max_drawdown * 1000000) // peak_cum END AS max_dd_ppm
    FROM (SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(max(peak - cum) AS BIGINT) AS max_drawdown,
                 CAST(max(peak) AS BIGINT) AS peak_cum
          FROM curve GROUP BY user_id)
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the per-user cumulative value curve — the
    risk metric every P&L/engagement dashboard carries: running sum of
    cent-scaled ticks, running peak of that sum (a nested window over
    the same frame), drawdown = peak − cum, reduced to the per-user
    maximum. Everything BIGINT: window sums of integers, max of maxes —
    no float enters. The ppm column states the drawdown relative to the
    GLOBAL peak via integer division (a well-defined tie-free metric —
    the per-row peak at the argmax row is tie-ambiguous when several
    rows share the max drawdown), guarded NULL where the curve never
    rises above zero. At 100 TB: one hash partition by user, one sort
    per partition; both windows share the frame so Spark evaluates them
    in a single Window node — no second exchange, no second sort.
    Reference analog: ordered per-key fold carrying (cum, peak, best)
    through a reduce (ReduceProcessor.java:24-52)."""
    pts = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = pts.select(
        "user_id",
        F.sum("cents").over(w).cast("long").alias("cum"),
        F.max(F.sum("cents").over(w)).over(w).cast("long").alias("peak"),
    )
    agg = curve.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(F.col("peak") - F.col("cum")).cast("long").alias("max_drawdown"),
        F.max("peak").cast("long").alias("peak_cum"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "max_drawdown",
        "peak_cum",
        F.when(
            F.col("peak_cum") > 0,
            F.expr("(max_drawdown * 1000000) div peak_cum"),
        )
        .cast("long")
        .alias("max_dd_ppm"),
    )
