"""Join operators Spark lacks as built-ins: as-of and bucketed range join.

The reference expresses *any* join as the classic reduce-side join — map tags
rows with their source, partition on the join key (R4,
``mr-bins/partition/partition.cpp:33-38``), reduce merges per key (R6) —
see SURVEY.md §2.2 "Joins". Both operators here keep that single-shuffle
shape instead of falling back to a broadcast-nested-loop plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Nearest-prior-event join: each left row picks the latest right row
    with ``right_ts <= left_ts`` for the same ``on`` key.

    Implementation is the union+window technique (SURVEY.md §2.2): tag both
    sides, union, and carry the last non-null right values forward over a
    window ordered by (ts, side). Cost = ONE shuffle on the key + a sort —
    no per-row range probe, no nested-loop join, so it scales linearly in
    rows regardless of time-range width. Ties (right_ts == left_ts) take the
    right row (right sorts before left at equal ts); among equal-ts right
    rows the last one wins, matching DuckDB ASOF JOIN's pick-one semantics
    only when right (key, ts) is unique — callers needing determinism under
    duplicate timestamps should pre-aggregate the right side.

    ``tolerance``: optional max staleness (e.g. ``"7 days"``) — matches
    farther in the past are nulled out, like pandas ``merge_asof`` tolerance.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # The matched right row travels as ONE struct so the carry-forward is
    # atomic: per-column last(ignorenulls) would mix columns from different
    # right rows whenever a right value column is nullable.
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in value_cols]
        ).alias("_rvals"),
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_tag.schema["_rvals"].dataType).alias("_rvals"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_lrow",
        F.col("_ts"),
        F.last("_rvals", ignorenulls=True).over(w).alias("_rvals_m"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        stale = F.col("_rvals_m._rts") < F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn(
            "_rvals_m", F.when(stale, F.lit(None)).otherwise(F.col("_rvals_m"))
        )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rvals_m.{c}").alias(c) for c in value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    matched_ts: str = "matched_ts",
) -> DataFrame:
    """NEAREST-match as-of join: each left row picks the right row
    minimizing ``|right_ts - left_ts|`` for the same key, ties (an
    equidistant prior and following match) resolved to the PRIOR — the
    pandas ``merge_asof(direction='nearest')`` / kdb ``wj`` semantics,
    for aligning measurements to the closest observation rather than the
    last one (sensor fusion, price-to-event alignment).

    Same single-shuffle union+window technique as :func:`asof_join`, run
    in BOTH directions over ONE sort: the backward frame carries the
    latest prior right struct, the forward frame the earliest following
    one (Catalyst plans both windows over the same Exchange+Sort — same
    partitioning, same ordering), and a null-aware comparison of the two
    timestamp gaps picks the winner. No range probe, no nested loop;
    linear in rows like the backward form. Right (key, ts) should be
    unique for determinism — pre-aggregate as with :func:`asof_join`.

    Returns left columns + ``value_cols`` + ``matched_ts`` (the chosen
    right row's timestamp, NULL when the key has no right rows at all).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in value_cols]
        ).alias("_rvals"),
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_tag.schema["_rvals"].dataType).alias("_rvals"),
    )
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    wb = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_lrow",
        "_ts",
        F.last("_rvals", ignorenulls=True).over(wb).alias("_prior"),
        F.first("_rvals", ignorenulls=True).over(wf).alias("_next"),
    )
    lts = F.col("_ts").cast("timestamp")
    gap_prior = F.unix_micros(lts) - F.unix_micros(
        F.col("_prior._rts").cast("timestamp")
    )
    gap_next = F.unix_micros(F.col("_next._rts").cast("timestamp")) - F.unix_micros(
        lts
    )
    use_prior = F.col("_prior").isNotNull() & (
        F.col("_next").isNull() | (gap_prior <= gap_next)
    )
    out = carried.filter(F.col("_side") == 1).withColumn(
        "_m", F.when(use_prior, F.col("_prior")).otherwise(F.col("_next"))
    )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
        F.col("_m._rts").alias(matched_ts),
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    bucket_seconds: float,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe as-of join: same semantics as :func:`asof_join`, but the
    window partitions on (key, coarse time bucket) instead of (key), so a
    hot key (one user with millions of events) is split across
    ``duration / bucket_seconds`` tasks instead of serializing into one.

    Mechanics:
    1. per (key, bucket): reduce the right side to its LAST row — a
       bucket-summary frame with at most one row per (key, bucket);
    2. build the bucket spine = every (key, bucket) seen on either side,
       and carry each bucket's summary forward to later buckets
       (window over the SUMMARY rows only — tiny even for hot keys);
    3. inject each bucket's carry-in as a synthetic right row ordered
       before everything in the bucket, then run the ordinary union +
       last(ignorenulls) window within (key, bucket).

    The big window's partition count scales with time coverage, and the
    only per-key-global pass runs over bucket summaries, not events.

    Plan note: this trades exchange COUNT for exchange WIDTH — ~7 shuffles
    appear in the plan, but all except the final (key, bucket) window move
    bucket-summary or spine rows (<= |keys| x |buckets|); the plain
    asof_join's single shuffle moves every event into one partition per
    key, which is exactly what melts under a hot key.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]

    def bucket_of(c: str) -> Column:
        # via TIMESTAMP: TIMESTAMP_NTZ refuses a direct double cast
        return F.floor(
            F.col(c).cast("timestamp").cast("double") / F.lit(bucket_seconds)
        )

    rvals = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in value_cols]
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        bucket_of(right_ts).alias("_b"),
        F.lit(0).alias("_side"),
        rvals.alias("_rvals"),
    )
    rvals_type = r_tag.schema["_rvals"].dataType

    # (1) last right row per (key, bucket): max on (_ts, _rvals) struct —
    # one partial-aggregatable reduction, no window over raw events.
    summaries = (
        r_tag.groupBy("_k", "_b")
        .agg(F.max(F.struct(F.col("_ts"), F.col("_rvals"))).alias("_m"))
        .select("_k", "_b", F.col("_m._rvals").alias("_last"))
    )

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        bucket_of(left_ts).alias("_b"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )

    # (2) spine of all (key, bucket) pairs; carry-in = last summary of any
    # STRICTLY EARLIER bucket (summary rows only: |keys|x|buckets| scale).
    spine = (
        l_tag.select("_k", "_b")
        .union(summaries.select("_k", "_b"))
        .distinct()
        .join(summaries, ["_k", "_b"], "left")
    )
    w_carry = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = spine.select(
        "_k",
        "_b",
        F.last("_last", ignorenulls=True).over(w_carry).alias("_carry"),
    ).filter(F.col("_carry").isNotNull())

    # (3) synthetic carry-in rows sort before every real row in the bucket
    # (side=-1 at the bucket's start), then the standard carry window —
    # partitioned by (key, bucket).
    lrow_type = l_tag.schema["_lrow"].dataType
    carry_rows = carry_in.select(
        "_k",
        "_b",
        F.lit(None).cast(l_tag.schema["_ts"].dataType).alias("_ts"),
        F.lit(-1).alias("_side"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        F.col("_carry").alias("_rvals"),
    )
    all_rows = (
        l_tag.withColumn("_rvals", F.lit(None).cast(rvals_type))
        .unionByName(r_tag.withColumn("_lrow", F.lit(None).cast(lrow_type)))
        .unionByName(carry_rows)
    )
    # carry-in rows have null _ts -> nulls-first puts them at the bucket
    # start; at equal real ts, right (0) sorts before left (1).
    w = (
        Window.partitionBy("_k", "_b")
        .orderBy(F.col("_ts").asc_nulls_first(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = all_rows.select(
        "_side",
        "_lrow",
        F.last("_rvals", ignorenulls=True).over(w).alias("_rvals_m"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rvals_m.{c}").alias(c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str | Column,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
    point_inclusive: tuple[bool, bool] = (True, False),
) -> DataFrame:
    """Point-in-interval join: left rows whose ``left_point`` falls in
    ``[right_lo, right_hi)`` (bounds configurable).

    Naive Spark plans this as BroadcastNestedLoopJoin — O(|L|·|R|), which
    dies at scale when the right side isn't tiny. This implementation
    bucketizes: each right interval explodes to the ``bucket_width``-sized
    buckets it overlaps, the join becomes an equi-join on bucket id (+ any
    ``extra_on`` keys), then the exact predicate re-filters. One hash
    shuffle; blow-up factor = avg interval width / bucket_width.
    """
    lp = F.col(left_point) if isinstance(left_point, str) else left_point
    extra_on = extra_on or []
    lo_op = F.col(right_lo) <= lp if point_inclusive[0] else F.col(right_lo) < lp
    hi_op = lp <= F.col(right_hi) if point_inclusive[1] else lp < F.col(right_hi)

    l_b = left.withColumn("_bucket", F.floor(lp / F.lit(bucket_width)).cast("long"))
    r_b = right.withColumn(
        "_buckets",
        F.sequence(
            F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
            F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("long"),
        ),
    ).withColumn("_bucket", F.explode("_buckets")).drop("_buckets")
    return (
        l_b.join(r_b, on=["_bucket", *extra_on])
        .filter(lo_op & hi_op)
        .drop("_bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Interval-interval OVERLAP join (closed bounds): every (left, right)
    pair whose ``[lo, hi]`` ranges intersect — the concurrency primitive
    (simultaneous sessions, colliding maintenance windows, overlapping
    validity ranges).

    Naive Spark plans the theta condition as a nested-loop join —
    O(|L|·|R|). Here BOTH sides explode to the ``bucket_width`` buckets
    they cover and the join becomes a bucket equi-join (+ ``extra_on``
    keys), re-filtered by the exact predicate. Two intervals that overlap
    share every bucket of their intersection, so the pair is kept ONLY in
    the first bucket both cover — ``max`` of the two start buckets — an
    ALGEBRAIC dedup that avoids a DISTINCT shuffle over the pair set.
    Cost: one hash shuffle of interval-times-covered-buckets rows;
    blow-up = avg interval width / bucket_width, tunable per workload.

    Column names must be distinct across the two inputs (the usual
    aliased-rename discipline)."""
    lw = F.lit(bucket_width)
    l_b = left.withColumn(
        "_lb0", F.floor(F.col(left_lo) / lw).cast("long")
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.col("_lb0"), F.floor(F.col(left_hi) / lw).cast("long")
            )
        ),
    )
    r_b = right.withColumn(
        "_rb0", F.floor(F.col(right_lo) / lw).cast("long")
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.col("_rb0"), F.floor(F.col(right_hi) / lw).cast("long")
            )
        ),
    )
    return (
        l_b.join(r_b, on=["_bucket", *(extra_on or [])])
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
        )
        .filter(F.col("_bucket") == F.greatest("_lb0", "_rb0"))
        .drop("_bucket", "_lb0", "_rb0")
    )
