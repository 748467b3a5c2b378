"""Deterministic sampling for training-data pipelines: hash-mod sampling,
train/validation splits, per-key quota caps.

Why hash-based and not ``rand(seed)``: Spark's ``rand`` is seeded PER
PARTITION — the sample changes whenever partitioning, task retries, or
input split boundaries change, which silently breaks reproducibility and
(worse) train/val hygiene across pipeline re-runs. A content hash of a
stable key gives the same decision for the same row on any engine, any
partitioning, any retry — and lets a DuckDB oracle verify the exact
sampled set. md5 is used because both engines expose the identical hex
digest (the catalog's hash-function entry already oracle-matches it).

Scale shape: sampling and splitting are pure narrow maps (one hash per
row, no shuffle, fully codegen-compatible); the quota cap is one window
shuffle on the quota key. All decisions are made on the key columns only
— the document payload never enters the hash unless asked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(
    key_cols: list[str | Column], n_buckets: int = 100, salt: str = ""
) -> Column:
    """Deterministic bucket in ``[0, n_buckets)``: first 8 hex chars of
    md5("col1|col2|...|salt") parsed as an integer, mod ``n_buckets``.
    The 8-char prefix (32 bits) keeps the parse inside a long while
    leaving bucket skew at O(n_buckets / 2^32) — negligible.

    The salt picks an independent sampling "universe": re-sampling with a
    new salt is uncorrelated with previous draws (the standard trick for
    holdout rotation without storing membership lists).
    """
    cols = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
            for c in key_cols]
    key = F.concat_ws("|", *cols, F.lit(salt))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n_buckets


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    rate_pct: int,
    salt: str = "",
) -> DataFrame:
    """Keep ~``rate_pct``% of rows, decided by :func:`hash_bucket` of the
    key columns — reproducible across runs, engines, partitionings and
    retries (none of which hold for ``df.sample``)."""
    return df.filter(hash_bucket(key_cols, 100, salt) < rate_pct)


def train_val_split(
    df: DataFrame,
    key_cols: list[str],
    val_pct: int = 10,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Tag each row ``train``/``val`` by hash bucket. Deterministic and
    leakage-safe under re-runs: a document's split never depends on what
    else is in the batch, so incremental corpus growth cannot move rows
    across the split boundary."""
    b = hash_bucket(key_cols, 100, salt)
    return df.withColumn(
        split_col, F.when(b < 100 - val_pct, F.lit("train")).otherwise(F.lit("val"))
    )


def per_key_quota(
    df: DataFrame,
    quota_key: str,
    quota: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Cap rows per ``quota_key`` at ``quota`` (per-domain/source caps — the
    anti-boilerplate staple of corpus curation). Selection within a key is
    by hash order (unbiased "random" quota, reproducible), tie-broken by
    ``id_col``; one window shuffle on the quota key. A skewed key (one
    domain = half the corpus) is one partition of the window — for that
    regime pre-filter with :func:`deterministic_sample` at the expected
    keep-rate first, which is a narrow map, then apply the exact cap."""
    w = Window.partitionBy(quota_key).orderBy(
        hash_bucket([id_col], 2**31, salt), F.col(id_col)
    )
    return (
        df.withColumn("_qrn", F.row_number().over(w))
        .filter(F.col("_qrn") <= quota)
        .drop("_qrn")
    )


def mixture_resample(
    df: DataFrame,
    weight: Column,
    key_cols: list[str],
    salt: str = "",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic mixture-weight resampling — the data-mixture stage of
    a pre-training pipeline (oversample high-quality sources, downsample
    boilerplate ones, per-source weights from the mixture recipe).

    Each row is kept ``floor(w)`` times plus one more with probability
    ``frac(w)``, the fractional draw decided by the row's hash bucket —
    so expected multiplicity is exactly ``w``, and the REALIZED multiset
    is a pure function of (key, salt): identical on any engine,
    partitioning, or retry, and exactly verifiable by an oracle (none of
    which holds for ``rand(seed)``). ``copy_col`` indexes the replicas so
    a downstream shuffle/pack stage can separate them.

    Scale shape: a narrow map + explode — no shuffle; output row count is
    sum(w) of the input, so partition sizing should budget for the
    mixture's expansion factor, not the input."""
    base = F.floor(weight).cast("int")
    frac = weight - F.floor(weight)
    u = hash_bucket(key_cols, 2**31, salt) / F.lit(float(2**31))
    n_copies = base + F.when(u < frac, 1).otherwise(0)
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )


def token_budget_batches(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    token_col: Column,
    budget: int,
    batch_col: str = "batch_id",
    tokens_out: str = "n_tokens",
) -> DataFrame:
    """Pack documents into token-budgeted training batches: within each
    group, documents in a stable order accumulate tokens, and batch k
    holds the docs whose EXCLUSIVE running total lies in
    ``[k*budget, (k+1)*budget)`` — contiguous greedy packing, one window
    cumulative sum, fully deterministic.

    Semantics are budget-TARGET, not a hard cap: a batch can overshoot by
    at most one document (the straddler stays with the batch it started
    in). That is the streaming-friendly contract every sequence-packing
    pipeline actually ships — exact bin packing is NP-hard and its result
    depends on global order, which would make retries/engines disagree.
    Oversized single documents (> budget) occupy a batch alone.

    One shuffle on ``group_cols`` (the window). Batch ids are per-group;
    (group, batch_id) is the global batch key.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(tokens_out, token_col).withColumn(
        batch_col, F.floor(before / F.lit(budget)).cast("long")
    )


def weighted_priority_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    salt: str = "",
    id_col: str | None = None,
    priority_col: str = "priority",
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement: each row gets a
    deterministic priority ``u / w`` (u = hash-uniform in (0, 1], w = its
    weight) and the k smallest priorities win — heavier rows draw smaller
    keys more often, so selection probability grows with weight.

    This is the rational-arithmetic variant of the Efraimidis-Spirakis
    exponential scheme (keys ``-ln(u)/w``): exact proportionality is
    traded for cross-engine bitwise reproducibility, because ``u`` is an
    exact dyadic rational ((b+1)/2^31) and one IEEE division is
    correctly rounded on every engine, while ``ln``/``pow`` are not
    (Java ``Math.log`` and libm both allow 1-ulp error, which could flip
    the k-th boundary between engines). Same reasoning as
    :func:`hash_bucket` vs ``rand(seed)``.

    Scale shape: the priority is a narrow map; selection is a global
    top-k (``TakeOrdered`` — per-partition heaps, no sort shuffle).
    Deterministic under retries/partitioning; ties broken by id.

    Rows whose weight is NULL or <= 0 are unsampleable and are EXCLUDED
    before ranking — without the filter, ``try_divide``'s NULL (w = 0 or
    NULL) sorts FIRST under Spark's ascending NULLS FIRST default and a
    negative weight's negative priority beats every valid row, so
    degenerate rows would deterministically steal top-k slots (and
    DuckDB's NULLS LAST would disagree about them).
    """
    b = hash_bucket(key_cols, 2**31, salt)
    u = (b + 1).cast("double") / F.lit(float(2**31))
    pri = F.try_divide(u, F.col(weight_col).cast("double"))
    order = [F.col(priority_col).asc_nulls_last()] + (
        [F.col(id_col)] if id_col else []
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(priority_col, pri)
        .orderBy(*order)
        .limit(k)
    )
