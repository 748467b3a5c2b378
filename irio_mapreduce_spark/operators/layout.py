"""Multi-dimensional data-clustering layout: Z-order (Morton) keys.

Single-column clustering (``repartitionByRange`` + ``sortWithinPartitions``
— proven to narrow parquet row-group stats in
``tests/test_io.py::test_range_partitioned_sorted_write_narrows_rowgroup_stats``)
skips scans on ONE predicate column only; a second column's min/max stays
full-domain in every row group. Sorting by an interleaved-bit Morton key
instead gives every row group a small hyper-rectangle of the
multi-dimensional domain, so bounded predicates on ANY of the interleaved
columns skip most row groups on footer stats — the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` and time-series hypertable layouts,
expressed here with nothing but built-in integer expressions (whole-stage
codegen; no UDF, no shuffle beyond the one range exchange of the write).

All arithmetic is integer (shift/mask/sum), so key values are
cross-engine exact — the catalog entry replays them in DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer-valued column from ``[lo, hi]`` onto the
    ``[0, 2^bits)`` grid: ``floor(((col - lo) * (2^bits - 1)) / (hi -
    lo))``. The division runs on doubles (Column has no integer-div
    operator), exact while ``(hi - lo) * (2^bits - 1) < 2^53`` — the
    same documented bound as ``topk.ntile_from_rank``, generous at
    ``bits <= 20`` (domain up to ~8.6e9). ``lo``/``hi`` are plain ints
    supplied by the caller (one bounded min/max aggregate, or known
    domain bounds); values outside clamp to the grid edges so a stale
    bound cannot produce a negative shift."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if not 1 <= bits <= 20:
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    m = (1 << bits) - 1
    c = F.col(col) if isinstance(col, str) else col
    scaled = ((c.cast("long") - F.lit(lo)) * m) / F.lit(hi - lo)
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(m).cast("long"), F.floor(scaled).cast("long")),
    )


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton key of ``len(cols)`` pre-quantized grid coordinates (each in
    ``[0, 2^bits)``, e.g. from :func:`quantize`): bit ``j`` of column
    ``c`` lands at interleaved position ``j * n + c``. Unrolled to
    ``n * bits`` shift-mask-or terms — a single codegen'd integer
    expression per row, no join, no shuffle, no Python.

    ``n * bits`` must stay ≤ 63 (the key is a positive BIGINT).

    Usage for a clustered write (the Z-order analogue of the
    single-column recipe)::

        key = zorder_key([quantize(c1, ...), quantize(c2, ...)], bits)
        df.withColumn("_z", key).repartitionByRange(N, "_z")
          .sortWithinPartitions("_z").drop("_z").write.parquet(...)

    Row groups then hold contiguous Z-ranges = small hyper-rectangles of
    the (c1, c2) domain; `tests/test_io.py` proves BOTH columns'
    row-group spans narrow, where a plain c1 sort narrows only c1.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (use a plain sort for 1)")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits = {n * bits} > 63 key bits")
    parts = []
    for ci, col in enumerate(cols):
        for j in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftrightunsigned(col.cast("long"), j).bitwiseAND(F.lit(1)),
                    j * n + ci,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zkey")


def ensure_bucketed_table(
    spark,
    name: str,
    path: str,
    ddl_columns: str,
    bucket_col: str,
    n_buckets: int,
    build_df=None,
) -> None:
    """Idempotent, session-independent bucketed-table provisioning — the
    production pattern behind shuffle-free co-located joins:

    1. table already in this session's catalog → done;
    2. a COMMITTED bucketed write exists on disk (Spark's ``_SUCCESS``)
       → re-register it with external-table DDL (``CLUSTERED BY ... INTO
       n BUCKETS LOCATION ...``) — what a Hive metastore does durably,
       replayed here because the plain in-memory catalog forgets tables
       across sessions. Spark trusts the declared spec because bucket ids
       are baked into the written FILE NAMES (``*_0000N.c000``), so the
       DDL must repeat the exact (column, count) used at write time —
       both are baked into the caller's directory key;
    3. otherwise build: one ``bucketBy(...).sortBy(...)`` write (the only
       shuffle this data ever pays for this key; every later join or
       aggregation on ``bucket_col`` reads it back pre-partitioned AND
       pre-sorted).
    """
    import os

    if spark.catalog.tableExists(name):
        return
    if build_df is not None and not os.path.exists(
        os.path.join(path, "_SUCCESS")
    ):
        # repartition onto the bucket hash first: one FILE per bucket.
        # Spark only trusts a bucket's SORTED flag when the bucket is a
        # single file (multi-file buckets are merely hash-placed), and
        # repartition() uses the same Murmur3 hash as bucketBy, so
        # partition i holds exactly bucket i's rows.
        (
            build_df.repartition(n_buckets, F.col(bucket_col))
            .write.bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
        return
    spark.sql(
        f"CREATE TABLE {name} ({ddl_columns}) USING PARQUET "
        f"CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def compact_small_files(
    spark,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """SMALL-FILE COMPACTION — the standing table-maintenance job every
    100 TB lakehouse runs (Delta/Iceberg ``OPTIMIZE``, Hive concatenate):
    streaming ingest and fine-grained partitioning leave thousands of
    KB-sized files whose per-file open/footer/task overhead dominates
    scans; compaction rewrites them into files near ``target_file_bytes``
    (the parquet sweet spot is 128 MB-1 GB — big enough to amortize
    footers, small enough to split).

    Output file count is computed from the INPUT's actual on-disk bytes
    (compacting same-codec parquet roughly preserves size), then one
    round-robin ``repartition(n)`` rewrite — a single narrow-ish shuffle
    whose width IS the file count; no sorting, no layout change
    (compose with ``repartitionByRange``/Z-order writes when clustering
    is wanted too — those entries exist separately). Returns the file
    count written. Value identity is the caller's check (the catalog
    entry hash-compares a checksum against the ORIGINAL table)."""
    import math
    import os

    total = sum(
        e.stat().st_size
        for e in os.scandir(in_dir)
        if e.is_file() and e.name.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_file_bytes))
    (
        spark.read.parquet(in_dir)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return n_out


def hilbert_index(
    df: DataFrame, x_col: str, y_col: str, bits: int, out: str = "hkey"
) -> DataFrame:
    """Append the HILBERT-CURVE index of two pre-quantized grid
    coordinates (each in ``[0, 2^bits)``, e.g. from :func:`quantize`) —
    the space-filling key with strictly better locality than Morton
    order: consecutive keys are always unit neighbors (no Z-shaped
    jumps), so a key-range of tiles covers a tighter bounding box and a
    clustered write narrows row-group stats harder than
    :func:`zorder_key` on range-scanned dimensions.

    The classic xy2d transform is a per-level fold carrying rotated
    (x, y) state, built here as ``bits`` CHAINED PROJECTIONS (one select
    per level, each referencing the previous level's named columns) —
    materializing the per-level state as columns keeps the Catalyst tree
    linear in ``bits``, where a single nested expression would grow
    4^bits nodes (x' and y' each reference both x and y). Still zero
    joins/shuffles/Python: every level is shift-mask-case integer
    arithmetic inside whole-stage codegen. The quadrant order
    ``(3·rx) XOR ry`` and the reflect-then-swap rotation are the
    standard construction; bijectivity and the unit-step adjacency
    invariant are property-tested on the full grid in tests/test_io.py."""
    if not 1 <= bits <= 20:
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    # The fold materializes scratch columns _hx/_hy plus `out`; a caller
    # column with any of those names would duplicate under select('*',...)
    # and make every later reference ambiguous (or silently rebind).
    clash = {out, "_hx", "_hy"} & set(df.columns)
    if clash:
        raise ValueError(
            f"hilbert_index scratch/output column(s) {sorted(clash)} "
            "already exist in the input DataFrame — rename them first"
        )
    n = 1 << bits
    g = df.select(
        "*",
        F.col(x_col).cast("long").alias("_hx"),
        F.col(y_col).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias(out),
    )
    base = [c for c in df.columns]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1))
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when((rx == 0) & (ry == 1), 1)
            .when((rx == 1) & (ry == 1), 2)
            .otherwise(3)
        )
        x_new = F.when(ry == 1, F.col("_hx")).otherwise(
            F.when(rx == 1, F.lit(n - 1) - F.col("_hy")).otherwise(
                F.col("_hy")
            )
        )
        y_new = F.when(ry == 1, F.col("_hy")).otherwise(
            F.when(rx == 1, F.lit(n - 1) - F.col("_hx")).otherwise(
                F.col("_hx")
            )
        )
        d_new = F.col(out) + F.lit(s * s).cast("long") * quad
        g = g.select(
            *base,
            x_new.alias("_hx"),
            y_new.alias("_hy"),
            d_new.alias(out),
        )
    return g.drop("_hx", "_hy")
