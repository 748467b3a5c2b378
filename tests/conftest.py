"""Shared pytest fixtures: one SparkSession per test session, DuckDB oracle.

``compare_with_oracle`` replicates the driver's t2 protocol (row count +
schema-name + order-insensitive value comparison), with float tolerance so
tests catch real bugs, not summation-order noise — the catalog's rounding
convention is what makes the driver's exact hash match.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from irio_mapreduce_spark.session import get_spark

    s = get_spark(
        app_name="irio_mapreduce_spark-tests",
        extra_conf={
            # bucketed-table tests saveAsTable; keep the warehouse out of
            # the repo tree
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_")
        },
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for order-insensitive comparison."""
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _close(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return a == b


# Physical-plan strings captured as a by-product of the oracle tests
# (which already build every catalog entry at SF_DIR): the full-catalog
# plan sweep in tests/test_plans.py reuses them instead of re-running
# every entry — streaming entries DRAIN during construction, so the
# rebuild cost was ~290 s of the suite (r10 VERDICT wall-clock item).
# Keyed by entry name; only populated when the oracle tests ran first.
# SERIAL-RUN ASSUMPTION (r11 ADVICE.md): the reuse relies on pytest's
# default alphabetical file order (test_oracle.py < test_plans.py) AND
# a single process — under pytest-xdist or randomized ordering each
# worker sees a partial dict and the sweep falls back to rebuilding the
# missing entries itself (correctness unaffected, wall-clock cost
# returns). Do not run the suite with -p xdist expecting the fast path.
RECORDED_PLANS: dict[str, str] = {}


def record_plan(name: str, spark_df) -> None:
    """Capture the entry's physical-plan string (what explain('simple')
    prints). Planning is lazily cached on the QueryExecution, so this is
    free next to the collect the caller is about to do."""
    RECORDED_PLANS[name] = (
        spark_df._jdf.queryExecution().simpleString()
    )


def compare_with_oracle(spark_df, duck_con, sql: str, name: str = "query") -> None:
    """Assert the Spark result matches the DuckDB oracle (driver t2 semantics)."""
    spark_cols = sorted(spark_df.columns)
    spark_rows = sorted(
        (tuple(_norm(r[c]) for c in spark_cols) for r in spark_df.collect()),
        key=repr,
    )
    rel = duck_con.sql(sql)
    duck_cols_orig = list(rel.columns)
    order = sorted(range(len(duck_cols_orig)), key=lambda i: duck_cols_orig[i])
    duck_cols = [duck_cols_orig[i] for i in order]
    duck_rows = sorted(
        (tuple(_norm(row[i]) for i in order) for row in rel.fetchall()),
        key=repr,
    )
    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    mismatches = [
        (s, d) for s, d in zip(spark_rows, duck_rows) if not _close(s, d)
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"
