"""Bucketed-table co-located join: the pre-shuffle scale technique the
brief calls out — write both fact tables bucketed on the join key, and the
join plans with ZERO exchanges (each bucket pair joins in place). At
100 TB this converts the recurring fact-fact shuffle into a one-time
layout cost paid at write."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from irio_mapreduce_spark.io import read_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("simple")
    plan = buf.getvalue()
    # Co-located: both sides scan their buckets; no shuffle anywhere.
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    # And it is still the same join.
    expected = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert joined.count() == expected
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
