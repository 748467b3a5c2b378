"""Driver contract for the spark-graft builder (PySpark target).

Thin view over the engine's query catalog (``irio_mapreduce_spark.queries``):
``queries()`` returns one callable per implemented SURVEY.md §2 operator,
``oracle_sql()`` the matching DuckDB SQL (omitted for intentionally
approximate / non-SQL-expressible ops), ``entry()`` the flagship smoke query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from irio_mapreduce_spark import queries as _catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return _catalog.all_queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.all_queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.all_oracles()
