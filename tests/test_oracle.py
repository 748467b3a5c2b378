"""Run every catalog query with an oracle against DuckDB (the driver's t2
protocol, locally at sf0.01 by default). One parametrized test per query."""

from __future__ import annotations

import pytest

from irio_mapreduce_spark import queries as catalog
from tests.conftest import SF_DIR, compare_with_oracle

_QUERIES = catalog.all_queries()
_ORACLES = catalog.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_DIR)
    compare_with_oracle(df, duck, _ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_query_without_oracle_runs(name, spark):
    """Rows-only smoke for intentionally non-SQL-expressible queries."""
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
