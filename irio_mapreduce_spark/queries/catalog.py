"""Registry mapping query name -> (Spark callable, optional DuckDB oracle SQL).

Every operator declared done in SURVEY.md §2 has an entry here; the driver
runs the Spark callable and the oracle SQL side-by-side at sf0.01 and
hash-compares results (CORRECTNESS_r{N}.json). Conventions that make the
comparison meaningful:

* every computed/aggregate column is aliased identically on both sides
  (the driver sorts columns BY NAME before hashing);
* floating-point aggregates are ``round()``-ed on both sides (Spark and
  DuckDB sum in different orders; unrounded doubles would hash-mismatch);
* no raw timestamp columns in outputs — formatted to strings on both sides
  (timezone-independent);
* results are sets: any ORDER BY inside a query exists only to make limits /
  ranks deterministic (unique tie-breaks), never for output order.

Queries whose semantics are intentionally approximate or non-SQL (HLL counts,
LSH bucketing, streaming state) register with ``oracle=None`` -> the driver
records a weaker rows-only check and pytest covers them with bound checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle SQL) to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)
