"""Catalog-convention enforcement: the two driver-canonicalization failure
classes from round 2 must never reappear (see queries/catalog.py docstring).

1. HUGEINT oracles: DuckDB types an integer ``sum()`` / ``list_sum()`` as
   HUGEINT, which pandas materializes as float64 — ``5995.0`` vs Spark's
   ``5995`` is a value-hash mismatch on cell-identical results. Every
   integer sum must be ``CAST(... AS BIGINT)``. Checked precisely by asking
   DuckDB for each oracle's result types (catches any future construct that
   widens to HUGEINT, not just textual ``sum(``).

2. Complex-typed outputs: the driver canonicalizes every result (even
   rows-only checks) with pandas ``sort_values``, which crashes on
   unhashable array/map cells. No catalog query may return array, map, or
   struct columns — wrap with ``to_json`` / ``array_join`` or explode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from irio_mapreduce_spark import queries as catalog
from tests.conftest import SF_DIR

_QUERIES = catalog.all_queries()
_ORACLES = catalog.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_returns_no_hugeint(name, duck):
    rel = duck.sql(f"SELECT * FROM ({_ORACLES[name]}) LIMIT 0")
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
    ]
    assert not offenders, (
        f"{name}: oracle columns {offenders} are HUGEINT — pandas will "
        "materialize them as float64 and the driver hash will mismatch "
        "Spark's long; CAST the sum to BIGINT"
    )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_returns_no_complex_columns(name, spark):
    df = _QUERIES[name](spark, SF_DIR)
    offenders = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not offenders, (
        f"{name}: columns {offenders} are array/map/struct — the driver's "
        "pandas canonicalization crashes on unhashable cells; render with "
        "to_json/array_join or explode to rows"
    )


def test_front_window_consistent_with_registry():
    """The driver checks the first 50 catalog entries in listing order;
    FRONT_WINDOW pins that prefix. Every listed name must exist, fit the
    50-slot budget, and actually lead all_queries()."""
    from irio_mapreduce_spark.queries.catalog import FRONT_WINDOW

    names = list(_QUERIES)
    unknown = [n for n in FRONT_WINDOW if n not in _QUERIES]
    assert not unknown, f"FRONT_WINDOW names not registered: {unknown}"
    assert len(FRONT_WINDOW) == len(set(FRONT_WINDOW)), "duplicates in FRONT_WINDOW"
    assert len(FRONT_WINDOW) <= 50, (
        f"FRONT_WINDOW has {len(FRONT_WINDOW)} entries — the driver only "
        "checks 50; trim it or accept silent exclusion"
    )
    assert names[: len(FRONT_WINDOW)] == FRONT_WINDOW


def test_front_window_covers_all_unverified_entries():
    """Round-10 rotation contract (r9 VERDICT.md item 1): every entry
    without a driver-green CORRECTNESS row in the union of rounds 1-9
    sits inside the driver's 50-entry window this round, or is pinned in
    DEFERRED_TO_NEXT_WINDOW as the mandatory head of the round-11 window.
    The 10-entry round-9 deferred queue is the MANDATORY window head, in
    its pinned order; round-10 additions are budgeted at 40 so the head
    is never displaced. With the window green the driver-green union
    reaches the full catalog."""
    import glob
    import json
    import os

    from irio_mapreduce_spark.queries.catalog import (
        DEFERRED_TO_NEXT_WINDOW,
        FRONT_WINDOW,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0[1-9].json")))
    assert len(prior) >= 9, "missing prior-round driver files"
    green: set[str] = set()
    seen: set[str] = set()
    for p in prior:
        rows = json.load(open(p))
        seen |= set(rows)
        green |= {k for k, v in rows.items() if v.get("hash_match")}
    needs_row = [n for n in _QUERIES if n not in green]
    window = set(list(_QUERIES)[:50])
    missing = [
        n
        for n in needs_row
        if n not in window and n not in DEFERRED_TO_NEXT_WINDOW
    ]
    # the round-11 head (if any) must fit one window
    assert len(DEFERRED_TO_NEXT_WINDOW) <= 50
    # the 10 round-9 deferred entries stay pinned as the r10 head, in order
    r10_head = [
        "events_sliding_distinct_users",
        "ml_confusion_threshold_sweep",
        "text_bpe_apply_tokens",
        "agg_mode_exact",
        "events_changepoint_sse",
        "graph_hits_hubs_authorities",
        "stats_mann_whitney_u",
        "join_null_skew_isolation",
        "udf_pandas_scalar_iter",
        "stats_permutation_test",
    ]
    assert FRONT_WINDOW[: len(r10_head)] == r10_head
    assert not missing, (
        f"entries still lacking a driver-green row are outside the "
        f"50-entry window and not declared deferred: {missing}"
    )
    # deferral is for genuine window overflow only, never for displacing
    # rotation debt: every deferred entry must be registered, absent from
    # ALL prior driver files, and the window must be full.
    unknown_deferred = [n for n in DEFERRED_TO_NEXT_WINDOW if n not in _QUERIES]
    assert not unknown_deferred, (
        f"DEFERRED_TO_NEXT_WINDOW names not registered: {unknown_deferred}"
    )
    assert len(window) == 50
    overlap = seen & set(DEFERRED_TO_NEXT_WINDOW)
    assert not overlap, (
        f"deferred entries {overlap} already had driver rows in a prior "
        "round — they are rotation debt, not window overflow"
    )


def test_bench_line_fits_recorder_tail():
    """BENCH_r01..r03 all recorded ``parsed: null``: the recording harness
    keeps only the last ~2000 bytes of stdout, and the full 100+-entry
    per-query map outgrew that. The printed line must trim to the slowest
    entries within budget while keeping the total over ALL entries."""
    import json

    import bench

    timings = {f"q{i:03d}_some_longish_query_name": round(0.1 + i * 0.01, 3) for i in range(130)}
    timings["broken_entry"] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = bench.compact_result(timings, total, 0.1)
    line = json.dumps(payload, separators=(",", ":")) + "\n"
    assert len(line) <= 2000
    assert payload["value"] == total
    assert payload["queries_measured"] == len(timings)
    # failures are never trimmed out of the printed subset
    assert payload["queries"]["broken_entry"] == -1.0
    # the printed subset is the slowest measured entries
    slowest = max(timings.items(), key=lambda kv: kv[1])
    assert payload["queries"][slowest[0]] == slowest[1]
    assert len(payload["queries"]) > 20
