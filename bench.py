#!/usr/bin/env python
"""Benchmark harness: times every catalog query at the bench scale factor.

Prints exactly ONE JSON line to stdout:

    {"metric": "catalog_total", "value": <sum sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Everything else (progress, Spark logs) goes to stderr. Execution is forced
with a ``noop``-format write — full computation, no driver-side collect, so
the timing measures the distributed plan, not result serialization.

Env knobs (driver contract):
  SPARK_GRAFT_SF_DIR  input dir  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N]   (default 32)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return float(m.group(1).rstrip(".")) if m else 0.0
    except ValueError:
        return 0.0


def _force(df) -> None:
    """Execute the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from irio_mapreduce_spark.session import get_spark
    from irio_mapreduce_spark import queries as catalog

    spark = get_spark(app_name="irio_mapreduce_spark-bench")
    qs = catalog.all_queries()

    # Warm up the JVM / first-read parquet footers so query #1 isn't charged
    # for session startup.
    _force(spark.read.parquet(os.path.join(sf_dir, "nation.parquet")))

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            _force(fn(spark, sf_dir))
            timings[name] = round(time.monotonic() - t0, 4)
            print(f"[bench] {name}: {timings[name]:.3f}s", file=sys.stderr)
        except Exception as e:  # a broken query must not zero the whole bench
            timings[name] = -1.0
            print(f"[bench] {name}: FAILED {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
