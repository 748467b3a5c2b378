#!/usr/bin/env python
"""Optimization-round harness: time individual catalog entries with the
bench methodology (get_spark session, noop sink) and optionally capture
their ``explain("formatted")`` output.

Usage:
  python tools/opt_bench.py [-r REPS] [-p PLANDIR_SUFFIX] name [name ...]

Each entry is timed REPS times (default 3) after one unmeasured warm run;
prints min/median. With -p <suffix>, writes the formatted plan to
``plans/r13/<name>_<suffix>.txt``. Names may be substrings; every catalog
entry matching any substring is run.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("-p", "--plan-suffix", default=None)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="only write plans (no timed execution) — usable on a busy host",
    )
    ap.add_argument(
        "--clear-cache",
        action="store_true",
        help="spark.catalog.clearCache() before every rep: each rep is an "
        "honest single-shot cost. Without this, an entry that persist()s a "
        "frame leaves it in the CacheManager and the NEXT rep's identical "
        "logical plan silently reuses it (plan-canonicalization matching), "
        "so min-of-reps measures cache-assisted cost — the methodology trap "
        "found in r12: several 'min of 3 warm reps' improvements were "
        "partly cross-rep cache hits, not single-shot wins.",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from irio_mapreduce_spark.session import get_spark
    from irio_mapreduce_spark import queries as catalog

    spark = get_spark(app_name="opt_bench")
    qs = catalog.all_queries()
    picked = [n for n in qs if any(s in n for s in args.names)]
    if not picked:
        print(f"no catalog entry matches {args.names}", file=sys.stderr)
        return 1

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # Session-level warmup (parquet footers, codegen, shuffle machinery).
    force(spark.read.parquet(os.path.join(sf_dir, "nation.parquet")))

    for name in picked:
        fn = qs[name]
        if args.plan_only:
            out = Path(_REPO) / "plans" / "r13" / f"{name}_{args.plan_suffix}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            df = fn(spark, sf_dir)
            out.write_text(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
            print(f"[plan] wrote {out}", file=sys.stderr)
            continue
        if not args.no_warm:
            t0 = time.monotonic()
            force(fn(spark, sf_dir))
            print(f"[warm] {name}: {time.monotonic() - t0:.3f}s", file=sys.stderr)
        ts = []
        for _ in range(args.reps):
            if args.clear_cache:
                spark.catalog.clearCache()
            t0 = time.monotonic()
            force(fn(spark, sf_dir))
            ts.append(time.monotonic() - t0)
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s "
            f"reps={[round(t, 3) for t in ts]}"
        )
        if args.plan_suffix:
            out = Path(_REPO) / "plans" / "r13" / f"{name}_{args.plan_suffix}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            df = fn(spark, sf_dir)
            out.write_text(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
            print(f"[plan] wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
