#!/usr/bin/env python
"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing protocol (BASELINE.md): wall-clock around a forcing count() on the
result, median of N_RUNS after one warm-up.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
# headline set: one per operator family; None = bench everything registered
HEADLINE = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",") if os.environ.get(
    "SPARK_GRAFT_BENCH_QUERIES"
) else None


def _sf_from_dir(d: str) -> float:
    name = Path(d).name  # e.g. sf0.1
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> None:
    """Materialize EVERY output column via the noop v2 sink. count() is
    NOT a valid forcing action for a benchmark: Catalyst prunes columns
    count() doesn't need, silently skipping output-projection work — at
    sf10 this hid a long-overflow crash in weekly_revenue_acf behind a
    1.5s "timing" while the honest run computes (and then threw) in the
    pruned expressions. The noop sink consumes all columns and discards
    rows executor-side (no driver collect)."""
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, build, sf_dir: str, n_runs: int = N_RUNS) -> float:
    _force(build(spark, sf_dir))  # warm-up (also JIT + file listing cache)
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        _force(build(spark, sf_dir))
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    names = HEADLINE or sorted(plans.REGISTRY)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Wall-clock budget: the registry has grown past the point where
    # warm-up + 3 timed runs for EVERY query fits any sane harness
    # timeout (285 queries x 4 forcings ~= 20 min). Once the budget is
    # spent, remaining queries degrade to runs=1 (still warm-up +
    # one honest timed forcing) and the JSON records where the
    # degradation started — coverage over precision for the tail,
    # never a truncated run with no output.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "780"))
    t_start = time.perf_counter()
    degraded_after: str | None = None
    for i, name in enumerate(names):
        q = plans.REGISTRY.get(name)
        if q is None:
            continue
        n_runs = N_RUNS
        if time.perf_counter() - t_start > budget_s:
            if degraded_after is None:
                degraded_after = name
            n_runs = 1
        try:
            timings[name] = round(
                time_query(spark, q.build, SF_DIR, n_runs=n_runs), 4
            )
        except Exception as exc:  # one failing query must not lose the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        if (i + 1) % 20 == 0:
            # long-session hygiene, OUTSIDE any timed window: drop py4j
            # refs and force a driver GC so ContextCleaner reclaims the
            # accumulated shuffle/broadcast/checkpoint state (see
            # session.py periodicGC note; without this the tail of a
            # full-registry run measured 5-15x inflated)
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "n_queries": len(timings),
                "runs_per_query": N_RUNS,
                **(
                    {"degraded_to_1_run_from": degraded_after}
                    if degraded_after
                    else {}
                ),
                **({"errors": errors} if errors else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
