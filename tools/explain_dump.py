#!/usr/bin/env python
"""Dump .explain("formatted") for named registered queries to files.

Usage:
    python tools/explain_dump.py <suffix> <query> [<query> ...]

Writes plans/r11/<query>_<suffix>.txt for each query (suffix is typically
"before" or "after"). Uses the SHIPPED surface (plans.wrapped_build) so the
captured plan includes the decimal output boundary — exactly what the bench
times. Plan capture is driver-side only (no job runs), so it is safe to run
on a box where timing work is in flight.

Env: SPARK_GRAFT_SF_DIR sets the data dir (default /root/testdata/sf0.1),
SPARK_GRAFT_PLANS_DIR the output dir (default plans/r11).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from grocery_store_sales_forecasting_etl_pipeline_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r11")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = plans.wrapped_build(name)(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(f"-- {name} ({suffix}) @ {sf_dir}\n{txt}")
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
