#!/usr/bin/env python
"""Drive the round driver's contract surface exactly the way it does:
a VANILLA SparkSession (none of session.py's confs), __spark_entry__'s
entry()/queries()/oracle_sql(), and a DuckDB oracle comparison at sf0.01
through the PANDAS path on both sides — Spark ``toPandas()`` vs duckdb
``.df()``, dtype-sensitive cell rendering (tests/oracle_utils.py). That
is the driver's observable canonicalization path: a ``fetchall()``-based
comparator returns ``decimal.Decimal`` just like Spark Rows do and is
blind to the representation skew that redded 38/50 driver checks in r8.

Usage:
    python tools/verify_contract.py               # full registry
    python tools/verify_contract.py q1 q2 ...     # subset
    SPARK_GRAFT_ORACLE_DIR=/root/testdata/sf0.01  # data override

Exit code 0 iff every compared query matches ("DONE bad = 0").
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from tests.oracle_utils import TABLES, _canon_pandas

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    print("entry rows:", e.entry(spark).count(), flush=True)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = e.queries(), e.oracle_sql()
    subset = set(sys.argv[1:])
    unknown = subset - set(qs)
    if unknown:
        # A misspelled subset arg must not exit 0 having verified nothing.
        print("UNKNOWN queries:", ", ".join(sorted(unknown)))
        return 1
    bad = 0
    for name, fn in qs.items():
        if subset and name not in subset:
            continue
        try:
            spdf = fn(spark, SF_DIR).toPandas()
            if name in osql:
                opdf = con.execute(osql[name]).df()
                if sorted(spdf.columns) != sorted(opdf.columns):
                    bad += 1
                    print("SCHEMA MISMATCH", name, sorted(spdf.columns),
                          sorted(opdf.columns), flush=True)
                    continue
                srows, orows = _canon_pandas(spdf), _canon_pandas(opdf)
                if srows != orows:
                    bad += 1
                    diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:2]
                    print("MISMATCH", name, len(srows), len(orows),
                          str(diffs)[:300], flush=True)
            else:
                print("rows-only:", name, len(spdf), flush=True)
        except Exception as exc:  # noqa: BLE001 — report and keep sweeping
            bad += 1
            print("ERROR", name, f"{type(exc).__name__}: {exc}"[:160], flush=True)
    print("DONE bad =", bad)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
