#!/usr/bin/env python
"""Drive the round driver's contract surface exactly the way it does:
a VANILLA SparkSession (none of session.py's confs), __spark_entry__'s
entry()/queries()/oracle_sql(), and a DuckDB oracle comparison at
sf0.01 (sorted columns, order-insensitive rows, 6dp float rendering —
the decimal output boundary makes the 6dp rendering exact for every
manifest-listed column).

Usage:
    python tools/verify_contract.py               # full registry
    python tools/verify_contract.py q1 q2 ...     # subset
    SPARK_GRAFT_ORACLE_DIR=/root/testdata/sf0.01  # data override

Exit code 0 iff every compared query matches ("DONE bad = 0").
"""

from __future__ import annotations

import datetime as dt
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def cell(v) -> str:
    if v is None:
        return "N"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return str(v)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

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
    bad = 0
    for name, fn in qs.items():
        if subset and name not in subset:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(cell(r[c]) for c in scols) for r in sdf.collect()
            )
            if name in osql:
                cur = con.execute(osql[name])
                desc = [d[0] for d in cur.description]
                orows = sorted(
                    tuple(cell(r[desc.index(c)]) for c in sorted(desc))
                    for r in cur.fetchall()
                )
                if scols != sorted(desc) or srows != orows:
                    bad += 1
                    print("MISMATCH", name, len(srows), len(orows), flush=True)
            else:
                print("rows-only:", name, len(srows), flush=True)
        except Exception as exc:  # noqa: BLE001 — report and keep sweeping
            bad += 1
            print("ERROR", name, f"{type(exc).__name__}: {exc}"[:160], flush=True)
    print("DONE bad =", bad)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
