"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Canonicalizes both results to sorted tuples of strings (columns sorted by
name, rows sorted lexicographically) so the comparison is order-insensitive
— the same property the driver's value-hash has.
"""

from __future__ import annotations

import datetime as _dt
import math
import struct
from pathlib import Path

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # bit-exact: the decimal output boundary (plans/_decimal_boundary
        # .json) converts every manifest-listed float column to DECIMAL on
        # both sides before it reaches here, so any raw float left at the
        # comparison boundary is hashed full-precision by the external
        # driver — the local gate must be exactly as strict, or it passes
        # what the driver fails (the r6/r7 red-row class).
        return struct.pack("<d", v).hex()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, sql: str, sf_dir: str, name: str = "") -> None:
    """Assert Spark result == DuckDB oracle result, order-insensitively."""
    con = duckdb_con(sf_dir)
    try:
        cur = con.execute(sql)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
    finally:
        con.close()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    s = _canon(spark_rows, spark_cols)
    o = _canon(oracle_rows, oracle_cols)
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    if s != o:
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs (spark, oracle): {diffs}")
