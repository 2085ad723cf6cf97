#!/usr/bin/env python
"""Generate the driver-boundary numeric manifest.

For every registered query with a DuckDB oracle, DESCRIBE the oracle and
record which output columns are at risk of pandas-representation skew:
floating-point (DOUBLE/FLOAT/REAL — the r6 ULP-drift class) plus
DECIMAL/HUGEINT/UBIGINT (the r8/r9 class: duckdb ``.df()`` degrades these
to float64 — e.g. ``sum(BIGINT)`` is HUGEINT — while Spark delivers
int64 or ``decimal.Decimal`` objects through ``toPandas()``, so the
driver's pandas hasher sees ``5`` vs ``5.0``). The registry uses this
manifest to quantize those columns to DOUBLE via the same piecewise rule
on BOTH sides of the driver comparison (Spark builder and oracle SQL).

DESCRIBE only binds/plans the query (no execution), so regenerating the
manifest over the full registry takes seconds. Run after adding queries:

    python tools/gen_decimal_manifest.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SF_DIR = "/root/testdata/sf0.001"
OUT = (
    REPO
    / "grocery_store_sales_forecasting_etl_pipeline_spark"
    / "plans"
    / "_decimal_boundary.json"
)

FLOAT_TYPES = {"DOUBLE", "FLOAT", "REAL", "FLOAT4", "FLOAT8"}
# Types duckdb's .df() degrades to float64 while Spark stays int64/Decimal.
WIDENED_PREFIXES = ("DECIMAL", "NUMERIC", "HUGEINT", "UBIGINT")


def build_manifest(
    con: duckdb.DuckDBPyConnection,
) -> tuple[dict[str, list[str]], dict[str, str], dict[str, str]]:
    """DESCRIBE every registered oracle against the given connection and
    return (manifest, errors, decisions). Pure computation — shared by
    the CLI below and the fast-tier staleness guard
    (tests/test_boundary_fast.py), so the committed file can never
    silently diverge from what this logic would produce against the
    CURRENT testdata and registry.

    ``decisions`` classifies EVERY registry name, so a test can assert
    REGISTRY ∖ decisions = ∅ (no query ever ships unclassified):
    'quantized' (at-risk columns, in manifest), 'clean' (DESCRIBE'd, no
    at-risk columns), 'rows_only' (no oracle — nothing to quantize), or
    'error' (DESCRIBE failed; also in ``errors``)."""
    from grocery_store_sales_forecasting_etl_pipeline_spark import plans

    manifest: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    decisions: dict[str, str] = {}
    for name, q in sorted(plans.REGISTRY.items()):
        if q.oracle is None:
            decisions[name] = "rows_only"
            continue
        try:
            desc = con.execute(f"DESCRIBE SELECT * FROM ({q.oracle}) _q").fetchall()
        except Exception as exc:  # noqa: BLE001 — report and keep going
            errors[name] = str(exc)[:200]
            decisions[name] = "error"
            continue
        cols = [
            c
            for c, typ, *_ in desc
            if typ.upper() in FLOAT_TYPES
            or typ.upper().startswith(WIDENED_PREFIXES)
        ]
        if cols:
            manifest[name] = cols
        decisions[name] = "quantized" if cols else "clean"
    return manifest, errors, decisions


def main() -> None:
    from oracle_utils import duckdb_con

    con: duckdb.DuckDBPyConnection = duckdb_con(SF_DIR)
    manifest, errors, _decisions = build_manifest(con)
    con.close()
    if errors:
        # Refuse to write a partial manifest: an errored query would
        # silently ship unquantized while the file looks complete.
        print(f"NOT writing manifest — DESCRIBE errors ({len(errors)}):")
        for k, v in errors.items():
            print(f"  {k}: {v}")
        sys.exit(1)
    OUT.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}: {len(manifest)} queries with float columns")


if __name__ == "__main__":
    main()
