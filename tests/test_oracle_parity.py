"""Per-operator correctness: every registered query with an oracle must
hash-match DuckDB at sf0.01 — the same check the driver runs."""

from __future__ import annotations

import pytest

from grocery_store_sales_forecasting_etl_pipeline_spark import plans
from tests.oracle_utils import compare

ORACLED = sorted(name for name, q in plans.REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in plans.REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_oracle, name):
    q = plans.REGISTRY[name]
    df = q.build(spark, sf_oracle)
    compare(df, q.oracle, sf_oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_oracle, name):
    q = plans.REGISTRY[name]
    df = q.build(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
