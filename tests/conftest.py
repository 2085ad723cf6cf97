from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")

# Two-tier suite (pytest.ini): the heavyweight modules below dominate the
# full-suite wall clock (full-registry oracle parity and plan walks are
# O(#registered queries); streaming suites block on micro-batch triggers).
# Everything else is the sub-5-minute fast gate: `pytest -m fast`.
_SLOW_MODULES = {
    "test_oracle_parity",
    "test_plans",
    "test_streaming",
    "test_stateful_streaming",
    "test_scd2_streaming",
    "test_maintenance",
    "test_incremental_pipeline",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(
            pytest.mark.slow if mod in _SLOW_MODULES else pytest.mark.fast
        )


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from grocery_store_sales_forecasting_etl_pipeline_spark.session import get_spark

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark(app_name="engine-tests", warehouse_dir=warehouse)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
