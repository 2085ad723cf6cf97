"""gated_broadcast (r12 broadcast audit): the size gate keeps the
broadcast hint for small inputs (local plans unchanged), drops it above
the threshold (AQE/planner decide from actual sizes at scale), and the
RESULT is identical either way — a join strategy never changes rows."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from grocery_store_sales_forecasting_etl_pipeline_spark.operators import sizing
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import wrapped_build


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _frame(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )


def test_small_input_keeps_broadcast_hint(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    dim = _frame(spark, sf_smoke)
    joined = li.join(
        sizing.gated_broadcast(dim), li.l_suppkey == dim.s_suppkey
    )
    assert "BroadcastHashJoin" in _plan(joined)


def test_oversize_input_drops_hint(spark, sf_smoke, monkeypatch):
    monkeypatch.setattr(sizing, "_BCAST_INPUT_MAX", 0)
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    dim = _frame(spark, sf_smoke)
    joined = li.join(
        sizing.gated_broadcast(dim), li.l_suppkey == dim.s_suppkey
    )
    # no user hint in the logical plan: the planner/AQE decide
    assert "UnresolvedHint" not in joined._jdf.queryExecution().logical().toString()
    assert "strategy=broadcast" not in joined._jdf.queryExecution().optimizedPlan().toString()
    # demotion decision is recorded for audit
    assert any(
        site.startswith("gated_broadcast@") and shape == "no-hint(AQE)"
        for site, (_, shape) in sizing.LAST_DECISIONS.items()
    )


def test_non_file_frame_defaults_to_broadcast(spark):
    lit = spark.range(5).select(F.col("id").alias("k"))
    big = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    # input_bytes is None for non-file sources -> keep the hint
    joined = big.join(sizing.gated_broadcast(lit), "k")
    # Spark 4 folds the hint into the Join node: rightHint=(strategy=broadcast)
    assert "strategy=broadcast" in joined._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize("query", ["dim_enrich_join", "nation_pair_trade"])
def test_gate_demotion_preserves_results(spark, sf_smoke, monkeypatch, query):
    build = wrapped_build(query)
    base = {tuple(map(str, r)) for r in build(spark, sf_smoke).collect()}
    monkeypatch.setattr(sizing, "_BCAST_INPUT_MAX", 0)
    demoted = {tuple(map(str, r)) for r in build(spark, sf_smoke).collect()}
    assert base == demoted


def test_checkpointed_frame_sizes_via_source(spark, sf_smoke, monkeypatch):
    """A localCheckpoint'ed frame has no leaf input files (LogicalRDD),
    so the gate must size from the ``source=`` base frame instead of
    silently keeping the hint at every scale."""
    monkeypatch.setattr(sizing, "_BCAST_INPUT_MAX", 0)
    d = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    ck = d.select("doc_id").localCheckpoint(eager=False)
    big = d.select("doc_id", "source")

    def plan(dim):
        return (
            big.join(dim, "doc_id")._jdf.queryExecution().optimizedPlan().toString()
        )

    # without source the gate cannot see the scan -> hint kept (None path)
    assert "strategy=broadcast" in plan(sizing.gated_broadcast(ck))
    # with source the gate sees the base table's bytes -> demoted at max=0
    assert "strategy=broadcast" not in plan(sizing.gated_broadcast(ck, source=d))
