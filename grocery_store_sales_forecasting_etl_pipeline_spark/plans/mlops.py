"""ML forecasting queries (reference M1-M3 → SURVEY.md §2.11): the
distributed replacements for the reference's driver-side LightGBM.
Model outputs are run-dependent at the margins (tree ensembles), so these
are rows-only checks; training determinism (fixed seed) and prediction
quality are pinned by tests/test_pipeline.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational import (
    weekly_lag_features,
)

_FEATURES = ("prev_week_qty", "prev2_week_qty", "mean_last4_weeks", "n_items")
_LABEL = "weekly_qty"


@register("forecast_weekly_gbt", oracle=None, tags=("ml",))
def forecast_weekly_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib GBTRegressor over the weekly lag-feature frame — fully
    distributed train + predict (VectorAssembler → GBT →
    model.transform), no driver collect anywhere (contrast reference
    gold_feature.py.py:54). Small maxIter keeps the contract/bench run
    bounded; scale the iterations, not the architecture.
    """
    from grocery_store_sales_forecasting_etl_pipeline_spark.ml.forecast import (
        train_predict_global,
    )

    features = weekly_lag_features(spark, sf_dir)
    out = train_predict_global(
        features,
        feature_cols=_FEATURES,
        label_col=_LABEL,
        max_iter=10,
        max_depth=4,
        # the sf0.1 feature frame is ~29k rows: a few fat partitions beat
        # 32 near-empty tasks × ~50 boosting jobs of scheduler overhead
        train_partitions=4,
    )
    return out.select(
        "suppkey",
        "year",
        "week",
        F.col(_LABEL).alias("actual_qty"),
        F.round("predicted_transactions", 2).alias("predicted_qty"),
    )


@register("forecast_per_group", oracle=None, tags=("ml",))
def forecast_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One model per supplier via ``applyInPandas`` grouped-map (Arrow
    batches; sklearn GBM when present, closed-form ridge otherwise) —
    the per-entity training pattern (SNIPPETS.md [3] shape, original
    implementation).
    """
    from grocery_store_sales_forecasting_etl_pipeline_spark.ml.forecast import (
        train_predict_per_group,
    )

    features = weekly_lag_features(spark, sf_dir)
    out = train_predict_per_group(
        features, group_col="suppkey", feature_cols=_FEATURES, label_col=_LABEL
    )
    return out.select(
        "suppkey",
        "year",
        "week",
        F.col(_LABEL).alias("actual_qty"),
        F.round("predicted_transactions", 2).alias("predicted_qty"),
    )
