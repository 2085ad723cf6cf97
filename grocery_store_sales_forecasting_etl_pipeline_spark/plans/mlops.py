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


def _feature_matrix_sql() -> str:
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational import (
        _WEEKLY_LAG_ORACLE,
    )

    # addition order matters: both engines sum IEEE doubles left-to-right,
    # so the same textual order gives bit-identical sums (and sqrt is
    # correctly rounded), keeping hash parity without a tolerance
    return f"""
WITH feats AS ({_WEEKLY_LAG_ORACLE})
SELECT
  suppkey, year, week,
  CAST(weekly_qty AS DOUBLE)        AS label,
  CAST(prev_week_qty AS DOUBLE)     AS f_prev_week_qty,
  CAST(prev2_week_qty AS DOUBLE)    AS f_prev2_week_qty,
  CAST(mean_last4_weeks AS DOUBLE)  AS f_mean_last4_weeks,
  CAST(n_items AS DOUBLE)           AS f_n_items,
  round(sqrt(
    CAST(prev_week_qty AS DOUBLE) * CAST(prev_week_qty AS DOUBLE)
    + CAST(prev2_week_qty AS DOUBLE) * CAST(prev2_week_qty AS DOUBLE)
    + CAST(mean_last4_weeks AS DOUBLE) * CAST(mean_last4_weeks AS DOUBLE)
    + CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE)
  ), 6) AS feature_l2
FROM feats
WHERE prev_week_qty IS NOT NULL AND prev2_week_qty IS NOT NULL
  AND mean_last4_weeks IS NOT NULL AND n_items IS NOT NULL
"""


@register("forecast_feature_matrix", oracle=_feature_matrix_sql(), tags=("ml", "flagship"))
def forecast_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact model-boundary frame the GBT queries train on: the
    weekly lag-feature pipeline with every assembler input cast to
    double, nulls dropped (what VectorAssembler would reject), and an L2
    norm of the assembled vector as a scalar digest — pinning the full
    feature pipeline up to the (inherently non-SQL) model fit under the
    hash oracle, so the rows-only forecast checks only cover the model
    itself (reference gold_feature.py.py:43-53 casts + assembly).
    """
    feats = weekly_lag_features(spark, sf_dir)
    fcols = [F.col(c).cast("double") for c in _FEATURES]
    l2 = F.round(
        F.sqrt(
            fcols[0] * fcols[0]
            + fcols[1] * fcols[1]
            + fcols[2] * fcols[2]
            + fcols[3] * fcols[3]
        ),
        6,
    )
    return feats.na.drop(subset=list(_FEATURES)).select(
        "suppkey",
        "year",
        "week",
        F.col(_LABEL).cast("double").alias("label"),
        fcols[0].alias("f_prev_week_qty"),
        fcols[1].alias("f_prev2_week_qty"),
        fcols[2].alias("f_mean_last4_weeks"),
        fcols[3].alias("f_n_items"),
        l2.alias("feature_l2"),
    )


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
