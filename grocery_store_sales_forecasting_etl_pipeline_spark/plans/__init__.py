"""Registered engine queries (driver correctness/bench surface).

Every operator family from SURVEY.md §2 — plus the training-data-pipeline
extensions (dedup, similarity, text analysis) — is exposed as a named query
with (a) a PySpark DataFrame builder ``(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent DuckDB oracle SQL string over the
same parquet tables.

``queries_map()`` exposes ALL registered queries; its iteration order is a
mechanical least-recently-externally-adjudicated rotation (see
``registry._rotation_order``), so nothing here depends on import order
beyond registration completeness.
"""

from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import (
    DECIMAL_BOUNDARY,
    REGISTRY,
    RegisteredQuery,
    oracle_sql_map,
    queries_map,
    register,
    wrapped_build,
    wrapped_oracle,
)
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import textops  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import simops  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import streamops  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import mediaops  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import mlops  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational2  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational3  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational4  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational5  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational6  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational7  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational8  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational9  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational10  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational11  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational12  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational13  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational14  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational15  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational16  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational17  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational18  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational19  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational20  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational21  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational22  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational23  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational24  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational25  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational26  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational27  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational28  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational29  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational30  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational31  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational32  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational33  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational34  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational35  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational36  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational37  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational38  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational39  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational40  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational41  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational42  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational43  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational44  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational45  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational46  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational47  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational48  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational49  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational50  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational51  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational52  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational53  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational54  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational55  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational56  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational57  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational58  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational59  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational60  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational61  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational62  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational63  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational64  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational65  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational66  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational67  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational68  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational69  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational70  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational71  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational72  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational73  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational74  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational75  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational76  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational77  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational78  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational79  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational80  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational81  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational82  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational83  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational84  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational85  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational86  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational87  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational88  # noqa: F401
from grocery_store_sales_forecasting_etl_pipeline_spark.plans import relational89  # noqa: F401

__all__ = [
    "REGISTRY",
    "RegisteredQuery",
    "register",
    "queries_map",
    "oracle_sql_map",
]
