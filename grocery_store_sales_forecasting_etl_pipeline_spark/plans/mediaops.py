"""Multimodal-column queries: binary blobs synthesized deterministically
from the documents table (the driver testdata has no real media), run
through the engine's real plumbing (functions/multimodal.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.functions import multimodal as mm
from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# blob = b'RIFF' + utf8(text); RIFF is ASCII so the oracle can rebuild the
# exact same bytes as a string concat
_MEDIA_META_ORACLE = """
SELECT
  doc_id,
  CAST(length(text) + 4 AS BIGINT) AS media_len,
  md5('RIFF' || text)              AS media_md5,
  'audio/wav'                      AS media_mime
FROM documents
"""


@register("multimodal_metadata", oracle=_MEDIA_META_ORACLE, tags=("multimodal",))
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: byte length, md5 content hash,
    magic-byte mime sniff — all JVM expressions over blobs
    (functions/multimodal.py:with_media_metadata).

    Scale notes: map-only; blobs never cross to Python. This is the
    pattern for petabyte blob-lake audits (hash dedup, corrupt sniffing).
    """
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_media_from_text(docs)
    return mm.with_media_metadata(media).select(
        "doc_id", "media_len", "media_md5", "media_mime"
    )


@register("multimodal_features", oracle=None, tags=("multimodal",))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched featurization of binary media: 64-bin byte histogram
    per blob via ``mapInPandas`` (functions/multimodal.py:
    byte_histogram_features) — the Python-boundary template for real
    decoders (rows-only check: float-vector output, no SQL oracle).
    """
    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_media_from_text(docs)
    out = mm.byte_histogram_features(media)
    return out.select(
        "doc_id",
        F.size("features").cast("long").alias("n_features"),
        F.round(F.expr("aggregate(features, 0.0D, (a, v) -> a + CAST(v AS DOUBLE))"), 3).alias(
            "l1_norm"
        ),
    )
