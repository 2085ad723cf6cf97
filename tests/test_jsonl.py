"""JSONL ingest with quarantine (sources/jsonl.py): nested schema
lands natively, malformed lines quarantine, clean rows load."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from grocery_store_sales_forecasting_etl_pipeline_spark.sources import jsonl as J

_SCHEMA = StructType(
    [
        StructField("doc_id", IntegerType()),
        StructField("text", StringType()),
        StructField("meta", StructType([StructField("lang", StringType())])),
        StructField("tags", ArrayType(StringType())),
    ]
)

_LINES = [
    '{"doc_id": 1, "text": "hello world", "meta": {"lang": "en"}, "tags": ["a", "b"]}',
    '{"doc_id": 2, "text": "bonjour", "meta": {"lang": "fr"}, "tags": []}',
    "{not json at all",
    '{"doc_id": "NaNaNaN", "text": 3}',  # type mismatch -> corrupt under schema
    '{"doc_id": 5, "text": "ni hao", "meta": {"lang": "zh"}, "tags": ["c"]}',
]


def test_jsonl_ingest_splits_clean_and_corrupt(spark, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text("\n".join(_LINES) + "\n")
    spark.sql("CREATE DATABASE IF NOT EXISTS testjsonl")
    n_clean, n_bad = J.ingest_jsonl(
        spark,
        str(src),
        _SCHEMA,
        table="testjsonl.docs",
        quarantine_table="testjsonl.docs_quarantine",
    )
    assert (n_clean, n_bad) == (3, 2)
    loaded = spark.table("testjsonl.docs")
    # nested struct and array fields land as native types
    row = loaded.filter(F.col("doc_id") == 1).collect()[0]
    assert row["meta"]["lang"] == "en"
    assert row["tags"] == ["a", "b"]
    quarantined = {
        r["raw_record"] for r in spark.table("testjsonl.docs_quarantine").collect()
    }
    assert quarantined == {_LINES[2], _LINES[3]}


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    out = tmp_path / "out"
    J.write_jsonl(df, str(out), n_files=1)
    back = spark.read.schema("k BIGINT, v STRING").json(str(out))
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "x"), (2, "y")]
