"""Dedup operator semantics beyond oracle parity: the hot-shingle
document-frequency cap in ``jaccard_pairs`` (recall at threshold) and
the conditional repartition in ``_shingle_rows``."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.operators import dedup as dd


def _docs(spark, sf_oracle):
    return spark.read.parquet(f"{sf_oracle}/documents.parquet")


def _pairs(df, max_df=None, threshold=0.08):
    out = dd.jaccard_pairs(
        df,
        id_col="doc_id",
        text_col="text",
        k=2,
        threshold=threshold,
        block_cols=("source",),
        max_df=max_df,
    )
    return {(r.id_1, r.id_2): r.jaccard for r in out.collect()}


def test_max_df_above_corpus_max_is_identity(spark, sf_oracle):
    """A cap no shingle reaches must not change the result at all (the
    registered doc_ngram_jaccard relies on this at sf0.01, where max
    per-source df is 8 < 25)."""
    df = _docs(spark, sf_oracle)
    assert _pairs(df, max_df=None) == _pairs(df, max_df=10**6)


def test_binding_max_df_keeps_high_similarity_pairs(spark, sf_oracle):
    """Stop-shingle removal only perturbs borderline pairs: with a cap
    that actually binds (5 < corpus max df 8), every pair whose UNCAPPED
    jaccard is well above threshold must survive — near-dups share many
    rare shingles, so dropping hot ones cannot break them."""
    df = _docs(spark, sf_oracle)
    uncapped = _pairs(df, max_df=None)
    capped = _pairs(df, max_df=5)
    high_sim = {k for k, j in uncapped.items() if j >= 0.3}
    assert high_sim, "corpus lost its planted near-dups — regenerate testdata?"
    missing = high_sim - set(capped)
    assert not missing, f"df cap dropped high-similarity pairs: {missing}"


def test_binding_max_df_shrinks_join_input(spark, sf_oracle):
    """The cap must actually remove hot-shingle rows before the
    self-join (the Σ df² bound is the whole point)."""
    df = _docs(spark, sf_oracle)
    sh = dd._shingle_rows(df, "doc_id", "text", 2, ("source",)).withColumn(
        "shingle", F.xxhash64("shingle")
    )
    total = sh.count()
    capped = (
        sh.groupBy("source", "shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= 5)
        .agg(F.sum("df"))
        .collect()[0][0]
    )
    assert capped < total


def test_shingle_rows_skips_repartition_when_wide_enough(spark, sf_oracle):
    """An input that already has >= defaultParallelism splits must not be
    reshuffled (at 100 TB that repartition is a full shuffle of all
    document text for nothing)."""
    parallelism = spark.sparkContext.defaultParallelism
    marker = f"Repartition {parallelism}, true"  # the node _shingle_rows adds
    df = _docs(spark, sf_oracle)
    wide = df.repartition(parallelism + 4)
    out = dd._shingle_rows(wide, "doc_id", "text", 2, ())
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert marker not in plan, plan
    narrow = df.coalesce(1)
    out2 = dd._shingle_rows(narrow, "doc_id", "text", 2, ())
    plan2 = out2._jdf.queryExecution().optimizedPlan().toString()
    assert marker in plan2, plan2


def test_input_bytes_reads_parquet_metadata(spark, sf_oracle):
    import os

    path = f"{sf_oracle}/documents.parquet"
    df = spark.read.parquet(path)
    measured = dd._input_bytes(df)
    # the driver's tables are single parquet FILES; probe dirs are
    # directories of part files — handle both
    if os.path.isfile(path):
        actual = os.path.getsize(path)
    else:
        actual = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
            if not f.startswith((".", "_"))
        )
    assert measured == actual


def test_shingle_materialization_gate_and_equivalence(spark, sf_oracle):
    """The adaptive shingle checkpoint must (a) stay OFF at small input
    (the measured sf1 crossover: recompute wins below ~32 MB) and (b)
    be a pure execution-strategy choice — both variants bit-identical."""
    df = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    size = dd._input_bytes(df)
    assert size is not None and size < dd._SHINGLE_MATERIALIZE_MIN_INPUT_BYTES

    kw = dict(id_col="doc_id", text_col="text", k=2, threshold=0.08, max_df=25)
    base = sorted(
        map(tuple, dd.jaccard_pairs(df, materialize_shingles=False, **kw).collect())
    )
    ck = sorted(
        map(tuple, dd.jaccard_pairs(df, materialize_shingles=True, **kw).collect())
    )
    assert base == ck and len(base) > 0
