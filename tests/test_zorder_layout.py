"""End-to-end proof of the Z-order layout claim: writing the fact table
range-partitioned + sorted by the range-normalized Morton key produces
parquet files whose FOOTER min/max statistics bound BOTH source
dimensions — i.e. a scan filtered on either partkey or suppkey can
prune most files, which is the entire point of OPTIMIZE ZORDER-style
clustering. This checks the real file statistics (pyarrow footers),
not a plan string. The normalization matters: a raw interleave of a
20k-value partkey with a 100-value suppkey left every file's suppkey
box at the FULL range (measured here before scale16 existed)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.functions.layout import (
    morton_sql,
    scale16_sql,
)


def _file_bounds(path, cols):
    meta = pq.ParquetFile(path).metadata
    idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
    lo = {c: None for c in cols}
    hi = {c: None for c in cols}
    for rg in range(meta.num_row_groups):
        for c in cols:
            st = meta.row_group(rg).column(idx[c]).statistics
            lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
            hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
    return lo, hi


def test_zorder_write_bounds_both_dimensions(spark, sf_oracle, tmp_path):
    base = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    mm = base.agg(
        F.min("l_partkey").alias("pk_lo0"),
        F.max("l_partkey").alias("pk_hi0"),
        F.min("l_suppkey").alias("sk_lo0"),
        F.max("l_suppkey").alias("sk_hi0"),
    )
    sx = scale16_sql("l_partkey", "pk_lo0", "pk_hi0", "spark")
    sy = scale16_sql("l_suppkey", "sk_lo0", "sk_hi0", "spark")
    li = base.crossJoin(F.broadcast(mm)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(morton_sql(sx, sy, "spark")).alias("zv"),
    )
    n_files = 16
    out = tmp_path / "zsorted"
    (
        li.repartitionByRange(n_files, "zv")
        .sortWithinPartitions("zv")
        .write.parquet(str(out))
    )
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= n_files // 2  # range partitioner may merge tails

    g_lo, g_hi = None, None
    spans_pk, spans_sk = [], []
    for f in files:
        lo, hi = _file_bounds(f, ["l_partkey", "l_suppkey"])
        spans_pk.append(hi["l_partkey"] - lo["l_partkey"])
        spans_sk.append(hi["l_suppkey"] - lo["l_suppkey"])
        g_lo = lo if g_lo is None else {c: min(g_lo[c], lo[c]) for c in lo}
        g_hi = hi if g_hi is None else {c: max(g_hi[c], hi[c]) for c in hi}

    pk_span = g_hi["l_partkey"] - g_lo["l_partkey"]
    sk_span = g_hi["l_suppkey"] - g_lo["l_suppkey"]
    # Pruning property: the AVERAGE per-file bounding box must be a
    # strict fraction of the global range in BOTH dimensions — an
    # ingest-order write gives ~full-range boxes in every file.
    assert sum(spans_pk) / len(spans_pk) < 0.60 * pk_span, spans_pk
    assert sum(spans_sk) / len(spans_sk) < 0.60 * sk_span, spans_sk

    # Control: the same data written WITHOUT clustering shows ~global
    # boxes, so the improvement above is the layout, not luck
    ctrl = tmp_path / "unsorted"
    base.repartition(8).write.parquet(str(ctrl))
    ctrl_files = sorted(glob.glob(f"{ctrl}/part-*.parquet"))
    ctrl_spans = []
    for f in ctrl_files:
        lo, hi = _file_bounds(f, ["l_partkey"])
        ctrl_spans.append(hi["l_partkey"] - lo["l_partkey"])
    assert sum(ctrl_spans) / len(ctrl_spans) > 0.95 * pk_span, ctrl_spans
