#!/usr/bin/env python
"""Generate a deterministic 10x derivation of the sf0.1 testdata (an
"sf1" scale probe) and optionally run the heavy-query bench against it.

The driver only ships sf{0.001,0.01,0.1}; the 100 TB claims in operator
docstrings (blocked GEMM accounting, CC round counts, LSH bucket costs)
need at least one measured 10x point. This script derives it from sf0.1
itself — no new synthetic distributions, just replication with
structure-preserving rewrites:

- facts (lineitem, orders, events): 10 copies with shifted primary keys
  (orderkey/event_id), events also shift user_id per copy so streaming /
  session state scales in GROUP COUNT, not per-group size
- documents: shifted doc_id; copies > 0 suffix EVERY token with the
  copy index — a per-copy token BIJECTION. Within a copy, Jaccard /
  MinHash / SimHash similarity structure is preserved EXACTLY (shingle
  sets map bijectively), while across copies unigram and shingle spaces
  are disjoint, so dedup pair counts scale exactly 10x (O(n)) instead
  of exploding quadratically on fingerprint-identical copies (measured:
  a token-shuffle variant left cross-copy band-collision probability
  high enough to inflate MinHash candidates 635x)
- embeddings: shifted vec_id; copies > 0 get a deterministic bounded
  perturbation per dimension (hash-derived, ±0.25) so ANN bucket
  occupancy grows ~10x without 10x duplicate neighbors
- dims (region nation customer supplier part): copied as-is — TPC-H
  fact/dim ratios drift, but every FK stays valid and dim joins remain
  broadcastable, which is the property the probe cares about

Usage:
    python scale_probe.py                # generate (idempotent) + print dir
    SPARK_GRAFT_SF_DIR=$(python scale_probe.py) \
        SPARK_GRAFT_BENCH_QUERIES=... python bench.py

Output dir: $SPARK_GRAFT_SCALE_DIR (default /root/repo/.scale_probe/sf{COPIES},
or sf{COPIES}_graph in SHIFT_ENTITIES mode; gitignored). Generation is
skipped when every table already exists; a `.probe_mode` marker refuses
reuse of a dir generated under the other mode.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
# SHIFT_ENTITIES=1: also shift custkey/suppkey per copy so the
# customer-supplier GRAPH grows in nodes (not just edge density) —
# breaks dim-FK validity by design, so use it only for the graph-family
# probe (BASELINE.md "node-growth graph probe")
SHIFT_ENTITIES = os.environ.get("SPARK_GRAFT_SCALE_SHIFT_ENTITIES", "") == "1"
# The default dir is mode-dependent so shifted (FK-breaking) data can
# never be silently reused by a default-mode run or vice versa; a marker
# file double-checks explicit SPARK_GRAFT_SCALE_DIR overrides too.
# Naming is SF-equivalent (SRC is sf0.1, so COPIES=10 -> sf1, 100 -> sf10).
_SF_LABEL = f"sf{COPIES * 0.1:g}"
_DEFAULT_OUT = REPO / ".scale_probe" / (_SF_LABEL + ("_graph" if SHIFT_ENTITIES else ""))
OUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", str(_DEFAULT_OUT))
_MODE = "shift_entities" if SHIFT_ENTITIES else "default"

DIMS = ("region", "nation", "customer", "supplier", "part")
KEY_SHIFT = 100_000_000


def _explode_copies(df, n):
    import pyspark.sql.functions as F

    return df.withColumn("__copy", F.explode(F.expr(f"sequence(0, {n - 1})")))


def generate(spark) -> str:
    import pyspark.sql.functions as F

    # the nanos-generation events table (see plans/_tables.py) needs this
    # conf to be readable at all; harmless for the micros generation
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = Path(OUT)
    out.mkdir(parents=True, exist_ok=True)
    marker = out / ".probe_mode"
    if marker.exists():
        prior = marker.read_text().strip()
        if prior != _MODE:
            raise SystemExit(
                f"{out} was generated in mode '{prior}' but this run is mode "
                f"'{_MODE}'; set SPARK_GRAFT_SCALE_DIR to a fresh dir (the "
                "two modes produce incompatible FK structure)"
            )
    else:
        marker.write_text(_MODE + "\n")
    todo = [
        t
        for t in (*DIMS, "orders", "lineitem", "events", "documents", "embeddings")
        if not (out / f"{t}.parquet").exists()
    ]
    for t in DIMS:
        if t in todo:
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
                str(out / f"{t}.parquet")
            )
    shift = F.col("__copy").cast("long") * KEY_SHIFT
    entity_shift = F.col("__copy").cast("long") * 10_000_000
    if "orders" in todo:
        df = _explode_copies(spark.read.parquet(f"{SRC}/orders.parquet"), COPIES)
        df = df.withColumn("o_orderkey", F.col("o_orderkey") + shift)
        if SHIFT_ENTITIES:
            df = df.withColumn("o_custkey", F.col("o_custkey") + entity_shift)
        df.drop("__copy").repartition(8).write.mode("overwrite").parquet(
            str(out / "orders.parquet")
        )
    if "lineitem" in todo:
        df = _explode_copies(spark.read.parquet(f"{SRC}/lineitem.parquet"), COPIES)
        df = df.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        if SHIFT_ENTITIES:
            df = df.withColumn("l_suppkey", F.col("l_suppkey") + entity_shift)
        df.drop("__copy").repartition(16).write.mode("overwrite").parquet(
            str(out / "lineitem.parquet")
        )
    if "events" in todo:
        df = _explode_copies(spark.read.parquet(f"{SRC}/events.parquet"), COPIES)
        (
            df.withColumn("event_id", F.col("event_id") + shift)
            .withColumn("user_id", F.col("user_id") + F.col("__copy").cast("long") * 10_000_000)
            .drop("__copy")
            .repartition(8)
            .write.mode("overwrite")
            .parquet(str(out / "events.parquet"))
        )
    if "documents" in todo:
        df = _explode_copies(spark.read.parquet(f"{SRC}/documents.parquet"), COPIES)
        remapped = F.expr(
            "array_join(transform(split(trim(text), '\\\\s+'), "
            "t -> concat(t, '_', CAST(__copy AS STRING))), ' ')"
        )
        (
            df.withColumn("text", F.when(F.col("__copy") == 0, F.col("text")).otherwise(remapped))
            .withColumn("doc_id", F.col("doc_id") + F.col("__copy").cast("long") * 10_000_000)
            .withColumn("n_chars", F.length("text").cast("long"))
            .drop("__copy")
            .repartition(8)
            .write.mode("overwrite")
            .parquet(str(out / "documents.parquet"))
        )
    if "embeddings" in todo:
        df = _explode_copies(spark.read.parquet(f"{SRC}/embeddings.parquet"), COPIES)
        # bounded hash-noise per (vec, dim, copy): +-0.25, deterministic
        perturbed = F.expr(
            "transform(embedding, (x, j) -> CAST(x + "
            "IF(__copy = 0, 0.0D, "
            "   (pmod(hash(vec_id, j, __copy), 1000) / 2000.0D) - 0.25D) AS FLOAT))"
        )
        (
            df.withColumn("embedding", perturbed)
            .withColumn("vec_id", F.col("vec_id") + F.col("__copy").cast("long") * 10_000_000)
            .drop("__copy")
            .repartition(8)
            .write.mode("overwrite")
            .parquet(str(out / "embeddings.parquet"))
        )
    return str(out)


def main() -> None:
    from grocery_store_sales_forecasting_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-gen")
    spark.sparkContext.setLogLevel("ERROR")
    print(generate(spark))
    spark.stop()


if __name__ == "__main__":
    main()
