"""Round-5 additions, batch 20: asymmetric containment dedup, dataset
version reconciliation, and hashing-trick feature extraction — three
more ops a training-data platform runs between ingest and training.

Determinism discipline as everywhere: exact integer statistics
(shingle-intersection counts, md5-derived mutations and buckets, cent
deltas); floats only as one closed-form expression at the boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import table as _t
from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Asymmetric containment pairs (quote/superset detection)
# ---------------------------------------------------------------------------

# Jaccard misses subsumption: a short doc fully quoted inside a long one
# has low symmetric similarity but containment |A∩B|/|A| ≈ 1. Standard
# curation screen for quote farms / boilerplate supersets. Same blocked
# 2-gram shingle space as doc_ngram_jaccard / dedup_components.
_CONTAINMENT_ORACLE = """
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(1, len(tk)),
                i -> tk[i] || ' ' || tk[i + 1]))) AS shingle
  FROM t
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source
   AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a AS id_src, id_b AS id_dst, inter,
       s1.sz AS src_sz,
       round(inter * 1.0 / s1.sz, 4) AS containment
FROM inter
JOIN sizes s1 ON id_a = s1.doc_id
WHERE round(inter * 1.0 / s1.sz, 4) >= 0.5
"""


@register("doc_containment_pairs", oracle=_CONTAINMENT_ORACLE, tags=("text", "dedup"))
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered near-subsumption pairs: source doc whose distinct 2-gram
    shingle set is ≥50% contained in another same-source doc — the
    ASYMMETRIC complement of ``doc_ngram_jaccard`` (symmetric Jaccard
    misses a short doc quoted inside a long one). Directed output:
    (id_src, id_dst, containment = |A∩B|/|A|).

    Scale notes: identical cost shape to the Jaccard self-join — the
    intersection join pays Σ df² per shingle and the same ``max_df``
    stop-shingle cap applies when composed at scale; sizes join only
    the SOURCE side (containment needs one denominator). The shingle
    frame is deliberately recomputed per consumer, not checkpointed —
    the wide-exploded-frame rule from BASELINE.md r5.
    """
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.split("text", " ").alias("tk"))
    sh = t.select(
        "doc_id",
        "source",
        F.explode_outer(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
                )
            )
        ).alias("shingle"),
    ).filter(F.col("shingle").isNotNull())
    # 64-bit hash join key: same halved-shuffle trick as jaccard_pairs;
    # collision probability over a corpus vocabulary is ~2^-65
    sh = sh.withColumn("shingle", F.xxhash64("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    a = sh.select(
        F.col("doc_id").alias("id_src"), F.col("source").alias("src_a"), "shingle"
    )
    b = sh.select(
        F.col("doc_id").alias("id_dst"), F.col("source").alias("src_b"),
        F.col("shingle").alias("shingle_b"),
    )
    inter = (
        a.join(
            b,
            (F.col("shingle") == F.col("shingle_b"))
            & (F.col("src_a") == F.col("src_b"))
            & (F.col("id_src") != F.col("id_dst")),
        )
        .groupBy("id_src", "id_dst")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_src"), F.col("sz").alias("src_sz")),
            "id_src",
        )
        .withColumn("containment", F.round(F.col("inter") / F.col("src_sz"), 4))
        .filter(F.col("containment") >= 0.5)
        .select("id_src", "id_dst", "inter", "src_sz", "containment")
    )


# ---------------------------------------------------------------------------
# Dataset version reconciliation (snapshot diff)
# ---------------------------------------------------------------------------

# v2 is a deterministic md5-keyed mutation of orders: ~3% of keys
# removed, ~3% price-bumped by $1, ~1.5% re-inserted as new keys — the
# reconciliation report (added/removed/changed/unchanged + value drift)
# every dataset-versioning workflow runs between refreshes.
_DIFF_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS h
  FROM orders
),
v2 AS (
  SELECT k, cents + CASE WHEN h >= '08' AND h < '10' THEN 100 ELSE 0 END AS cents
  FROM v1 WHERE h >= '08'
  UNION ALL
  SELECT k + 100000000, cents FROM v1 WHERE h < '04'
),
d AS (
  SELECT coalesce(v1.k, v2.k) AS k, v1.cents AS c1, v2.cents AS c2
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT CASE WHEN c1 IS NULL THEN 'added'
            WHEN c2 IS NULL THEN 'removed'
            WHEN c1 <> c2   THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(coalesce(c2, 0) - coalesce(c1, 0)) AS BIGINT) AS cents_delta
FROM d
GROUP BY status
"""


@register("dataset_version_diff", oracle=_DIFF_ORACLE, tags=("quality", "join"))
def dataset_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation between two dataset versions: full-outer
    join on the key, classify every key added / removed / changed /
    unchanged, and report counts plus the signed value drift — the diff
    audit a versioned data lake runs before promoting a refresh (v2
    here is a deterministic md5-keyed mutation so the report is
    hash-checkable).

    Scale notes: one full-outer shuffle on the key both versions
    already carry; the classification is a codegen'd CASE over the
    joined row, and the report aggregates with map-side partials into
    four rows. At 100 TB, run it per partition-date and union — same
    plan, partition-pruned scans.
    """
    o = _t(spark, sf_dir, "orders")
    v1 = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2).alias("h"),
    )
    v2 = (
        v1.filter(F.col("h") >= "08")
        .select(
            "k",
            (
                F.col("cents")
                + F.when((F.col("h") >= "08") & (F.col("h") < "10"), 100).otherwise(0)
            ).alias("cents"),
        )
        .unionByName(
            v1.filter(F.col("h") < "04").select(
                (F.col("k") + 100000000).alias("k"), "cents"
            )
        )
    )
    d = v1.select("k", F.col("cents").alias("c1")).join(
        v2.select("k", F.col("cents").alias("c2")), "k", "full_outer"
    )
    status = (
        F.when(F.col("c1").isNull(), "added")
        .when(F.col("c2").isNull(), "removed")
        .when(F.col("c1") != F.col("c2"), "changed")
        .otherwise("unchanged")
    )
    return (
        d.groupBy(status.alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.coalesce(F.col("c2"), F.lit(0)) - F.coalesce(F.col("c1"), F.lit(0)))
            .cast("long")
            .alias("cents_delta"),
        )
    )


# ---------------------------------------------------------------------------
# Hashing-trick feature extraction (fixed-width hashed buckets)
# ---------------------------------------------------------------------------

_NBUCKETS = 8

_FHASH_COLS = ",\n       ".join(
    f"CAST(coalesce(sum(CASE WHEN bucket = {i} THEN 1 END), 0) AS BIGINT) AS f{i}"
    for i in range(_NBUCKETS)
)

_FHASH_ORACLE = f"""
WITH feat AS (
  SELECT user_id,
         ('0x' || substr(md5(event_type || ':' ||
                             CAST(CAST(props->>'k' AS BIGINT) AS VARCHAR)),
                         1, 4))::INT % {_NBUCKETS} AS bucket
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       {_FHASH_COLS}
FROM feat
GROUP BY user_id
"""


@register("event_feature_hash", oracle=_FHASH_ORACLE, tags=("ml", "agg"))
def event_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: each (event_type, k) pair hashes
    into one of 8 fixed buckets; per-user bucket counts become a
    fixed-width feature row — the unbounded-vocabulary-to-fixed-width
    encoder (Weinberger et al., feature hashing) a recommender /
    propensity pipeline uses so new categories never change the schema.

    Scale notes: the bucket is a pure md5 expression inside codegen
    (no vocabulary table, no join — that's the POINT of the trick);
    one user-grain shuffle with map-side partials; output width is
    fixed at 8+2 columns regardless of category cardinality.
    """
    ev = _t(spark, sf_dir, "events")
    feat = ev.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_type"),
                            F.lit(":"),
                            F.get_json_object("props", "$.k").cast("long").cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % _NBUCKETS
        ).alias("bucket"),
    )
    return feat.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.coalesce(F.sum(F.when(F.col("bucket") == i, 1)), F.lit(0))
            .cast("long")
            .alias(f"f{i}")
            for i in range(_NBUCKETS)
        ],
    )
