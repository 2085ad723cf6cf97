"""Semantics tests for the round-5 third batch: k-core peeling,
winsorized stats closed form, inverted-index postings, and the skew
report (oracle-parity hashes live in test_oracle_parity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.operators.graph import kcore_peel


def _core(spark, edges, k, rounds=3):
    df = spark.createDataFrame(edges, ["u", "v"])
    return {r.v: r.degree for r in kcore_peel(df, k=k, rounds=rounds).collect()}


def test_kcore_peels_pendants_and_keeps_clique(spark):
    # K4 with a pendant chain: 2-core = the K4 (chain peels over rounds)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    chain = [("d", "e"), ("e", "f")]
    m = _core(spark, k4 + chain, k=2, rounds=3)
    assert set(m) == {"a", "b", "c", "d"}
    assert all(d == 3 for d in m.values())


def test_kcore_cascade_needs_multiple_rounds(spark):
    # path a-b-c-d with k=2: ends peel in round 1, the rest cascade —
    # after 3 rounds nothing survives
    m = _core(spark, [("a", "b"), ("b", "c"), ("c", "d")], k=2, rounds=3)
    assert m == {}


def test_kcore_round_limit_is_respected(spark):
    # long path, k=2, rounds=1: only the two endpoints peel; the
    # interior survives ONE round with reduced degrees
    path = [(str(i), str(i + 1)) for i in range(6)]
    m = _core(spark, path, k=2, rounds=1)
    assert set(m) == {str(i) for i in range(1, 6)}
    assert m["1"] == 1 and m["3"] == 2


def test_winsorized_stats_match_naive_clamp(spark, sf_oracle):
    import duckdb

    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational12 import (
        winsorized_price_stats,
    )

    got = {
        r.l_returnflag: r
        for r in winsorized_price_stats(spark, sf_oracle).collect()
    }
    # independent naive clamp in DuckDB: clamp every value into
    # [p05, p95] (rank convention (n-1)*p//100) and sum
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_oracle}/lineitem.parquet')"
    )
    rows = con.execute("""
WITH v AS (
  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY
           CAST(round(l_extendedprice * 100) AS BIGINT)) - 1 AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
q AS (
  SELECT l_returnflag,
         max(CASE WHEN rn = (n-1)*5//100 THEN cents END) AS lo,
         max(CASE WHEN rn = (n-1)*95//100 THEN cents END) AS hi
  FROM v GROUP BY l_returnflag
)
SELECT v.l_returnflag, sum(least(greatest(v.cents, q.lo), q.hi)) AS s,
       count(*) AS n
FROM v JOIN q USING (l_returnflag) GROUP BY v.l_returnflag
""").fetchall()
    for flag, s, n in rows:
        assert got[flag].winsor_sum_cents == s
        assert got[flag].n == n


def test_inverted_index_postings_are_sorted_and_consistent(spark, sf_oracle):
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational12 import (
        inverted_index_postings,
    )

    rows = inverted_index_postings(spark, sf_oracle).collect()
    assert rows
    for r in rows[:200]:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == r.df >= 2
        assert len(set(ids)) == len(ids)


def test_key_skew_report_ranks_and_shares(spark, sf_oracle):
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational12 import (
        key_skew_report,
    )

    rows = sorted(key_skew_report(spark, sf_oracle).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, 21))
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    # ppm share consistent with the known 60k-row fact table
    for r in rows:
        assert r.share_ppm == r.n_rows * 1_000_000 // 60_000


def test_inverted_index_short_docs_emit_no_null_gram(spark, tmp_path):
    import duckdb

    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.registry import REGISTRY

    # docs shorter than 3 tokens produce NO trigram rows — the
    # explode_outer sentinel must not become a NULL-gram group (it
    # would get df >= 2 here and diverge from the oracle's unnest)
    rows = [
        (1, "a b", "en", "s", 3),
        (2, "x", "en", "s", 1),
        (3, "p q r s", "en", "s", 7),
        (4, "p q r t", "en", "s", 7),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).withColumn("doc_id", F.col("doc_id").cast("long"))
    d = tmp_path / "docs"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    q = REGISTRY["inverted_index_postings"]
    got = sorted(
        (r.gram, r.df, r.postings)
        for r in q.build(spark, str(d)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert got == want == [("p q r", 2, "3,4")]
