"""Semantics tests for the round-5 fourth batch: DQ violation counting
on corrupted data, interval-union coverage vs a brute-force sweep, and
the HLL overlap audit band (oracle-parity hashes live in
test_oracle_parity)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_dq_summary_counts_injected_violations(spark, tmp_path, sf_oracle):
    import shutil

    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational13 import (
        dq_violation_summary,
    )

    # corrupt a copy of the sf0.001 tables: bad quantity, bad flag,
    # a duplicated PK row, and an orphan orderkey
    src = "/root/testdata/sf0.001"
    d = tmp_path / "dq"
    d.mkdir()
    for t in ("orders", "lineitem"):
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    one = li.limit(1)
    bad = (
        li.unionByName(one.withColumn("l_quantity", F.lit(99).cast(li.schema["l_quantity"].dataType))
                          .withColumn("l_orderkey", F.lit(999_999_999).cast("long"))
                          .withColumn("l_returnflag", F.lit("X")))
        .unionByName(one)  # exact duplicate PK
    )
    import os
    os.remove(d / "lineitem.parquet")
    bad.coalesce(1).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    # the driver's synthetic lineitem has NATURALLY duplicated
    # (l_orderkey, l_linenumber) pairs — the report must state the
    # data's real condition, so baseline that first
    base_rows = {
        r.rule: r for r in dq_violation_summary(spark, src).collect()
    }
    natural_dups = base_rows["pk_duplicates"].n_violations
    assert natural_dups > 0 and not base_rows["pk_duplicates"].passed

    rows = {r.rule: r for r in dq_violation_summary(spark, str(d)).collect()}
    assert set(rows) == {
        "null_keys", "qty_range", "price_positive", "flag_domain",
        "pk_duplicates", "fk_orphans",
    }
    assert rows["qty_range"].n_violations == 1 and not rows["qty_range"].passed
    assert rows["flag_domain"].n_violations == 1
    assert rows["pk_duplicates"].n_violations == natural_dups + 1
    assert rows["fk_orphans"].n_violations == 1
    assert rows["null_keys"].n_violations == 0 and rows["null_keys"].passed
    # rules the generator does satisfy stay green on the clean source
    clean = {r.rule: r for r in dq_violation_summary(spark, sf_oracle).collect()}
    for rule in ("null_keys", "qty_range", "price_positive", "flag_domain",
                 "fk_orphans"):
        assert clean[rule].passed, rule


def test_session_coverage_matches_global_sweep_brute_force(spark, sf_oracle):
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational13 import (
        session_coverage,
    )
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans._tables import events

    got = {r.day: r.covered_sec for r in session_coverage(spark, sf_oracle).collect()}

    # brute force in python: global sweep over 30-min-gap sessions
    rows = sorted(
        events(spark, sf_oracle).select("user_id", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    sessions = []
    cur_user, start, last = None, None, None
    import datetime as dt

    def toepoch(ts):
        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp())

    for r in rows:
        if r.user_id != cur_user or (r.ts - last).total_seconds() > 1800:
            if start is not None:
                sessions.append((toepoch(start), toepoch(last)))
            cur_user, start = r.user_id, r.ts
        last = r.ts
    sessions.append((toepoch(start), toepoch(last)))
    pts = {}
    for t0, t1 in sessions:
        pts[t0] = pts.get(t0, 0) + 1
        pts[t1] = pts.get(t1, 0) - 1
    expect: dict[str, int] = {}
    run = 0
    keys = sorted(pts)
    for i, t in enumerate(keys):
        run += pts[t]
        if run > 0 and i + 1 < len(keys):
            day = dt.datetime.fromtimestamp(t, dt.timezone.utc).strftime("%Y-%m-%d")
            expect[day] = expect.get(day, 0) + keys[i + 1] - t
    assert got == expect


def test_hll_overlap_audit_band_holds(spark, sf_oracle):
    from grocery_store_sales_forecasting_etl_pipeline_spark.plans.relational13 import (
        hll_overlap_audit,
    )

    rows = hll_overlap_audit(spark, sf_oracle).collect()
    assert rows
    assert all(r.approx_ok for r in rows)
    assert all(r.type_1 < r.type_2 for r in rows)
    assert all(r.exact_overlap > 0 for r in rows)
