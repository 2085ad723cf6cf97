"""Invariant tests for batch 87: Youden vs an exhaustive threshold
scan, VaR backtest vs a direct split/count replay, omega/sortino vs
direct sums, Blomqvist beta vs a quadrant count."""

from __future__ import annotations

import math
from collections import Counter

import pyspark.sql.functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark import plans

SF = "/root/testdata/sf0.01"


def _series(spark, grain):
    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.date_trunc(grain, "o_orderdate").cast("date").alias("g"))
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint)) DIV 100"
            ).alias("dollars")
        )
        .collect()
    )
    return [r["dollars"] for r in sorted(rows, key=lambda r: r["g"])]


def test_youden_replay(spark):
    row = plans.REGISTRY["discount_return_youden"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.round(F.col("l_discount") * 100).cast("long").alias("s"),
            (F.col("l_returnflag") == "R").alias("pos"),
        )
        .collect()
    )
    pos = Counter(r["s"] for r in li if r["pos"])
    neg = Counter(r["s"] for r in li if not r["pos"])
    n_pos = sum(pos.values())
    n_neg = sum(neg.values())
    best = None
    for t in sorted(set(pos) | set(neg)):
        tp = sum(c for s, c in pos.items() if s >= t)
        fp = sum(c for s, c in neg.items() if s >= t)
        key = n_neg * tp - n_pos * fp
        if best is None or key > best[0] or (key == best[0] and t < best[1]):
            best = (key, t, tp, fp)
    assert row["n_pos"] == n_pos
    assert row["n_neg"] == n_neg
    assert row["threshold_cents"] == best[1]
    assert row["tp"] == best[2]
    assert row["fp"] == best[3]
    j = best[2] / n_pos - best[3] / n_neg
    assert abs(row["youden_j"] - j) < 1e-5


def test_var_backtest_replay(spark):
    row = plans.REGISTRY["daily_change_var_backtest"].build(spark, SF).collect()[0]
    d = _series(spark, "day")
    xs = [d[i] - d[i - 1] for i in range(1, len(d))]
    n = len(xs)
    train = [xs[i] for i in range(n) if 4 * (i + 1) <= 3 * n]
    test = [xs[i] for i in range(n) if 4 * (i + 1) > 3 * n]
    st = sorted(train)
    var95 = st[math.ceil(len(st) / 20) - 1]
    e = [1 if x < var95 else 0 for x in test]
    nt, xx = len(e), sum(e)
    lr_pof = -2.0 * (
        (nt - xx) * math.log(0.95)
        + xx * math.log(0.05)
        - ((nt - xx) * math.log((nt - xx) / nt) if nt - xx > 0 else 0.0)
        - (xx * math.log(xx / nt) if xx > 0 else 0.0)
    )
    trans = Counter(zip(e, e[1:]))
    n00, n01 = trans.get((0, 0), 0), trans.get((0, 1), 0)
    n10, n11 = trans.get((1, 0), 0), trans.get((1, 1), 0)
    ntr = n00 + n01 + n10 + n11
    ne = n01 + n11
    lr_ind = -2.0 * (
        (
            (n00 + n10) * math.log(1.0 - ne / ntr) + ne * math.log(ne / ntr)
            if (n00 + n10) > 0 and ne > 0 and ntr > 0
            else 0.0
        )
        - (n00 * math.log(n00 / (n00 + n01)) if n00 > 0 else 0.0)
        - (n01 * math.log(n01 / (n00 + n01)) if n01 > 0 else 0.0)
        - (n10 * math.log(n10 / (n10 + n11)) if n10 > 0 else 0.0)
        - (n11 * math.log(n11 / (n10 + n11)) if n11 > 0 else 0.0)
    )
    assert row["n_train"] == len(train)
    assert row["n_test"] == nt
    assert row["var95_dollars"] == var95
    assert row["n_exceptions"] == xx
    assert abs(row["lr_pof"] - lr_pof) < 1e-4
    assert abs(row["lr_independence"] - lr_ind) < 1e-4
    assert row["lr_pof"] >= 0


def test_omega_sortino_replay(spark):
    row = plans.REGISTRY["weekly_change_omega_sortino"].build(spark, SF).collect()[0]
    w = _series(spark, "week")
    ds = [w[i] - w[i - 1] for i in range(1, len(w))]
    gains = sum(x for x in ds if x > 0)
    losses = sum(-x for x in ds if x < 0)
    down2 = sum(x * x for x in ds if x < 0)
    net = sum(ds)
    n = len(ds)
    assert row["n_changes"] == n
    assert row["gains_dollars"] == gains
    assert row["losses_dollars"] == losses
    assert abs(row["omega_ratio"] - gains / losses) < 1e-5
    assert abs(row["sortino_ratio"] - net / math.sqrt(n * down2)) < 1e-5


def test_blomqvist_replay(spark):
    row = plans.REGISTRY["qty_price_blomqvist_beta"].build(spark, SF).collect()[0]
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        )
        .collect()
    )
    qs = sorted(r["q"] for r in li)
    ps = sorted(r["p"] for r in li)
    n = len(li)
    mq = qs[(n + 1) // 2 - 1]
    mp = ps[(n + 1) // 2 - 1]
    conc = sum(
        1
        for r in li
        if (r["q"] > mq and r["p"] > mp) or (r["q"] < mq and r["p"] < mp)
    )
    disc = sum(
        1
        for r in li
        if (r["q"] > mq and r["p"] < mp) or (r["q"] < mq and r["p"] > mp)
    )
    assert row["n_lines"] == n
    assert row["med_qty"] == mq
    assert row["med_price_cents"] == mp
    assert row["n_concordant"] == conc
    assert row["n_discordant"] == disc
    assert abs(row["blomqvist_beta"] - (conc - disc) / (conc + disc)) < 1e-5
    assert -1 <= row["blomqvist_beta"] <= 1
