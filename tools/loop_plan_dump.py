#!/usr/bin/env python
"""Dump the PER-ROUND (loop-body) physical plans of the iterative graph
operators — the plans the committed query dumps cannot show.

The r11 verdict (#3) flagged that `plans/r11/dedup_components_*.txt` and
`supplier_graph_pagerank_*.txt` only capture the post-localCheckpoint
TAIL of each query: the connected-components star rounds and the
PageRank diffusion rounds execute during build behind LogicalRDD
checkpoint boundaries, so the one-exchange-per-round claims were
test-verified but not plan-verified. This tool applies the ROUND
FUNCTIONS to concrete leaf frames and explains the round body itself:

  - cc_round_window : _canonical(_small_star_window(_large_star_window(E)))
  - cc_round_join   : _canonical(_small_star(_large_star(E)))
  - pagerank_round  : und_d ⋈ mass on u → groupBy(v) partial-sum body

The leaves are localCheckpointed (exactly as the loop state is), so the
dumped plan is the real per-round unit of work: every Exchange visible
above the LogicalRDD leaves is paid once per round.

Usage: python tools/loop_plan_dump.py   (writes plans/r12/loop_*.txt)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from grocery_store_sales_forecasting_etl_pipeline_spark.operators import graph
from grocery_store_sales_forecasting_etl_pipeline_spark.session import get_spark


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="loop-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    # a real edge frame at the dedup grain: supplier-part co-sourcing
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.select(F.col("l_suppkey").alias("u"), (F.col("l_partkey") + 1_000_000).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e_canon = graph._canonical(edges).localCheckpoint(eager=False)

    # CC round bodies (what one loop iteration plans, leaf = checkpointed state)
    win = graph._canonical(
        graph._small_star_window(graph._large_star_window(e_canon))
    )
    join = graph._canonical(graph._small_star(graph._large_star(e_canon)))
    (out_dir / "loop_cc_round_window.txt").write_text(_fmt(win))
    (out_dir / "loop_cc_round_join.txt").write_text(_fmt(join))

    # PageRank round body: und_d (degree folded in, checkpointed) ⋈ mass
    und = graph._symmetrize(graph._canonical(edges)).localCheckpoint(eager=False)
    deg = und.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    und_d = und.join(deg, "u").localCheckpoint(eager=False)
    mass = deg.select(
        F.col("u").alias("v"), F.lit(1_000_000).cast("long").alias("m")
    ).localCheckpoint(eager=False)
    rnd = (
        und_d.join(mass.select(F.col("v").alias("u"), "m"), "u")
        .select("v", F.expr("(17 * m) DIV (20 * d)").alias("share"))
        .groupBy("v")
        .agg((F.lit(150_000) + F.sum("share")).cast("long").alias("m"))
    )
    (out_dir / "loop_pagerank_round.txt").write_text(_fmt(rnd))

    for f in sorted(out_dir.glob("loop_*.txt")):
        n_ex = f.read_text().count("Exchange")
        print(f"{f.name}: {n_ex} Exchange node(s)")
    spark.stop()


if __name__ == "__main__":
    main()
