"""Join operators.

The reference's join surface is chained left equi-joins of one fact to
small dims (silver_processing.py.py:49-53); Catalyst broadcast-hash-joins
those for free. This module generalizes that surface with the join kinds a
complete engine needs — semi/anti, non-equi range join, and an as-of join
(Spark has no native ASOF; implemented as union + forward-fill window,
which is shuffle-minimal and scales to arbitrarily large both-sides).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def enrich_left(fact: DataFrame, dims: Sequence[tuple[DataFrame, str]]) -> DataFrame:
    """Chain left equi-joins of ``fact`` to ``(dim, key)`` pairs, always
    broadcasting the dim side (reference J1-J3 shape).

    At 100 TB the fact must never shuffle for dim enrichment; explicit
    ``F.broadcast`` guarantees the plan regardless of stale size stats.
    """
    out = fact
    for dim, key in dims:
        out = out.join(F.broadcast(dim), on=key, how="left")
    return out


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (EXISTS). Right side is
    reduced to its join keys before the shuffle — at scale this is the
    difference between shuffling a key column and a whole table."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    fact: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Non-equi join of ``fact.value_col`` into ``[lo, hi)`` buckets.

    The bucket table is broadcast: a non-equi condition forces
    BroadcastNestedLoopJoin, which is only acceptable because the build
    side is tiny — never range-join two large tables directly; bucket the
    fact side first and equi-join on the bucket id instead.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(buckets), on=cond, how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: a hot key's rows no longer land in one
    task. Left rows get a deterministic salt in [0, n_salts) hashed from
    the whole row; the right side is replicated n_salts× (explode) so
    every (key, salt) finds its match. Equivalent results to
    ``left.join(right, on, how)`` for one-row-per-key right sides.

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated, so right/full-outer would emit each UNMATCHED right row
    n_salts times (matched rows are fine under any how — each left row
    still meets each right row exactly once, on its own salt).

    AQE's skew-join split handles sort-merge skew automatically; salting
    remains the tool when the skew is in a HASH aggregate feeding the
    join or when AQE can't split (e.g. bucketed inputs).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left'}}, got {how!r}: the "
            "replicated right side would duplicate unmatched right rows "
            "n_salts times under right/full-outer semantics"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, on=[on, "__salt"], how=how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same key group (backward as-of, tie
    matches — DuckDB/pandas ``merge_asof`` semantics).

    Spark-first implementation: union both sides tagged by origin, then a
    single window pass per key ordered by (ts, origin) forward-fills the
    most recent right-side values onto left rows with
    ``last(col, ignorenulls=True)``. One shuffle on the key — same cost
    as a regular join — no row explosion, no non-equi nested loop, and
    both sides may be arbitrarily large (contrast range_join). Right rows
    sort before left rows at equal ts so ties match.
    """
    lcols = left.columns
    sel_left = [F.col(c) for c in lcols] + [
        F.lit(None).cast(right.schema[v].dataType).alias(f"{v}{suffix}") for v in right_values
    ]
    sel_right = (
        [F.col(k) for k in keys]
        + [F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys]
        + [F.col(v).alias(f"{v}{suffix}") for v in right_values]
    )
    l_tagged = left.select(*sel_left, F.lit(1).alias("__origin"), F.col(left_ts).alias("__ts"))
    r_tagged = right.select(*sel_right, F.lit(0).alias("__origin"), F.col(right_ts).alias("__ts"))
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__origin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if not c.startswith("__") and not c.endswith(suffix)],
        F.col("__origin").alias("__origin"),
        *[
            F.last(f"{v}{suffix}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in right_values
        ],
    )
    return filled.filter(F.col("__origin") == 1).drop("__origin")
