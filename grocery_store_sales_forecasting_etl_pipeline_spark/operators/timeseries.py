"""Time-series regularization operators: calendar gap filling,
forward fill, and resampling.

The reference encodes time series as plain tables + window functions
(SURVEY.md §1 "Time series semantics") and silently DROPS dates missing
an oil quote (silver_processing.py.py:74 — the lossy na.drop the
pipeline reproduces). These operators are the designed extension SURVEY
§2.3 notes: instead of dropping gap dates, materialize the full
calendar per entity and carry values forward.

Scale design: the calendar is built per entity from its own [min, max]
span with ``sequence()`` + ``explode`` — no driver-side date loop, no
cross join against a global calendar (which at 100 TB would inflate
every entity to the global span). Forward fill is one window pass
(``last(ignorenulls=True)`` over rows-unbounded-preceding), partitioned
by entity — the same single shuffle the gap-fill join already needs.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def entity_calendar(
    df: DataFrame, entity_cols: Sequence[str], date_col: str, step_days: int = 1
) -> DataFrame:
    """One row per (entity, date) for every date in the entity's own
    [min, max] observed span."""
    span = df.groupBy(*entity_cols).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    return span.select(
        *entity_cols,
        F.explode(
            F.sequence("__d0", "__d1", F.expr(f"INTERVAL {step_days} DAY"))
        ).alias(date_col),
    )


def gap_fill(
    df: DataFrame,
    entity_cols: Sequence[str],
    date_col: str,
    zero_fill: Sequence[str] = (),
    ffill: Sequence[str] = (),
) -> DataFrame:
    """Left-join observations onto the entity calendar; missing rows get
    0 for ``zero_fill`` columns (counts/sums) and the last observed
    value for ``ffill`` columns (prices/levels)."""
    cal = entity_calendar(df, entity_cols, date_col)
    keys = [*entity_cols, date_col]
    filled = cal.join(df, on=keys, how="left")
    for c in zero_fill:
        filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill:
        w = (
            Window.partitionBy(*entity_cols)
            .orderBy(date_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ffill:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled
