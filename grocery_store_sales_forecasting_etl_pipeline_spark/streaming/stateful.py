"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.12 extension): online per-key outlier flagging.

The operator keeps Welford running statistics (n, mean, M2) per user
across micro-batches and flags events whose value deviates more than
``threshold`` standard deviations from the mean of all PRIOR events —
state that no built-in windowed aggregate expresses (the statistics span
the whole stream, not a window, and must survive batch boundaries).

Scale notes: state is three doubles per key — millions of keys fit
comfortably in the state store; for unbounded key cardinality pass
``timeout="ProcessingTimeTimeout"`` so idle keys are evicted.
Batches arrive per key time-ordered within a file-ordered stream; the
function re-sorts each batch by (ts, event_id) so replays are
deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTLIER_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_outlier", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _make_score_batch():
    """Factory returning the scoring closure. The function MUST be
    dynamic (not a plain module-level def): cloudpickle serializes
    dynamic functions BY VALUE, so executors never need this repo on
    their PYTHONPATH — a module-level def pickles by reference and
    raises ModuleNotFoundError on workers when the driver runs from an
    arbitrary cwd."""

    def score_batch(pdf, n, mean, m2):
        """Score rows against stats of PRIOR rows, then fold them in
        (Welford)."""
        import math

        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        zs, flags = [], []
        for v in pdf["value"]:
            if n >= 2 and m2 > 0:
                std = math.sqrt(m2 / (n - 1))
                z = (v - mean) / std
            else:
                z = 0.0
            zs.append(z)
            flags.append(abs(z) > 3.0)
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
        out = pdf[["user_id", "event_id", "ts", "value"]].copy()
        out["zscore"] = zs
        out["is_outlier"] = flags
        return out, n, mean, m2

    return score_batch


# shared by the operator (serialized by value) and the equivalence test
_score_batch = _make_score_batch()


def stateful_outliers(
    events: DataFrame, timeout: str = "NoTimeout", idle_timeout_ms: int = 3_600_000
) -> DataFrame:
    """Flag per-user value outliers with cross-batch Welford state.
    Works on a streaming frame (update mode); each emitted row carries
    the z-score against all prior same-user events.

    ``timeout`` maps to the GroupStateTimeout conf: ``"NoTimeout"``
    keeps state for every key forever (state grows with key
    cardinality); ``"ProcessingTimeTimeout"`` evicts keys idle for
    ``idle_timeout_ms`` — the bound an unbounded-cardinality stream
    needs (an evicted key that reappears simply restarts its statistics
    from zero). EventTimeTimeout is not supported: the operator keeps
    whole-stream statistics and defines no watermark.
    """

    score_batch = _make_score_batch()  # dynamic → pickled by value
    timeouts = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
    }
    if timeout not in timeouts:
        raise ValueError(f"timeout must be one of {sorted(timeouts)}, got {timeout!r}")
    with_eviction = timeout == "ProcessingTimeTimeout"

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-key eviction: drop the statistics, emit nothing
            state.remove()
            return
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        for pdf in pdfs:
            out, n, mean, m2 = score_batch(pdf, n, mean, m2)
            yield out
        state.update((n, mean, m2))
        if with_eviction:
            state.setTimeoutDuration(idle_timeout_ms)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTLIER_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeouts[timeout],
    )
