"""Custom stateful streaming operators via ``applyInPandasWithState`` —
SURVEY.md §2.10 / the north-star brief's "custom stateful operators".

The domain shape being modeled: a detector event stream where each key
(user/detector channel) accumulates counts and the pipeline must emit
running statistics and threshold-crossing alerts *incrementally* — the
streaming twin of the reference's cumulative-monitor idiom
(`numpy.cumsum` over scan points, SURVEY §2 W4).

State per key = (n, sum, sum_sq): constant size, so a 100 TB/day stream
holds state proportional to distinct keys only; Spark checkpoints it and
redistributes on rescale.  Emission is per-micro-batch (one row per key
per batch that saw data) — append-mode compatible.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("total_sq", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("mean_value", DoubleType()),
        StructField("batch_events", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, total_sq = state.get if state.exists else (0, 0.0, 0.0)
    batch_n = 0
    for pdf in pdfs:
        v = pdf["value"].astype(float)
        batch_n += len(v)
        n += len(v)
        total += float(v.sum())
        total_sq += float((v * v).sum())
    state.update((n, total, total_sq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "mean_value": [total / n if n else None],
            "batch_events": [batch_n],
        }
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n, sum, mean) emitted each micro-batch the user
    appears in.  Works on both a streaming and a batch DataFrame (batch
    = single mega-batch, emitting the final totals once)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
