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
    StringType,
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


# ---------------------------------------------------------------------------
# Cross-batch event-transition counting (r5b) — the stateful streaming
# face of q_event_transitions.  A transition (prev -> next) can span a
# micro-batch boundary, so unlike the stateless curation stages this
# NEEDS keyed state: the last (ts, event_id, event_type) seen per user.
# Each batch sorts its slice by (ts, event_id) — the batch query's
# exact tiebreak — chains it onto the stored last event, emits the
# batch's (prev_type, next_type) counts, and stores the new last
# event.  State is 3 scalars per user; emission is append-mode.
# Stream-end equality with the batch transition counts is twin-tested
# (in-order replay; the fixture guarantees per-user ts uniqueness).
# ---------------------------------------------------------------------------
TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("last_eid", LongType()),
        StructField("last_type", StringType()),
    ]
)

TRANSITION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("n", LongType()),
    ]
)


def _transition_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import pandas as pd_  # noqa: PLC0415 - executor-side

    rows = pd_.concat(list(pdfs), ignore_index=True)
    if len(rows) == 0:
        return
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    types = rows["event_type"].tolist()
    prev_chain = types[:-1]
    next_chain = types[1:]
    if state.exists:
        _, _, last_type = state.get
        prev_chain = [last_type] + types[:-1]
        next_chain = types
    last = rows.iloc[-1]
    state.update(
        (
            int(pd_.Timestamp(last["ts"]).value // 1000),
            int(last["event_id"]),
            str(last["event_type"]),
        )
    )
    if not prev_chain:
        return
    counts: dict[tuple[str, str], int] = {}
    for a, b in zip(prev_chain, next_chain):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    yield pd_.DataFrame(
        {
            "user_id": [key[0]] * len(counts),
            "prev_type": [k[0] for k in counts],
            "next_type": [k[1] for k in counts],
            "n": list(counts.values()),
        }
    )


def transition_counts(events: DataFrame) -> DataFrame:
    """Per-user per-batch (prev_type, next_type) transition counts with
    cross-batch chaining; batch-or-streaming (batch = one mega-batch =
    the full chain).  Sum the emitted ``n`` per (prev, next) at stream
    end to reproduce the batch q_event_transitions counts."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transition_update,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
