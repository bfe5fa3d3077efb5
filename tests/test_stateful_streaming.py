"""applyInPandasWithState operator: incremental per-key state across
micro-batches must converge to the batch ground truth (SURVEY §2.10)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_chunks(spark, tmp_path_factory):
    from pyspec_spark.tables import table

    base = str(tmp_path_factory.mktemp("state_src"))
    pdf = table(spark, SF, "events").orderBy("ts").toPandas()
    chunk = (len(pdf) + 4) // 5
    for i in range(5):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(
                os.path.join(base, f"chunk_{i:02d}.parquet"),
                index=False,
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
    return base


def test_running_totals_stream_converges_to_batch(spark, event_chunks):
    from pyspec_spark.streaming.events import read_event_stream
    from pyspec_spark.streaming.stateful import running_totals
    from pyspec_spark.tables import table

    stream = read_event_stream(spark, event_chunks, max_files_per_trigger=1)
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("t_state").toPandas()
    # one emission per (user, micro-batch-with-data); the LAST emission
    # per user carries the final running totals
    final = emitted.sort_values(["user_id", "n_events"]).groupby("user_id").last()

    truth = (
        table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (final["n_events"] == truth["n"]).all()
    assert abs(final["sum_value"] - truth["s"]).max() < 1e-6
    # incrementality: users seen in several batches emitted several times
    multi = emitted.groupby("user_id").size()
    assert (multi > 1).any()
    # per-batch emission counts sum to the final count
    per_user_batch_sum = emitted.groupby("user_id")["batch_events"].sum()
    assert (per_user_batch_sum == truth["n"]).all()


def test_transition_counts_stream_converges_to_batch(spark, event_chunks):
    """Cross-batch transition chaining: summing the per-batch emitted
    (prev, next) counts at stream end must equal the batch
    q_event_transitions counts exactly — the boundary transition
    between a user's last event of batch i and first event of batch
    i+1 is exactly what the keyed state carries."""
    from pyspec_spark.queries.events_analytics import q_event_transitions
    from pyspec_spark.streaming.events import read_event_stream
    from pyspec_spark.streaming.stateful import transition_counts
    from pyspec_spark.tables import table

    # precondition the twin relies on: in-order replay is unambiguous
    # because (user_id, ts) is unique in the fixture corpus
    ev = table(spark, SF, "events")
    assert (
        ev.groupBy("user_id", "ts").count().where("count > 1").count() == 0
    )

    stream = read_event_stream(spark, event_chunks, max_files_per_trigger=1)
    q = (
        transition_counts(stream)
        .writeStream.format("memory")
        .queryName("t_trans")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.table("t_trans").toPandas()
    got = (
        emitted.groupby(["prev_type", "next_type"])["n"]
        .sum()
        .to_dict()
    )
    want = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in q_event_transitions.__wrapped__(spark, SF).collect()
    }
    assert got == want and got
    # cross-batch chaining actually happened: some user emitted
    # transitions in more than one batch
    multi = emitted.groupby("user_id").size()
    assert (multi > 1).any()
