"""Streaming twin tests (SURVEY.md §5.2 layer 4 + ST4 watermark
semantics, FIXTURES.md B4): each streaming op, executed over the sf0.001
events table replayed as a chunked file stream, must equal its batch twin
at stream end; late data beyond the watermark is dropped."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_chunks(spark, tmp_path_factory):
    """Events split into 10 parquet chunk-files, ordered by ts (in-order
    replay) — B4's micro-batch source."""
    from pyspec_spark.tables import table

    base = str(tmp_path_factory.mktemp("stream_src"))
    ev = table(spark, SF, "events").orderBy("ts")
    n = ev.count()
    pdf = ev.toPandas()
    chunk = (n + 9) // 10
    for i in range(10):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(
                os.path.join(base, f"chunk_{i:02d}.parquet"),
                index=False,
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
    return base, n


def _collect_sorted(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize("op_name", ["tumbling", "sliding", "session"])
def test_stream_equals_batch(spark, event_chunks, op_name):
    import pyspec_spark.streaming.events as se
    from pyspec_spark.tables import table

    base, _ = event_chunks
    op = getattr(se, op_name)
    stream = se.read_event_stream(spark, base, max_files_per_trigger=2)
    se.run_to_memory(op(stream), f"t_{op_name}", output_mode="complete")
    got = spark.table(f"t_{op_name}")
    want = op(table(spark, SF, "events"))
    cols = want.columns
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)


def test_stream_dedup_counts(spark, event_chunks):
    import pyspec_spark.streaming.events as se
    from pyspec_spark.tables import table

    base, _ = event_chunks
    stream = se.read_event_stream(spark, base, max_files_per_trigger=2)
    se.run_to_memory(se.dedup(stream), "t_dedup", output_mode="append")
    got = spark.table("t_dedup")
    want = table(spark, SF, "events").dropDuplicates(["user_id", "event_type"])
    # Within-watermark dedup only guarantees uniqueness inside the state
    # retention horizon: a key recurring after eviction is re-emitted.  So
    # the DISTINCT key set equals the batch twin's, and the emitted row
    # count sits between distinct-keys and total events.
    gk = set(map(tuple, got.select("user_id", "event_type").distinct().collect()))
    wk = set(map(tuple, want.select("user_id", "event_type").collect()))
    assert gk == wk
    n_events = table(spark, SF, "events").count()
    assert len(wk) <= got.count() <= n_events


def test_stream_enrich_equals_batch(spark, event_chunks):
    import pyspec_spark.streaming.events as se
    from pyspec_spark.tables import table

    base, _ = event_chunks
    stream = se.read_event_stream(spark, base, max_files_per_trigger=3)
    se.run_to_memory(
        se.enrich(stream, table(spark, SF, "customer")), "t_enrich", "append"
    )
    got = spark.table("t_enrich")
    want = se.enrich(table(spark, SF, "events"), table(spark, SF, "customer"))
    cols = ["event_id", "user_id", "event_type", "c_mktsegment"]
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)


def test_session_stream_out_of_order_replay_sf001(spark, tmp_path_factory):
    """VERDICT r2 item 8: the session-window stream must converge to the
    batch gap-and-island answer (q_events_session) when the sf0.01
    events table is replayed in a deterministically SHUFFLED order —
    sessions assemble from fragments arriving in arbitrary micro-batches,
    exercising Spark's merging session state.  The watermark is wider
    than the dataset's time span so no event is late-dropped: the test
    isolates out-of-order merging, not lateness policy (which
    test_watermark_drops_late_data covers).  Runtime-capped."""
    import time

    import pyspec_spark.streaming.events as se
    from pyspec_spark.queries.events import q_events_session
    from pyspec_spark.tables import table

    t0 = time.time()
    sf01 = "/root/testdata/sf0.01"
    base = str(tmp_path_factory.mktemp("ooo_stream"))
    ev = table(spark, sf01, "events")
    # deterministic shuffle: md5 of event_id scatters timestamps across
    # chunks uniformly, so every micro-batch carries events from the
    # whole time range
    pdf = ev.orderBy(F.md5(F.col("event_id").cast("string"))).toPandas()
    n = len(pdf)
    n_chunks = 20
    chunk = (n + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(
                os.path.join(base, f"chunk_{i:02d}.parquet"),
                index=False,
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
    stream = se.read_event_stream(spark, base, max_files_per_trigger=4)
    se.run_to_memory(
        se.session(stream, watermark="3650 days"), "t_sess_ooo", "complete"
    )
    got = spark.table("t_sess_ooo")
    want = q_events_session(spark, sf01)
    # session_window's end = last event + gap; the batch twin's end = the
    # last event itself — shift to compare
    gap_us = 1_800_000_000
    want_cmp = want.select(
        "user_id",
        "session_start_us",
        (F.col("session_end_us") + gap_us).alias("session_end_us"),
        "n_events",
        "sum_value",
    )
    cols = ["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"]
    assert _collect_sorted(got.select(*cols), cols) == _collect_sorted(want_cmp, cols)
    assert n >= 5000, f"sf0.01 events table unexpectedly small ({n})"
    assert time.time() - t0 < 300, "out-of-order replay exceeded runtime cap"


def test_watermark_drops_late_data(spark, tmp_path):
    """ST4: with a 10-minute watermark, events arriving after the
    watermark has passed their window are dropped from append output."""
    import pandas as pd

    import pyspec_spark.streaming.events as se

    base = str(tmp_path / "late_src")
    os.makedirs(base)
    # Watermark filtering lags one batch (the filter in batch N uses the
    # watermark computed after batch N-1), so: b0 advances event time,
    # b1 is a spacer that commits the advanced watermark, b2 carries the
    # late row — by then the 00:00-01:00 window is finalized.
    rows0 = []
    for h in range(3):
        for i in range(10):
            rows0.append((h * 100 + i, pd.Timestamp(f"2024-01-01 {h:02d}:30:00"),
                          1, "view", 1.0, "{}"))
    rows1 = [(500, pd.Timestamp("2024-01-01 03:30:00"), 1, "view", 1.0, "{}")]
    rows2 = [(9999, pd.Timestamp("2024-01-01 00:45:00"), 1, "view", 100.0, "{}"),
             (10000, pd.Timestamp("2024-01-01 04:30:00"), 1, "view", 1.0, "{}")]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    for i, rows in enumerate([rows0, rows1, rows2]):
        f = f"{base}/b{i}.parquet"
        pd.DataFrame(rows, columns=cols).to_parquet(f, **kw)
        # file source orders batches by modification time — make it explicit
        os.utime(f, (1000000000 + 100 * i, 1000000000 + 100 * i))

    stream = se.read_event_stream(spark, base, max_files_per_trigger=1)
    se.run_to_memory(se.tumbling(stream), "t_late", output_mode="append")
    got = {r["bucket"].hour: r for r in spark.table("t_late").collect()}
    # hour-0 window was finalized before the late row arrived: n==10 and
    # the 100.0 value is NOT included
    assert got[0]["n"] == 10
    assert got[0]["sum_value"] == pytest.approx(10.0)


def test_parquet_sink_and_foreach_batch(spark, event_chunks, tmp_path):
    import pyspec_spark.streaming.events as se

    base, n = event_chunks
    stream = se.read_event_stream(spark, base, max_files_per_trigger=5)
    out = str(tmp_path / "sink")
    se.run_to_parquet(
        se.enrich(stream, __import__("pyspec_spark.tables", fromlist=["table"]).table(spark, SF, "customer")),
        out,
        str(tmp_path / "ckpt"),
    )
    sunk = spark.read.parquet(out)
    assert sunk.count() > 0
    # foreachBatch: accumulate batch row counts
    seen = []
    stream2 = se.read_event_stream(spark, base, max_files_per_trigger=5)
    se.run_foreach_batch(stream2, lambda df, bid: seen.append(df.count()), "append")
    assert sum(seen) == n


def test_stream_rollup_cascade_twin(spark, event_chunks):
    """ST8 twin: the minute level computed as a real watermarked stream,
    then batch-merged to hour and day, must equal the all-batch cascade
    (operators/rollup.py) at every level."""
    import pyspec_spark.streaming.events as se
    from pyspec_spark.operators.rollup import merge_level, rollup_cascade
    from pyspec_spark.tables import table

    base, _ = event_chunks
    stream = se.read_event_stream(spark, base, max_files_per_trigger=2)
    se.run_to_memory(
        se.rollup_minute(stream), "t_rollup_minute", output_mode="complete"
    )
    streamed_minute = spark.table("t_rollup_minute")

    batch = rollup_cascade(
        table(spark, SF, "events"), "ts", ["event_type"], "value"
    )
    cols = ["bucket", "event_type", "n", "sum_micro", "min_v", "max_v"]
    assert _collect_sorted(streamed_minute, cols) == _collect_sorted(
        batch["minute"], cols
    )
    cur = streamed_minute
    for lv in ("hour", "day"):
        cur = merge_level(cur, lv, ["event_type"])
        assert _collect_sorted(cur, cols) == _collect_sorted(batch[lv], cols), lv


# ---------------------------------------------------------------------------
# Incremental corpus curation (r4): the stateless curation prefix
# (quality signals -> gate -> PII scrub) over a chunked document stream
# equals the batch path at stream end.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def doc_chunks(spark, tmp_path_factory):
    from pyspec_spark.tables import table

    base = str(tmp_path_factory.mktemp("doc_stream_src"))
    d = table(spark, SF, "documents").orderBy("doc_id")
    pdf = d.toPandas()
    n = len(pdf)
    chunk = (n + 3) // 4
    for i in range(4):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(os.path.join(base, f"docs_{i}.parquet"), index=False)
    return base, n


def test_stream_corpus_curation_equals_batch(spark, doc_chunks):
    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se
    from pyspec_spark.tables import table

    base, n = doc_chunks
    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    assert stream.isStreaming
    # threshold at the corpus median so the gate demonstrably filters
    # (the synthetic word-salad corpus is uniformly mid-quality; 0.78 is
    # its measured median at sf0.001)
    se.run_to_memory(
        sc.curate(stream, min_quality=0.78), "t_curate", output_mode="append"
    )
    got = spark.table("t_curate")
    want = sc.curate(table(spark, SF, "documents"), min_quality=0.78)
    cols = want.columns
    assert got.columns == cols
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)
    # the gate actually filters (neither empty nor pass-through)
    kept = got.count()
    assert 0 < kept < n


def test_stream_bloom_screen_equals_batch(spark, doc_chunks):
    """Decontamination screening over the chunked document stream
    (static pre-built filter, stateless per-doc probe) must equal the
    batch q_bloom_decontam rows exactly at stream end — the streaming
    face of the L14 Bloom path."""
    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se
    from pyspec_spark.operators.bloom import bloom_build, bloom_to_array
    from pyspec_spark.queries.curation import (
        _BENCH_MAX_ID,
        _BLOOM_MIN,
        _shingled,
        q_bloom_decontam,
    )

    base, _ = doc_chunks
    bench = (
        _shingled(spark, SF)
        .where(F.col("doc_id") < _BENCH_MAX_ID)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    # deployment shape: the benchmark filter is built once, up front
    bloom_arr = bloom_to_array(bloom_build(bench))
    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    screened = sc.bloom_screen_stream(
        stream.where(F.col("doc_id") >= _BENCH_MAX_ID),
        bloom_arr,
        min_containment=_BLOOM_MIN,
    )
    se.run_to_memory(screened, "t_bloom", output_mode="append")
    got = spark.table("t_bloom")
    want = q_bloom_decontam.__wrapped__(spark, SF)
    cols = want.columns
    assert got.columns == cols
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)
    assert got.count() > 0


def test_stream_cms_sketch_equals_batch(spark, doc_chunks):
    """Count-min sketches are sum-mergeable, so the sketch built
    incrementally over the chunked document stream (complete mode)
    must equal the batch sketch EXACTLY at stream end — the streaming
    face of the heavy-hitters pipeline."""
    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se
    from pyspec_spark.operators.text import count_min_sketch
    from pyspec_spark.tables import table

    base, _ = doc_chunks
    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    terms = stream.select(F.explode(F.split("text", " ")).alias("term"))
    se.run_to_memory(
        count_min_sketch(terms, d=4, w=512), "t_cms", output_mode="complete"
    )
    got = {
        (r["j"], r["bucket"]): r["cnt"] for r in spark.table("t_cms").collect()
    }
    batch_terms = table(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    want = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(batch_terms, d=4, w=512).collect()
    }
    assert got == want and got


def test_cms_merge_linearity(spark):
    """sketch(A union B) == cellwise sum of sketch(A) and sketch(B) —
    the property that makes CMS shard- and stream-mergeable."""
    from pyspec_spark.operators.text import count_min_sketch
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents")
    a = docs.where("doc_id % 2 = 0").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    b = docs.where("doc_id % 2 = 1").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    sk = lambda df: {  # noqa: E731
        (r["j"], r["bucket"]): r["cnt"]
        for r in count_min_sketch(df, d=4, w=512).collect()
    }
    sa, sb, sall = sk(a), sk(b), sk(a.unionAll(b))
    merged = {}
    for d in (sa, sb):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == sall


def test_stream_dedup_docs_across_batches(spark, tmp_path_factory):
    """Docs duplicated ACROSS stream chunks (later chunk replays earlier
    content under new ids) are dropped by cross-batch state: stream-end
    distinct texts equal the batch distinct set, first-seen wins."""
    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se
    from pyspec_spark.tables import table

    base = str(tmp_path_factory.mktemp("dedup_stream_src"))
    d = table(spark, SF, "documents").orderBy("doc_id").limit(40)
    pdf = d.toPandas()
    # chunk 0: docs 0..19; chunk 1: docs 20..39 PLUS replays of 0..9
    # under shifted ids (exact dup content arriving later)
    import pandas as pd

    dup = pdf.iloc[:10].copy()
    dup["doc_id"] = dup["doc_id"] + 100000
    pdf.iloc[:20].to_parquet(os.path.join(base, "c0.parquet"), index=False)
    pd.concat([pdf.iloc[20:], dup]).to_parquet(
        os.path.join(base, "c1.parquet"), index=False
    )

    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    se.run_to_memory(sc.dedup_stream(stream), "t_docdedup", output_mode="append")
    got = spark.table("t_docdedup").collect()
    # every distinct text exactly once, and no replayed id survived
    assert len(got) == 40
    assert len({r["text_md5"] for r in got}) == 40
    assert all(r["doc_id"] < 100000 for r in got)


def test_stream_hash_embed_equals_batch(spark, doc_chunks):
    """Feature-hash bucket sums are SUM-mergeable, so the embedding
    state built incrementally over chunked crawl batches (complete
    mode) must equal the batch operator's un-normalized counts EXACTLY
    at stream end; normalizing the final state reproduces the batch
    embedding values bit-for-bit."""
    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se
    from pyspec_spark.operators.text import feature_hash_embed
    from pyspec_spark.tables import table

    base, _ = doc_chunks
    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    se.run_to_memory(
        sc.hash_embed_stream(stream, dim=16), "t_fh", output_mode="complete"
    )
    state = spark.table("t_fh").collect()
    # normalize the final state (the consumer-side stateless map) —
    # locally, with the same sqrt/divide/round the batch operator uses
    raw: dict[int, dict[int, int]] = {}
    for r in state:
        raw.setdefault(r["doc_id"], {})[r["dim"]] = r["raw"]
    got = {}
    for d, buckets in raw.items():
        n2 = sum(v * v for v in buckets.values()) ** 0.5
        for k, v in buckets.items():
            if v != 0:  # cancelled buckets ≡ absent buckets ≡ 0.0
                got[(d, k)] = round(v / n2, 6)
    want_rows = feature_hash_embed(
        table(spark, SF, "documents"), dim=16
    ).collect()
    want = {
        (r["doc_id"], r["dim"]): r["fh_val"]
        for r in want_rows
        if r["fh_val"] != 0.0  # streaming state has no explicit zeros
    }
    assert got == want


# ---------------------------------------------------------------------------
# r6 VERDICT #7: the production WRITE path — curation stream foreachBatch
# -> merge_upsert into a lang-partitioned lake + periodic compaction.
# ---------------------------------------------------------------------------
def test_stream_curate_to_lake_merge_upsert(spark, doc_chunks, tmp_path):
    import glob

    import pyspec_spark.streaming.corpus as sc
    from pyspec_spark.sinks import merge_upsert
    from pyspec_spark.tables import table

    base, _ = doc_chunks
    lake = str(tmp_path / "curated_lake")
    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    sc.curate_to_lake(
        stream, spark, lake, min_quality=0.78, compact_every=2,
        files_per_partition=1,
    )

    # 1. end-state equality with the batch pipeline (modulo the lang
    # partition column round-tripping through the directory layout)
    got = spark.read.parquet(lake)
    want = sc.curate(table(spark, SF, "documents"), min_quality=0.78)
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    assert _collect_sorted(got.select(*cols), cols) == _collect_sorted(
        want.select(*cols), cols
    )

    # 2. file-count bound: 4 micro-batches with compact_every=2 must NOT
    # leave ~4 files per partition; the final compaction pass ran at
    # batch 3, so at most files_per_partition + 1 uncompacted batch's
    # worth per partition remains
    n_langs = got.select("lang").distinct().count()
    files = glob.glob(os.path.join(lake, "**", "*.parquet"), recursive=True)
    assert len(files) <= 2 * n_langs, (len(files), n_langs)

    # 3. a later merge touching ONE lang leaves every other partition's
    # files byte-identical (path + mtime + size)
    langs = sorted(r.lang for r in got.select("lang").distinct().collect())
    assert len(langs) >= 2
    touched, untouched = langs[0], langs[1:]

    def census(skip_lang):
        out = {}
        for f in glob.glob(
            os.path.join(lake, "**", "*.parquet"), recursive=True
        ):
            if f"lang={skip_lang}" not in f:
                st = os.stat(f)
                out[f] = (st.st_mtime_ns, st.st_size)
        return out

    before = census(touched)
    upd = (
        got.where(F.col("lang") == touched)
        .limit(5)
        .withColumn("quality", F.lit(0.999))
    )
    merge_upsert(spark, lake, upd, key="doc_id", partition_col="lang")
    assert census(touched) == before  # untouched partitions untouched
    # and the update landed
    assert (
        spark.read.parquet(lake)
        .where((F.col("lang") == touched) & (F.col("quality") == 0.999))
        .count()
        == 5
    )


def test_stream_curate_to_lake_upserts_redelivered_keys(spark, tmp_path):
    """A re-crawled doc_id arriving in a later chunk must UPDATE the
    lake row, not duplicate it — the merge_upsert semantics an append
    sink cannot give."""
    import pandas as pd

    import pyspec_spark.streaming.corpus as sc

    src = tmp_path / "redeliver_src"
    src.mkdir()
    lake = str(tmp_path / "redeliver_lake")
    text = "alpha beta gamma delta epsilon zeta eta theta " * 8
    rows1 = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [text, text + "one"],
            "lang": ["en", "en"],
            "source": ["crawl_a", "crawl_a"],
            "n_chars": [len(text), len(text) + 3],
        }
    )
    # doc 2 re-delivered with new source; doc 3 new
    rows2 = pd.DataFrame(
        {
            "doc_id": [2, 3],
            "text": [text + "one", text + "two"],
            "lang": ["en", "fr"],
            "source": ["crawl_b", "crawl_b"],
            "n_chars": [len(text) + 3, len(text) + 3],
        }
    )
    rows1.to_parquet(src / "chunk_0.parquet", index=False)
    rows2.to_parquet(src / "chunk_1.parquet", index=False)
    stream = sc.read_document_stream(spark, str(src), max_files_per_trigger=1)
    sc.curate_to_lake(stream, spark, lake, min_quality=0.0, compact_every=0)
    got = (
        spark.read.parquet(lake)
        .select("doc_id", "source")
        .orderBy("doc_id")
        .collect()
    )
    assert [r.doc_id for r in got] == [1, 2, 3]
    assert got[1].source == "crawl_b"  # updated in place, not duplicated


# ---------------------------------------------------------------------------
# r6: streaming NEAR-dup suppression (MinHash band buckets with keyed
# state) — the incremental complement of exact-hash dedup_stream.
# ---------------------------------------------------------------------------
def test_band_hashes_stateless_match_batch_operator(spark):
    """The map-only band hashes must equal the batch pipeline's
    (minhash_signatures -> banding) exactly — same md5 salt basis."""
    import pyspec_spark.streaming.corpus as sc
    from pyspec_spark.operators.dedup import minhash_signatures
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents").where(F.col("doc_id") < 120)
    got = {
        (r.doc_id, r.band, r.band_hash)
        for r in sc.band_hashes_stateless(docs, n_hashes=16, bands=4).collect()
    }
    from pyspec_spark.operators.dedup import band_hashes_from_sigs

    sigs = minhash_signatures(docs, n_hashes=16)
    want = {
        (r.id, r.band, r.band_hash)
        for r in band_hashes_from_sigs(sigs, bands=4, n_hashes=16).collect()
    }
    assert got == want and len(got) > 0


def test_neardup_stream_equals_batch_rule(spark, doc_chunks):
    """Replayed in doc_id order, the streaming keyed-state suppression
    must flag EXACTLY the docs that share a band bucket with a smaller
    doc_id (the batch owner rule), with the right owners."""
    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se
    from pyspec_spark.tables import table

    base, _ = doc_chunks
    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    se.run_to_memory(
        sc.neardup_stream(stream, n_hashes=16, bands=4),
        "t_neardup",
        output_mode="append",
    )
    got_rows = spark.table("t_neardup").collect()
    got_pairs = {(r.doc_id, r.owner_id) for r in got_rows}
    got_suppressed = {r.doc_id for r in got_rows}

    banded = sc.band_hashes_stateless(
        table(spark, SF, "documents"), n_hashes=16, bands=4
    )
    buckets = banded.groupBy("band", "band_hash").agg(
        F.min("doc_id").alias("owner"),
        F.collect_set("doc_id").alias("ids"),
    )
    want_pairs = {
        (i, r.owner)
        for r in buckets.collect()
        for i in r.ids
        if i != r.owner
    }
    assert got_pairs == want_pairs
    assert got_suppressed == {p[0] for p in want_pairs}
    # the planted near-dups in the corpus make this non-trivial
    assert len(got_suppressed) > 0


def test_neardup_stream_cross_batch_state(spark, tmp_path):
    """A near-identical doc arriving in a LATER batch is flagged with
    the batch-1 owner — proof the bucket state crosses batches."""
    import pandas as pd

    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se

    src = tmp_path / "nd_src"
    src.mkdir()
    base_text = "the quick brown fox jumps over the lazy dog " * 6
    mk = lambda i, t: {
        "doc_id": i, "text": t, "lang": "en", "source": "s",
        "n_chars": len(t),
    }
    pd.DataFrame([mk(1, base_text), mk(2, "totally different words here " * 9)]).to_parquet(
        src / "c0.parquet", index=False
    )
    pd.DataFrame([mk(3, base_text + "tail"), mk(4, "another unrelated corpus entry " * 8)]).to_parquet(
        src / "c1.parquet", index=False
    )
    stream = sc.read_document_stream(spark, str(src), max_files_per_trigger=1)
    se.run_to_memory(
        sc.neardup_stream(stream, n_hashes=16, bands=4),
        "t_neardup_cross",
        output_mode="append",
    )
    rows = spark.table("t_neardup_cross").collect()
    assert {(r.doc_id, r.owner_id) for r in rows} == {(3, 1)}


def test_curate_to_lake_checkpointed_restart(spark, tmp_path):
    """Restart semantics of the checkpointed lake writer: a re-run with
    no new data is a NO-OP (no lake file changes), and after a new
    chunk lands only the delta is ingested — incremental ingestion
    stays incremental across restarts."""
    import glob

    import pandas as pd

    import pyspec_spark.streaming.corpus as sc

    src = tmp_path / "ckpt_src"
    src.mkdir()
    lake = str(tmp_path / "ckpt_lake")
    ckpt = str(tmp_path / "ckpt_state")
    text = "zeta eta theta iota kappa lambda mu nu xi omicron " * 6

    def mk(i, lang):
        return {
            "doc_id": i, "text": text + f"doc{i}", "lang": lang,
            "source": "s", "n_chars": len(text) + 4,
        }

    pd.DataFrame([mk(1, "en"), mk(2, "fr")]).to_parquet(
        src / "c0.parquet", index=False
    )

    def run():
        stream = sc.read_document_stream(spark, str(src), max_files_per_trigger=1)
        sc.curate_to_lake(
            stream, spark, lake, min_quality=0.0, compact_every=0,
            checkpoint=ckpt,
        )

    def census():
        return {
            f: (os.stat(f).st_mtime_ns, os.stat(f).st_size)
            for f in glob.glob(os.path.join(lake, "**", "*.parquet"), recursive=True)
        }

    run()
    assert {r.doc_id for r in spark.read.parquet(lake).collect()} == {1, 2}
    before = census()

    run()  # restart, no new data -> lake must be byte-identical
    assert census() == before

    pd.DataFrame([mk(3, "en")]).to_parquet(src / "c1.parquet", index=False)
    run()  # restart with one new chunk -> only the delta ingested
    after = census()
    assert {r.doc_id for r in spark.read.parquet(lake).collect()} == {1, 2, 3}
    # the fr partition held no updated keys -> its files are untouched
    fr_before = {f: v for f, v in before.items() if "lang=fr" in f}
    fr_after = {f: v for f, v in after.items() if "lang=fr" in f}
    assert fr_before == fr_after


def test_neardup_stream_out_of_order_ownership_transfer(spark, tmp_path):
    """A SMALLER doc_id arriving after the bucket was claimed must take
    ownership, with the DISPLACED former owner emitted as the dup —
    not the inverted pair (the r6 code-review finding)."""
    import pandas as pd

    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se

    src = tmp_path / "ooo_src"
    src.mkdir()
    text = "one two three four five six seven eight nine ten " * 6
    mk = lambda i, t: {
        "doc_id": i, "text": t, "lang": "en", "source": "s",
        "n_chars": len(t),
    }
    # batch 1 delivers doc 5; batch 2 delivers the near-identical doc 3
    pd.DataFrame([mk(5, text)]).to_parquet(src / "c0.parquet", index=False)
    pd.DataFrame([mk(3, text + "tail")]).to_parquet(src / "c1.parquet", index=False)
    stream = sc.read_document_stream(spark, str(src), max_files_per_trigger=1)
    se.run_to_memory(
        sc.neardup_stream(stream, n_hashes=16, bands=4),
        "t_neardup_ooo",
        output_mode="append",
    )
    rows = spark.table("t_neardup_ooo").collect()
    assert {(r.doc_id, r.owner_id) for r in rows} == {(5, 3)}


def test_streaming_lake_soak_restart_and_midstream_compaction(spark, tmp_path):
    """Kill-and-restart soak for the snapshot-lake streaming sink (the
    production pairing of a curation stream + concurrent maintenance):

    - pass 1 crashes AFTER the lake committed batch 2 but BEFORE the
      Spark checkpoint advanced — the worst redelivery window;
    - a maintenance lake_compact commits between the passes (it must
      carry the stream watermark forward);
    - pass 2 resumes from the checkpoint, REDELIVERS batch 2 (skipped by
      the batch-id watermark, not duplicated) and drains the rest.

    End state: every source row exactly once, watermark at the final
    batch, history shows the compaction interleaved with stream commits."""
    import pandas as pd

    from pyspec_spark.lake import (
        lake_append_stream,
        lake_compact,
        lake_history,
        lake_last_batch,
        lake_read,
    )

    src = tmp_path / "soak_src"
    src.mkdir()
    n_chunks, rows_per = 6, 5
    for i in range(n_chunks):
        pd.DataFrame(
            {
                "doc_id": range(i * rows_per, (i + 1) * rows_per),
                "text": [f"t{j}" for j in range(i * rows_per, (i + 1) * rows_per)],
                "part": [j % 2 for j in range(i * rows_per, (i + 1) * rows_per)],
            }
        ).to_parquet(src / f"chunk{i}.parquet")
    root = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id BIGINT, text STRING, part BIGINT"

    def run_pass(crash_at: int | None):
        def sink(batch_df, batch_id):
            lake_append_stream(
                spark, root, batch_df, "part", "soak", int(batch_id)
            )
            if crash_at is not None and batch_id == crash_at:
                raise RuntimeError("injected crash after lake commit")

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination(120)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="injected crash"):
        run_pass(crash_at=2)
    # lake has batches 0..2; checkpoint has only 0..1 acknowledged
    assert lake_last_batch(root, "soak") == 2
    n_after_crash = lake_read(spark, root).count()
    assert n_after_crash == 3 * rows_per

    # concurrent maintenance between the passes
    lake_compact(spark, root, "part")
    assert lake_last_batch(root, "soak") == 2  # watermark carried

    run_pass(crash_at=None)  # restart: batch 2 redelivered, then 3..5
    got = sorted(r["doc_id"] for r in lake_read(spark, root).collect())
    assert got == list(range(n_chunks * rows_per))  # exactly once
    assert lake_last_batch(root, "soak") == n_chunks - 1
    ops = [h["op"] for h in lake_history(root)]
    assert "compact" in ops
    assert ops.index("compact") > 0 and "stream_append" in ops[ops.index("compact"):]


def test_neardup_stream_ttl_evicts_idle_buckets(spark, tmp_path):
    """With a TTL, a bucket idle past the horizon is evicted: a
    near-duplicate of a FORGOTTEN document is no longer flagged (the
    sliding-horizon dedup trade that bounds state on infinite streams),
    while the same three-pass drive without a TTL still flags it."""
    import time

    import pandas as pd

    import pyspec_spark.streaming.corpus as sc
    import pyspec_spark.streaming.events as se

    base_text = "the quick brown fox jumps over the lazy dog " * 6
    mk = lambda i, t: {
        "doc_id": i, "text": t, "lang": "en", "source": "s",
        "n_chars": len(t),
    }

    def drive(ttl, tag, sleep_s):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        out = str(tmp_path / f"out_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")

        def one_pass(rows_expected):
            # With ProcessingTimeTimeout the engine runs a batch every
            # tick to fire clocks, so neither availableNow nor
            # processAllAvailable ever observes "done" (documented in
            # neardup_stream) — poll progress until this pass's rows
            # are consumed, then stop explicitly.
            stream = sc.read_document_stream(
                spark, str(src), max_files_per_trigger=1
            )
            q = (
                sc.neardup_stream(stream, n_hashes=16, bands=4, ttl_minutes=ttl)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )
            deadline = time.time() + 90
            while time.time() < deadline:
                n = sum(p["numInputRows"] for p in q.recentProgress)
                if n >= rows_expected:
                    break
                time.sleep(0.3)
            else:
                q.stop()
                raise AssertionError("pass did not consume its rows in time")
            time.sleep(1.5)  # let the sink batch commit
            q.stop()
            q.awaitTermination(60)

        pd.DataFrame(
            [mk(1, base_text), mk(2, "totally different words here " * 9)]
        ).to_parquet(src / "c0.parquet", index=False)
        one_pass(rows_expected=2)
        time.sleep(sleep_s)
        # unrelated traffic: runs a batch, which fires expired timeouts
        pd.DataFrame([mk(4, "another unrelated corpus entry " * 8)]).to_parquet(
            src / "c1.parquet", index=False
        )
        one_pass(rows_expected=1)
        # near-dup of doc 1 arrives after the horizon
        pd.DataFrame([mk(3, base_text + "tail")]).to_parquet(
            src / "c2.parquet", index=False
        )
        one_pass(rows_expected=1)
        return {(r.doc_id, r.owner_id) for r in spark.read.parquet(out).collect()}

    # 1.2 s TTL, 2.5 s idle -> doc 1's buckets evicted before doc 3
    assert drive(ttl=0.02, tag="ttl", sleep_s=2.5) == set()
    # no TTL, same drive -> state survives, doc 3 flagged with owner 1
    assert drive(ttl=None, tag="nottl", sleep_s=0) == {(3, 1)}


def test_streaming_vector_index_exactly_once_and_pruned_lookup(
    spark, tmp_path_factory
):
    """ST11 streaming vector-index ingestion: embedding micro-batches
    are assigned to frozen IVF centroids and appended exactly-once to a
    cid-partitioned lake; a checkpointed restart with no new data
    commits nothing, a new chunk appends only the delta; full-probe
    lookup equals a brute-force recompute and a 1-cell probe opens only
    that cell's files."""
    import numpy as np

    from pyspec_spark.lake import (
        lake_read,
        lake_scan_file_counts,
        latest_version,
    )
    from pyspec_spark.streaming.vectors import index_to_lake, ivf_lookup
    from pyspec_spark.tables import table

    base = str(tmp_path_factory.mktemp("vec_stream_src"))
    root = str(tmp_path_factory.mktemp("vec_index_lake"))
    ckpt = str(tmp_path_factory.mktemp("vec_index_ckpt"))

    emb = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    schema = emb.schema
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    pdf["embedding"] = pdf["embedding"].map(
        lambda v: [float(x) for x in v]
    )
    for i, lo in enumerate(range(0, 500, 200)):
        chunk = spark.createDataFrame(pdf.iloc[lo : lo + 200], schema=schema)
        chunk.coalesce(1).write.parquet(f"{base}/chunk={i}")
    import glob as _glob
    import shutil as _shutil

    files = sorted(_glob.glob(f"{base}/chunk=*/*.parquet"))
    src = str(tmp_path_factory.mktemp("vec_stream_in"))
    for i, f in enumerate(files):
        _shutil.copy(f, f"{src}/c{i}.parquet")

    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    index_to_lake(stream(), spark, root, cents, checkpoint=ckpt)
    v1 = latest_version(root)
    got = {r["vec_id"]: r["cid"] for r in lake_read(spark, root).collect()}
    assert len(got) == 500

    # assignment equals a sequential-order numpy recompute (same fold
    # order as the zip_with aggregate, same (dist, cid) tiebreak)
    C = {
        r["cid"]: [float(x) for x in r["c"]] for r in cents.collect()
    }
    for _, row in pdf.iloc[::37].iterrows():
        e = [float(x) for x in row["embedding"]]
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(e, c)), cid)
            for cid, c in C.items()
        )
        assert got[row["vec_id"]] == best[1]

    # restart, no new data: nothing recommitted (manifest watermark)
    index_to_lake(stream(), spark, root, cents, checkpoint=ckpt)
    assert latest_version(root) == v1

    # new chunk: only the delta lands
    delta = spark.createDataFrame(
        [(10_000 + i, pdf.iloc[i]["embedding"]) for i in range(20)],
        schema=schema,
    )
    delta.coalesce(1).write.parquet(f"{src}/late")
    _shutil.move(
        _glob.glob(f"{src}/late/*.parquet")[0], f"{src}/c_late.parquet"
    )
    _shutil.rmtree(f"{src}/late")
    index_to_lake(stream(), spark, root, cents, checkpoint=ckpt)
    assert lake_read(spark, root).count() == 520
    assert latest_version(root) > v1

    # lookup: probing every cell == brute force; 1 cell probe prunes
    qv = [float(x) for x in pdf.iloc[7]["embedding"]]
    topk = ivf_lookup(spark, root, qv, k=5, nprobe=4).collect()
    qa = np.asarray(qv)
    all_rows = lake_read(spark, root).collect()
    brute = sorted(
        (
            -float(
                np.asarray([float(x) for x in r["embedding"]]) @ qa
                / (
                    np.linalg.norm([float(x) for x in r["embedding"]])
                    * np.linalg.norm(qa)
                )
            ),
            r["vec_id"],
        )
        for r in all_rows
    )[:5]
    assert [r["vec_id"] for r in topk] == [v for _, v in brute]

    probe_cid = topk[0]["cid"]
    kept, total = lake_scan_file_counts(root, [("cid", "=", int(probe_cid))])
    assert kept < total


def test_stream_stream_interval_join_equals_batch_twin(spark, event_chunks):
    """ST12: the watermarked stream-stream self-join (views x purchases
    within 1 h per user) replayed over chunked micro-batches produces
    exactly the batch q_view_purchase_join rows."""
    from pyspec_spark.queries.events import q_view_purchase_join
    from pyspec_spark.streaming.events import (
        interval_join,
        read_event_stream,
        run_to_memory,
    )

    base, _ = event_chunks
    stream = read_event_stream(spark, base)
    run_to_memory(interval_join(stream), "st12_pairs")
    got = _collect_sorted(
        spark.table("st12_pairs"),
        ["view_id", "purchase_id", "user_id", "gap_s"],
    )
    want = _collect_sorted(
        q_view_purchase_join.__wrapped__(spark, SF),
        ["view_id", "purchase_id", "user_id", "gap_s"],
    )
    assert got == want
    assert len(got) >= 1


def test_stream_stream_left_outer_emits_nulls_after_watermark(
    spark, event_chunks
):
    """ST12 leftOuter: unmatched views emit exactly once with NULL
    purchase columns once the watermark passes v_ts + window; unmatched
    views inside the final watermark horizon are withheld (the
    documented finite-stream semantics); matched rows equal the inner
    join."""
    import datetime

    from pyspec_spark.queries.events import q_view_purchase_join
    from pyspec_spark.streaming.events import (
        interval_join,
        read_event_stream,
        run_to_memory,
    )
    from pyspec_spark.tables import table

    base, _ = event_chunks
    stream = read_event_stream(spark, base)
    run_to_memory(
        interval_join(stream, how="leftOuter"), "st12_outer"
    )
    got = spark.table("st12_outer").collect()
    inner = {
        (r["view_id"], r["purchase_id"])
        for r in q_view_purchase_join.__wrapped__(spark, SF).collect()
    }
    got_matched = {
        (r["view_id"], r["purchase_id"])
        for r in got
        if r["purchase_id"] is not None
    }
    assert got_matched == inner

    ev = table(spark, SF, "events")
    views = {
        r["event_id"]: r["ts"]
        for r in ev.where("event_type = 'view'").collect()
    }
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    matched_views = {v for v, _ in inner}
    horizon = max_ts - datetime.timedelta(hours=3)  # window 1h + wm 2h
    want_nulls = {
        vid
        for vid, ts in views.items()
        if vid not in matched_views and ts < horizon
    }
    got_nulls = {r["view_id"] for r in got if r["purchase_id"] is None}
    assert got_nulls == want_nulls
    assert len(got_nulls) >= 1


def test_stream_stream_join_state_survives_restart(spark, tmp_path_factory):
    """A view buffered in join state before a restart must still pair
    with a purchase arriving AFTER the restart: drain the first half of
    the chunks with availableNow, stop, add the rest, resume on the same
    checkpoint — the union of both runs' outputs equals the batch
    twin."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from pyspec_spark.queries.events import q_view_purchase_join
    from pyspec_spark.streaming.events import interval_join, read_event_stream
    from pyspec_spark.tables import table

    # chunked source (reuse the module fixture's layout, fresh dirs so we
    # control arrival order)
    base_all = str(tmp_path_factory.mktemp("st12_restart_all"))
    src = str(tmp_path_factory.mktemp("st12_restart_src"))
    ckpt = str(tmp_path_factory.mktemp("st12_restart_ckpt"))
    out = str(tmp_path_factory.mktemp("st12_restart_out"))
    ev = table(spark, SF, "events").orderBy("ts")
    pdf = ev.toPandas()
    n = len(pdf)
    chunk = (n + 9) // 10
    for i in range(10):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(
                _os.path.join(base_all, f"chunk_{i:02d}.parquet"),
                index=False,
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
    files = sorted(_glob.glob(f"{base_all}/chunk_*.parquet"))

    def drain():
        q = (
            interval_join(read_event_stream(spark, src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:5]:
        _shutil.copy(f, src)
    drain()  # first run buffers trailing unmatched views in state
    for f in files[5:]:
        _shutil.copy(f, src)
    drain()  # restart: state recovery must pair them with late purchases

    got = sorted(
        (r["view_id"], r["purchase_id"], r["user_id"], r["gap_s"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["view_id"], r["purchase_id"], r["user_id"], r["gap_s"])
        for r in q_view_purchase_join.__wrapped__(spark, SF).collect()
    )
    assert got == want


def test_assign_cells_broadcast_form_matches_inline(spark):
    """The r8 large-k assignment path (1-row broadcast array of structs)
    must assign every vector to the SAME cell as the literal-inlined
    plan, including lexicographic lowest-cid tiebreaks, and must not
    shuffle the batch."""
    import numpy as np

    from pyspec_spark.plans import physical_plan
    from pyspec_spark.streaming.vectors import assign_cells

    rng = np.random.default_rng(17)
    cents = [
        (cid, [float(x) for x in rng.normal(0, 1, 8)]) for cid in range(20)
    ]
    # duplicate centroid: ties must break to the LOWER cid in both forms
    cents.append((20, list(cents[3][1])))
    batch = spark.createDataFrame(
        [
            (i, [float(x) for x in rng.normal(0, 1, 8)])
            for i in range(200)
        ]
        + [(1000 + cid, list(c)) for cid, c in cents],  # exact hits
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    inline = {
        r["vec_id"]: r["cid"]
        for r in assign_cells(batch, cents, inline_max_k=64).collect()
    }
    bcast = {
        r["vec_id"]: r["cid"]
        for r in assign_cells(batch, cents, inline_max_k=4).collect()
    }
    assert inline == bcast
    assert inline[1003] == 3 and inline[1020] == 3  # duplicate -> lower cid
    p = physical_plan(assign_cells(batch, cents, inline_max_k=4))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    # the BATCH side must not shuffle: no hash/range exchange anywhere
    import re

    assert not re.search(r"Exchange (hash|range)partitioning", p)


def test_reindex_and_atomic_publish(spark, tmp_path):
    """The frozen-codebook retrain contract end-to-end: stream-ingest
    under codebook A, reindex into a NEW root under codebook B (one
    batch pass), publish atomically, and lookups through the pointer
    match numpy brute force over B's cells — while the old root stays
    fully readable (separate manifests; nothing mutated)."""
    import numpy as np

    from pyspec_spark.lake import lake_read
    from pyspec_spark.streaming.vectors import (
        current_index,
        index_to_lake,
        ivf_lookup,
        load_centroids,
        publish_index,
        reindex,
    )
    from pyspec_spark.tables import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    cents_a = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where("vec_id < 4").collect()
    ]
    cents_b = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where("vec_id >= 4 AND vec_id < 12").collect()
    ]
    src = str(tmp_path / "src")
    emb.select("vec_id", "embedding").repartition(2).write.parquet(src)
    base = str(tmp_path / "index")
    root_a = str(tmp_path / "index_a")
    root_b = str(tmp_path / "index_b")
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    index_to_lake(stream, spark, root_a, cents_a,
                  checkpoint=str(tmp_path / "ck"))
    publish_index(base, root_a)
    assert current_index(base) == os.path.abspath(root_a)

    n_before = lake_read(spark, root_a).count()
    reindex(spark, root_a, root_b, cents_b)
    publish_index(base, root_b)
    assert current_index(base) == os.path.abspath(root_b)
    # the old root is untouched and fully readable
    assert lake_read(spark, root_a).count() == n_before
    # every vector survived the rebuild, under the NEW codebook's cells
    assert lake_read(spark, root_b).count() == n_before
    cids_b, _ = load_centroids(root_b)
    got_cells = {
        r["cid"] for r in lake_read(spark, root_b).select("cid").distinct().collect()
    }
    assert got_cells <= set(cids_b)

    # lookup through the pointer == numpy brute force over probed cells
    q = [float(x) for x in emb.where("vec_id = 20").first()["embedding"]]
    top = ivf_lookup(spark, current_index(base), q, k=5, nprobe=8).collect()
    X = np.array(
        [r["embedding"] for r in
         lake_read(spark, root_b).orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    ids = [r["vec_id"] for r in
           lake_read(spark, root_b).orderBy("vec_id").collect()]
    qv = np.asarray(q)
    cos = (X @ qv) / (np.linalg.norm(X, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((ids, -cos))[:5]
    want = [ids[i] for i in order]
    assert [r["vec_id"] for r in top] == want

    # write-once contract still enforced on the new root
    with pytest.raises(ValueError, match="different codebook"):
        from pyspec_spark.streaming.vectors import save_centroids

        save_centroids(root_b, cents_a)


def test_delete_vectors_touched_cells_only_and_audit_trail(spark, tmp_path):
    """ST11c delete_vectors (r10): right-to-be-forgotten on the IVF
    index without a retrain.  Pins the three contracts the docstring
    makes: (1) the post-delete snapshot excludes exactly the deleted
    ids and ivf_lookup can never return them; (2) copy-on-write cost
    is TOUCHED CELLS ONLY — every unaffected cell's manifest entries
    carry over by reference (identical file paths across versions);
    (3) the pre-delete version stays readable until vacuum (the audit
    window), then vacuum actually forgets."""
    from pyspec_spark.lake import _load_manifest, lake_read, lake_vacuum
    from pyspec_spark.streaming.vectors import (
        assign_cells,
        delete_vectors,
        ivf_lookup,
        save_centroids,
    )
    from pyspec_spark.lake import lake_append

    root = str(tmp_path / "vdel_idx")
    # 2-D codebook with 4 well-separated cells; 40 vectors clustered
    # tightly around each centroid so assignment is unambiguous
    cents = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0]), (3, [10.0, 10.0])]
    rows = []
    for i in range(40):
        cx, cy = cents[i % 4][1]
        rows.append((i, [cx + 0.01 * (i // 4), cy + 0.02]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    save_centroids(root, cents)
    v1 = lake_append(
        spark, root, assign_cells(df, cents),
        partition_col="cid", bloom_cols=["vec_id"],
    )

    # delete ids that all live in cell 1 (vec_id % 4 == 1)
    doomed = [1, 5, 9, 13]
    v2 = delete_vectors(
        spark, root,
        spark.createDataFrame([(i,) for i in doomed], "vec_id BIGINT"),
    )
    assert v2 == v1 + 1

    # (1) exclusion is exact
    left = {r["vec_id"] for r in lake_read(spark, root).collect()}
    assert left == set(range(40)) - set(doomed)
    top = ivf_lookup(spark, root, [10.0, 0.0], k=40, nprobe=1).collect()
    assert top, "cell 1 still has survivors"
    assert not set(doomed) & {r["vec_id"] for r in top}

    # (2) only cell 1 was rewritten: every other cell's entries are
    # the SAME file paths as v1 (carried by reference, not copied)
    f1 = {e["path"]: e["partition"] for e in _load_manifest(root, v1)["files"]}
    f2 = {e["path"]: e["partition"] for e in _load_manifest(root, v2)["files"]}
    for path, part in f1.items():
        if part != "1":
            assert path in f2, f"untouched cell {part} file was rewritten"
    for path, part in f2.items():
        if part == "1":
            assert path not in f1, "touched cell must get NEW files"

    # (3) the audit window: pre-delete version readable with the
    # doomed ids...
    v1_ids = {r["vec_id"] for r in lake_read(spark, root, version=v1).collect()}
    assert set(doomed) <= v1_ids
    # ...until vacuum forgets it
    lake_vacuum(root, keep_versions=1, retention_seconds=0.0)
    import pytest as _pytest

    with _pytest.raises(Exception):
        lake_read(spark, root, version=v1).collect()


def test_vacuum_indexes_retention_and_reader_race(spark, tmp_path):
    """Index-lifecycle GC (r9): superseded roots beyond keep are
    reclaimed, the CURRENT root never is, unpublished in-flight roots
    survive the retention window, and both reader arms of the race are
    deterministic — a re-resolving reader keeps working, a reader
    pinned to the vacuumed root fails LOUDLY (missing files), never
    silently."""
    import threading
    import time

    from pyspec_spark.lake import lake_append, lake_read
    from pyspec_spark.streaming.vectors import (
        current_index,
        index_history,
        publish_index,
        save_centroids,
        vacuum_indexes,
    )

    def build_root(path, tag):
        save_centroids(path, [(0, [0.0, 0.0]), (1, [1.0, 1.0])])
        df = spark.createDataFrame(
            [(tag * 10 + i, [float(i), 0.0], i % 2) for i in range(4)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>, cid INT",
        )
        lake_append(spark, path, df, partition_col="cid")
        return path

    base = str(tmp_path / "idx")
    roots = [
        build_root(str(tmp_path / f"root_{i}"), i) for i in range(3)
    ]
    for r in roots:
        publish_index(base, r)
    assert [os.path.basename(p) for p in index_history(base)] == [
        "root_0", "root_1", "root_2",
    ]
    # an in-flight rebuild: codebook written, publish not yet done —
    # lives UNDER base (the orphan-scan scope), younger than retention
    inflight = str(tmp_path / "idx" / "building")
    build_root(inflight, 9)
    # an old abandoned orphan under base (mtime pushed past retention)
    stale = str(tmp_path / "idx" / "abandoned")
    build_root(stale, 8)
    os.utime(stale, (time.time() - 7200, time.time() - 7200))

    # reader pins the SOON-TO-BE-VACUUMED root_0 before the vacuum,
    # while the vacuum runs concurrently (the lake-race pattern)
    pinned = lake_read(spark, roots[0])  # plan built against root_0
    barrier = threading.Barrier(2)
    removed: list = [None]

    def vac():
        barrier.wait()
        removed[0] = vacuum_indexes(base, keep=2, retention_seconds=3600)

    t = threading.Thread(target=vac)
    t.start()
    barrier.wait()
    t.join()

    got = {os.path.basename(p) for p in removed[0]}
    assert got == {"root_0", "abandoned"}
    # current + keep window + in-flight rebuild survive
    assert os.path.isdir(roots[1]) and os.path.isdir(roots[2])
    assert os.path.isdir(inflight)
    assert current_index(base) == os.path.abspath(roots[2])
    assert [os.path.basename(p) for p in index_history(base)] == [
        "root_1", "root_2",
    ]
    # arm 1: re-resolving reader is never affected
    assert lake_read(spark, current_index(base)).count() == 4
    # arm 2: the pinned reader fails loudly, not silently
    with pytest.raises(Exception):
        pinned.count()
    assert not os.path.isdir(roots[0])

    # keep=1 can never delete CURRENT even if history says otherwise
    vacuum_indexes(base, keep=1)
    assert os.path.isdir(roots[2])
    assert lake_read(spark, current_index(base)).count() == 4


def test_stream_index_to_buckets_equals_batch_and_restart(spark, tmp_path):
    """Streaming face of incremental indexing (r10): a checkpointed
    document stream drained through index_stream_to_buckets must (a)
    decode to exactly the one-shot batch build over the same docs —
    base + streamed increments, boundary shards and all; (b) be a
    NO-OP on a restart with no new data; (c) ingest only the delta
    when a new chunk lands; (d) converge to the same decoded index
    under a FULL REPLAY (fresh checkpoint, every batch redelivered
    onto the existing batch roots) — the batch-scoped overwrite is
    what makes redelivery idempotent, i.e. exactly-once end state
    across any kill-and-restart window."""
    import glob

    import pandas as pd

    import pyspec_spark.streaming.corpus as sc
    from pyspec_spark.operators.text import (
        compact_streamed_index,
        decode_postings,
        read_streamed_index,
        sharded_postings,
        write_term_index,
    )

    src = tmp_path / "idx_src"
    src.mkdir()
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows_per = 7

    def mk_chunk(ci):
        return pd.DataFrame(
            [
                {
                    "doc_id": i,
                    "text": " ".join(
                        words[(i + j) % len(words)] for j in range(1 + i % 4)
                    ),
                    "lang": "en",
                    "source": "s",
                    "n_chars": 10,
                }
                for i in range(100 + ci * rows_per, 100 + (ci + 1) * rows_per)
            ]
        )

    for ci in range(3):
        mk_chunk(ci).to_parquet(src / f"c{ci}.parquet", index=False)

    # a batch-built base over an earlier doc range (shard 10 does not
    # divide the 100 boundary evenly with the chunk ranges -> split
    # shards between base/increments are in play)
    shard = 10
    base = str(tmp_path / "idx_base")
    base_docs = spark.createDataFrame(
        [(i, words[i % len(words)] + " " + words[(i + 2) % len(words)])
         for i in range(95)],
        "doc_id BIGINT, text STRING",
    )
    base_tf = (
        base_docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    write_term_index(sharded_postings(base_tf, shard), base)

    inc = str(tmp_path / "idx_inc")
    ckpt = str(tmp_path / "idx_ckpt")

    def run(ck=ckpt):
        stream = sc.read_document_stream(spark, str(src), max_files_per_trigger=1)
        sc.index_stream_to_buckets(stream, spark, inc, shard, checkpoint=ck)

    def decoded():
        return {
            (r["term"], r["doc_id"], r["tf"])
            for r in decode_postings(
                read_streamed_index(spark, inc, base).select(
                    "term", "shard", "postings"
                ),
                shard_size=shard,
            ).collect()
        }

    def truth(n_chunks):
        all_docs = base_docs.unionByName(
            spark.createDataFrame(
                pd.concat([mk_chunk(c) for c in range(n_chunks)]),
            ).select("doc_id", "text")
        )
        tf = (
            all_docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("term")
            )
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        return {(r["term"], r["doc_id"], r["tf"]) for r in tf.collect()}

    run()
    assert decoded() == truth(3)  # (a) stream end == one-shot build

    def census():
        return {
            f: (os.stat(f).st_mtime_ns, os.stat(f).st_size)
            for f in glob.glob(os.path.join(inc, "**", "*.parquet"), recursive=True)
        }

    before = census()
    run()  # (b) restart, no new data -> increments byte-identical
    assert census() == before

    mk_chunk(3).to_parquet(src / "c3.parquet", index=False)
    run()  # (c) only the delta batch lands
    after = census()
    assert set(before) <= set(after)
    assert all(after[f] == before[f] for f in before)  # old batches untouched
    assert decoded() == truth(4)

    # (d) FULL replay: fresh checkpoint redelivers every batch onto the
    # existing batch roots; the overwrite converges, decode unchanged
    run(ck=str(tmp_path / "idx_ckpt2"))
    assert decoded() == truth(4)

    # compaction folds base + increments into one fresh root
    dest = str(tmp_path / "idx_compact")
    compact_streamed_index(spark, inc, dest, base_path=base)
    got_c = {
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_postings(
            spark.read.parquet(dest).select("term", "shard", "postings"),
            shard_size=shard,
        ).collect()
    }
    assert got_c == truth(4)


def test_stream_rollup_maintenance_exactly_once_and_equals_batch(
    spark, event_chunks, tmp_path
):
    """ST8b streaming face (rollup_sink): driving the maintained rollup
    from a micro-batch stream must equal the one-shot batch rollup at
    stream end, and a REDELIVERED batch (the kill-and-restart case)
    must be skipped, not double-merged — unlike an append sink, a
    re-merged SUM is not idempotent, so the watermark-in-the-same-
    commit property is load-bearing."""
    from pyspec_spark.lake import lake_last_batch, latest_version
    from pyspec_spark.operators.rollup import (
        _rollup_partial,
        finalize,
        read_rollup,
        rollup_sink,
    )
    from pyspec_spark.tables import table

    base, _ = event_chunks
    root = str(tmp_path / "roll_stream")
    ev_schema = spark.read.parquet(base).schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(base)
    )
    sink = rollup_sink(root, "ts", ["event_type"], "value", level="day")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["bucket", "event_type", "n", "sum_v", "mean_v", "min_v", "max_v"]
    got = read_rollup(spark, root, ["event_type"])
    want = finalize(
        _rollup_partial(
            table(spark, SF, "events"), "ts", ["event_type"], "value", "day"
        ).drop("rk", "pb"),
        ["event_type"],
    )
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)

    # redelivery: re-invoke the sink with an already-committed batch id
    # and arbitrary rows — the watermark must make it a no-op
    last = lake_last_batch(root, "rollup_maintenance")
    assert last is not None and last >= 0
    v_before = latest_version(root)
    sink(table(spark, SF, "events").limit(50), last)
    assert latest_version(root) == v_before
    assert _collect_sorted(
        read_rollup(spark, root, ["event_type"]), cols
    ) == _collect_sorted(want, cols)


def test_stream_contract_enforcement_routes_and_redelivery_safe(
    spark, event_chunks, tmp_path
):
    """V1b streaming face (contract_sink): validate-on-ingest over a
    micro-batch stream must partition the corpus exactly (pass lake +
    quarantine lake == batch enforce_contract on the full table, row
    for row), and a redelivered batch is skipped on BOTH lakes (each
    carries its own watermark; a crash between the two commits heals
    on redelivery because appends are per-lake idempotent)."""
    from pyspec_spark.lake import lake_last_batch, lake_read, latest_version
    from pyspec_spark.operators.expectations import (
        contract_sink,
        enforce_contract,
    )
    from pyspec_spark.tables import table

    base, n = event_chunks
    proot = str(tmp_path / "pass_lake")
    qroot = str(tmp_path / "quar_lake")
    # both checks genuinely bite on the fixture (389 rows over the
    # value bound, 400 rows of 'error'/'signup' types; overlaps exist,
    # so multi-violation rows exercise the array routing too)
    checks = [
        ("value_le_50", F.col("value") <= 50),
        ("type_known", F.col("event_type").isin("view", "click", "purchase")),
    ]
    ev_schema = spark.read.parquet(base).schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(base)
    )
    sink = contract_sink(proot, qroot, checks)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got_pass = lake_read(spark, proot)
    got_quar = lake_read(spark, qroot)
    ev = table(spark, SF, "events")
    want_pass, want_quar = enforce_contract(ev, checks)
    assert got_pass.count() + got_quar.count() == n
    assert _collect_sorted(got_pass, ["event_id"]) == _collect_sorted(
        want_pass, ["event_id"]
    )
    wq = {
        r["event_id"]: list(r["violations"]) for r in want_quar.collect()
    }
    gq = {r["event_id"]: list(r["violations"]) for r in got_quar.collect()}
    assert gq == wq

    # redelivery is a no-op on both lakes
    last = lake_last_batch(proot, "contract_enforce")
    vp, vq = latest_version(proot), latest_version(qroot)
    sink(ev.limit(25), last)
    assert latest_version(proot) == vp and latest_version(qroot) == vq


def test_rollup_sink_retries_lost_commit_race(spark, tmp_path, monkeypatch):
    """rollup_sink's LakeConflict contract: a lost commit race (a
    maintenance commit or racing replica landing between the base read
    and the merge commit) retries the WHOLE merge against the fresh
    base — a read-modify-write cannot re-link like an append — and the
    batch still lands exactly once.  Simulated by failing the first
    upsert attempt with LakeConflict."""
    import pyspec_spark.operators.rollup as ro
    from pyspec_spark.lake import LakeConflict, lake_last_batch
    from pyspec_spark.operators.rollup import read_rollup, rollup_sink
    from pyspec_spark.tables import table as t

    e = t(spark, SF, "events")
    root = str(tmp_path / "race")
    calls = {"n": 0}
    real = ro.upsert_rollup

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise LakeConflict("simulated lost race")
        return real(*a, **kw)

    monkeypatch.setattr(ro, "upsert_rollup", flaky)
    sink = rollup_sink(root, "ts", ["event_type"], "value", level="day")
    sink(e, 0)
    assert calls["n"] == 2  # one loss, one successful retry
    assert lake_last_batch(root, "rollup_maintenance") == 0
    got = read_rollup(spark, root, ["event_type"])
    assert got.count() > 0
    # and the landed totals are the single-merge totals (no double
    # commit from the retry)
    assert got.agg({"n": "sum"}).collect()[0][0] == e.count()


def test_upsert_rollup_detects_real_lost_update_window(
    spark, tmp_path, monkeypatch
):
    """The REAL lost-update window (not a simulated conflict): a racing
    replica commits between upsert_rollup's base-version capture and
    its replace commit.  Because upsert_rollup pins base_version through
    to the commit parent, the interleaved commit must trip the lake's
    os.link optimistic check with a genuine LakeConflict — and
    rollup_sink's retry must then recompute against the fresh base, so
    the final table equals a from-scratch rollup of ALL three chunks
    (base + racer + batch), never a double-merge."""
    import pyspec_spark.lake as lk
    import pyspec_spark.operators.rollup as ro
    from pyspec_spark.operators.rollup import (
        read_rollup,
        rollup_cascade,
        rollup_sink,
        upsert_rollup,
    )
    from pyspec_spark.tables import table as t

    e = t(spark, SF, "events")
    is_c = F.coalesce(F.col("event_id") % 3 == 0, F.lit(False))
    is_b = F.coalesce(F.col("event_id") % 3 == 1, F.lit(False))
    chunk_a = e.where(~is_c & ~is_b)
    chunk_b = e.where(is_b)
    chunk_c = e.where(is_c)

    root = str(tmp_path / "race_window")
    upsert_rollup(spark, root, chunk_a, "ts", ["event_type"], "value",
                  level="day")

    real_replace = lk.lake_replace_partitions
    state = {"racing": False, "raced": False, "conflicts": 0}

    def racing_replace(*a, **kw):
        # first entry: inject a REAL racing commit (another replica's
        # merge) inside the window, then run the original — whose
        # parent=base_version link must now genuinely conflict
        if not state["raced"] and not state["racing"]:
            state["raced"] = True
            state["racing"] = True
            try:
                upsert_rollup(spark, root, chunk_c, "ts", ["event_type"],
                              "value", level="day")
            finally:
                state["racing"] = False
        try:
            return real_replace(*a, **kw)
        except lk.LakeConflict:
            state["conflicts"] += 1
            raise

    monkeypatch.setattr(lk, "lake_replace_partitions", racing_replace)
    sink = rollup_sink(root, "ts", ["event_type"], "value", level="day")
    sink(chunk_b, 7)

    assert state["raced"]
    assert state["conflicts"] >= 1  # the window tripped a REAL conflict
    assert lk.lake_last_batch(root, "rollup_maintenance") == 7

    got = _collect_sorted(
        read_rollup(spark, root, ["event_type"]),
        ["bucket", "event_type", "n", "sum_v", "min_v", "max_v"],
    )
    scratch = rollup_cascade(e, "ts", ["event_type"], "value",
                             levels=("day",))["day"]
    want = _collect_sorted(
        ro.finalize(scratch, ["event_type"]),
        ["bucket", "event_type", "n", "sum_v", "min_v", "max_v"],
    )
    assert got == want


def test_lake_writers_pin_base_version(spark, tmp_path):
    """base_version semantics on the lake writers themselves: a commit
    computed against a stale base must raise LakeConflict at publish
    time, and an explicit base_version=None (empty-at-start) must
    conflict if any first commit landed in between."""
    import pyspec_spark.lake as lk

    root = str(tmp_path / "pin")
    df = spark.range(5).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    v1 = lk.lake_append(spark, root, df, partition_col="p")
    assert v1 == 1
    # racing append bumps to v2
    lk.lake_append(spark, root, df, partition_col="p")
    with pytest.raises(lk.LakeConflict):
        lk.lake_replace_partitions(
            spark, root, {"0"}, df.where("p = '0'"), partition_col="p",
            base_version=1,
        )
    with pytest.raises(lk.LakeConflict):
        lk.lake_upsert(
            spark, root, df, key="id", partition_col="p", base_version=1
        )
    root2 = str(tmp_path / "pin_empty")
    lk.lake_append(spark, root2, df, partition_col="p")
    with pytest.raises(lk.LakeConflict):
        lk.lake_append(spark, root2, df, partition_col="p",
                       base_version=None)


def test_maintained_index_stream_serves_equal_to_batch(
    spark, doc_chunks, tmp_path
):
    """L40j streaming face (r11): documents streamed in micro-batches
    through maintained_index_stream (postings + batch-scoped norms),
    folded by compact_streamed_maintained, must serve BM25 IDENTICALLY
    to a one-shot build_maintained_index over the same corpus — and
    the compacted root must pass the fast path's stale-norms gate."""
    import pyspec_spark.streaming.corpus as sc
    from pyspec_spark.operators.text import (
        build_maintained_index,
        compact_streamed_maintained,
        decode_postings,
        read_norm_stats,
        read_streamed_norms,
    )
    from pyspec_spark.queries.text_ranking import (
        _score_decoded,
        _topk_index_parts,
    )
    from pyspec_spark.tables import table

    base, n = doc_chunks
    inc = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ckpt")
    stream = sc.read_document_stream(spark, base, max_files_per_trigger=1)
    sc.maintained_index_stream(stream, spark, inc, 64, checkpoint=ckpt)

    # norms union covers every streamed doc exactly once
    got_n = read_streamed_norms(spark, inc).count()
    assert got_n == n

    dest = str(tmp_path / "compacted")
    compact_streamed_maintained(spark, inc, dest, 64)

    docs = table(spark, SF, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    scratch = str(tmp_path / "scratch")
    build_maintained_index(spark, tf, dl, scratch, 64)

    def serve(root):
        probed, _d, _r, idf, dlr, stats = _topk_index_parts(
            spark, root, terms=("dup", "filter")
        )
        decoded = decode_postings(
            probed.select("term", "shard", "postings"), shard_size=64
        )
        return sorted(
            tuple(r)
            for r in _score_decoded(decoded, idf, dlr, stats).collect()
        )

    got, want = serve(dest), serve(scratch)
    assert got == want and len(got) > 0
    s1 = read_norm_stats(spark, dest).collect()
    s2 = read_norm_stats(spark, scratch).collect()
    assert s1 == s2


def test_maintained_index_stream_batch_replay_is_idempotent(
    spark, doc_chunks, tmp_path
):
    """Crash-replay contract: re-running one micro-batch's sink (the
    redelivery a crash between write and checkpoint commit causes)
    overwrites its OWN batch root — postings rows, norms rows, and the
    stats row all equal the single-landing state, never doubled.
    Drives the SAME function the stream face routes through
    (maintained_index_batch), so the tested path is the served path."""
    import pyspec_spark.streaming.corpus as sc
    from pyspec_spark.operators.text import read_streamed_norms
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents").where("doc_id % 4 = 1")
    inc = str(tmp_path / "inc")

    sc.maintained_index_batch(docs, 2, inc, 64)
    once_norms = sorted(
        tuple(r) for r in read_streamed_norms(spark, inc).collect()
    )
    once_post = spark.read.parquet(inc).count()
    once_stats = spark.read.parquet(f"{inc}/batch=2/_norms_stats").collect()
    sc.maintained_index_batch(docs, 2, inc, 64)  # the replay
    again_norms = sorted(
        tuple(r) for r in read_streamed_norms(spark, inc).collect()
    )
    again_post = spark.read.parquet(inc).count()
    again_stats = spark.read.parquet(f"{inc}/batch=2/_norms_stats").collect()
    assert again_norms == once_norms
    assert again_post == once_post
    assert again_stats == once_stats


def test_filtered_lookup_opens_only_probed_cells_matching_labels(
    spark, tmp_path_factory
):
    """L5d serve-path pruning gate: a filtered lookup against a
    label-clustered IVF lake opens ONLY files under the probed cells
    AND the matching label (inputFiles ⊆ probed × label), survives a
    CoW delete (clustering preserved on rewrite), and PRE-filters:
    every returned row matches, k true matches return even when the
    unfiltered top-k would be dominated by other labels."""
    import numpy as np

    from pyspec_spark.lake import lake_append
    from pyspec_spark.streaming.vectors import (
        assign_cells,
        delete_vectors,
        ivf_lookup,
        save_centroids,
    )
    from pyspec_spark.tables import table

    root = str(tmp_path_factory.mktemp("vlf_lake"))
    emb = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )
    save_centroids(root, cents)
    labeled = assign_cells(emb, cents).withColumn(
        "label", F.pmod("vec_id", F.lit(4)).cast("int")
    )
    lake_append(spark, root, labeled, "cid", cluster_col="label")
    delete_vectors(
        spark, root,
        emb.where(F.col("vec_id") % 7 == 3).select("vec_id"),
    )

    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    got = ivf_lookup(
        spark, root, qv, k=5, nprobe=2, where=[("label", "=", 1)]
    )
    files = got.inputFiles()
    assert files, "expected a pruned file scan, not an empty plan"
    # every opened file is a probed-cell file of the matching label
    import re

    for f in files:
        assert re.search(r"_cc=1(/|$)", f), f
    probed_cids = {
        re.search(r"_pc=(\d+)", f).group(1) for f in files
    }
    assert len(probed_cids) <= 2, probed_cids

    rows = got.collect()
    assert rows and all(int(r["vec_id"]) % 4 == 1 for r in rows)
    # pre-filtering: exactly the exact filtered top-k over live rows
    qa = np.asarray(qv)
    live = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in labeled.collect()
        if int(r["vec_id"]) % 7 != 3 and int(r["vec_id"]) % 4 == 1
    }
    # restrict brute force to the SAME probed cells the serve reads
    cid_of = {
        int(r["vec_id"]): int(r["cid"]) for r in labeled.collect()
    }
    cand = {
        v: e for v, e in live.items()
        if str(cid_of[v]) in probed_cids
    }
    brute = sorted(
        (
            -float(np.asarray(e) @ qa
                   / (np.linalg.norm(e) * np.linalg.norm(qa))),
            v,
        )
        for v, e in cand.items()
    )[:5]
    assert [v for _, v in brute] == [int(r["vec_id"]) for r in rows]


def test_stream_append_across_schema_evolution_commit(spark, tmp_path):
    """r12 (VERDICT #6): a rename + widen-retype commit landing BETWEEN
    micro-batches must not fork the stream — later batches still carry
    the stale source schema, and lake_append_stream must translate them
    onto the CURRENT mapping (stale name -> renamed logical, narrow
    type -> cast into the current era), ending byte-equal to a batch
    read of all the data under the new schema.  Plus the refusals: the
    partition column cannot be renamed, and a lossy mid-stream type
    mismatch raises instead of silently casting."""
    import glob as _glob
    import shutil as _shutil

    import pytest as _pytest

    from pyspec_spark.lake import (
        lake_append_stream,
        lake_read,
        lake_rename_column,
        lake_retype_column,
        lake_scan,
    )

    # 3 single-file chunks -> 3 micro-batches
    base = str(tmp_path / "evo_src_stage")
    src = str(tmp_path / "evo_src")
    import os

    os.makedirs(src)
    rows = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("part"),
        (F.col("id") * 7 % 100).cast("int").alias("val"),
    )
    for i in range(3):
        rows.where(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            f"{base}/c{i}"
        )
        f = _glob.glob(f"{base}/c{i}/*.parquet")[0]
        _shutil.copy(f, f"{src}/c{i}.parquet")

    root = str(tmp_path / "evo_lake")
    state = {"evolved": False}

    def sink(batch_df, bid):
        lake_append_stream(
            spark, root, batch_df, "part", "evostream", int(bid)
        )
        if not state["evolved"]:
            state["evolved"] = True
            lake_rename_column(root, "val", "score")
            lake_retype_column(root, "score", "bigint")

    (
        spark.readStream.schema("doc_id BIGINT, part INT, val INT")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "evo_chk"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert state["evolved"]

    got = lake_read(spark, root)
    assert set(got.columns) == {"doc_id", "part", "score"}
    assert dict(got.dtypes)["score"] == "bigint"
    want = sorted(
        (i, i % 3, i * 7 % 100) for i in range(300)
    )
    assert sorted(
        (r["doc_id"], r["part"], r["score"]) for r in got.collect()
    ) == want
    # predicate pushdown on the renamed column still works post-stream
    hits = lake_scan(spark, root, [("score", "=", 7)]).collect()
    assert sorted(r["doc_id"] for r in hits) == sorted(
        i for i in range(300) if i * 7 % 100 == 7
    )

    # refusal 1: the partition column cannot be renamed mid-stream
    with _pytest.raises(ValueError, match="partition column"):
        lake_rename_column(root, "part", "p2")

    # refusal 2: a lossy type mismatch in a stale batch raises loudly
    lossy = spark.range(5).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("part"),
        (F.col("id") * 1.5).cast("double").alias("val"),
    )
    with _pytest.raises(ValueError, match="lossless"):
        lake_append_stream(spark, root, lossy, "part", "evostream", 99)


def test_streamed_labeled_ingest_clusters_cells_for_filtered_lookup(
    spark, tmp_path_factory
):
    """L5d streaming face (r12): a labeled embedding stream ingested
    via index_to_lake(cluster_col=...) lands one file per (cid, label)
    from the FIRST commit on (lake_append_stream sets the layout when
    there is no manifest to inherit), later batches inherit it, and a
    filtered lookup against the streamed index opens only
    matching-label files of the probed cells and equals the exact
    filtered top-k."""
    import glob as _glob
    import json as _json
    import re
    import shutil as _shutil

    import numpy as np

    from pyspec_spark.streaming.vectors import index_to_lake, ivf_lookup
    from pyspec_spark.tables import table

    src = str(tmp_path_factory.mktemp("vlfs_src"))
    root = str(tmp_path_factory.mktemp("vlfs_lake"))
    ckpt = str(tmp_path_factory.mktemp("vlfs_ckpt"))

    emb = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id",
        "embedding",
        F.pmod("vec_id", F.lit(4)).cast("int").alias("label"),
    )
    stage = str(tmp_path_factory.mktemp("vlfs_stage"))
    for i in range(3):
        emb.where(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
            f"{stage}/c{i}"
        )
        _shutil.copy(
            _glob.glob(f"{stage}/c{i}/*.parquet")[0], f"{src}/c{i}.parquet"
        )

    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )
    stream = (
        spark.readStream.schema(
            "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    index_to_lake(
        stream, spark, root, cents, checkpoint=ckpt, cluster_col="label"
    )

    # every committed file is single-label (point stats) from batch 0
    mf = sorted(_glob.glob(f"{root}/_manifests/*.json"))[-1]
    man = _json.load(open(mf))
    assert man["cluster_col"] == "label"
    assert all(
        e["stats"]["label"][0] == e["stats"]["label"][1]
        for e in man["files"]
    )

    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    got = ivf_lookup(
        spark, root, qv, k=5, nprobe=2, where=[("label", "=", 1)]
    )
    files = got.inputFiles()
    assert files and all(re.search(r"_cc=1(/|$)", f) for f in files)
    rows = got.collect()
    assert rows and all(int(r["vec_id"]) % 4 == 1 for r in rows)

    # equals the exact filtered top-k over the probed cells
    probed_cids = {
        int(re.search(r"_pc=(\d+)", f).group(1)) for f in files
    }
    qa = np.asarray(qv)
    from pyspec_spark.lake import lake_read

    cand = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in lake_read(spark, root).collect()
        if int(r["cid"]) in probed_cids and int(r["vec_id"]) % 4 == 1
    ]
    brute = sorted(
        (
            -float(np.asarray(e) @ qa
                   / (np.linalg.norm(e) * np.linalg.norm(qa))),
            v,
        )
        for v, e in cand
    )[:5]
    assert [v for _, v in brute] == [int(r["vec_id"]) for r in rows]
