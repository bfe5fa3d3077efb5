"""Text-format ingestion (sources/textlines.py, S8/S9): the
malformed-line POLICY surface and escaping round-trips the oracle
queries can't exercise (they run on the clean synthetic corpus)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspec_spark.sources.textlines import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

_SCHEMA = "doc_id BIGINT, text STRING"


def _plant(path: str, name: str, lines: list[str]) -> None:
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _mixed_jsonl(spark, tmp_path) -> str:
    root = str(tmp_path / "jl")
    write_jsonl(
        spark.createDataFrame([(1, "alpha"), (2, "beta")], _SCHEMA), root
    )
    _plant(root, "bad.jsonl", ["{nope", '{"doc_id": "x", "text": 3}'])
    return root


def test_jsonl_permissive_quarantines_raw_line(spark, tmp_path):
    root = _mixed_jsonl(spark, tmp_path)
    back = read_jsonl(spark, root, _SCHEMA, mode="PERMISSIVE")
    rows = back.collect()
    assert len(rows) == 4
    bad = sorted(r[CORRUPT_COL] for r in rows if r[CORRUPT_COL] is not None)
    # the RAW offending line is preserved for the audit trail
    assert bad == ['{"doc_id": "x", "text": 3}', "{nope"]
    good = {(r["doc_id"], r["text"]) for r in rows if r[CORRUPT_COL] is None}
    assert good == {(1, "alpha"), (2, "beta")}


def test_jsonl_dropmalformed_keeps_only_valid(spark, tmp_path):
    root = _mixed_jsonl(spark, tmp_path)
    back = read_jsonl(spark, root, _SCHEMA, mode="DROPMALFORMED")
    assert CORRUPT_COL not in back.columns  # no quarantine col by policy
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]


def test_jsonl_failfast_aborts(spark, tmp_path):
    root = _mixed_jsonl(spark, tmp_path)
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, root, _SCHEMA, mode="FAILFAST").collect()


def test_jsonl_gzip_applies_and_roundtrips(spark, tmp_path):
    root = str(tmp_path / "gz")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("d"), "id").alias("text")
    )
    write_jsonl(df, root, compression="gzip")
    parts = [f for f in os.listdir(root) if f.startswith("part-")]
    assert parts and all(f.endswith(".gz") for f in parts)
    back = read_jsonl(spark, root, _SCHEMA, mode="FAILFAST")
    assert back.count() == 100


def test_jsonl_escaping_roundtrip(spark, tmp_path):
    # quotes, backslashes, unicode, tabs — JSON escaping must be
    # loss-free through write -> read
    nasty = 'he said "x\\y"\tüñíçødé   end'
    root = str(tmp_path / "esc")
    write_jsonl(spark.createDataFrame([(7, nasty)], _SCHEMA), root)
    got = read_jsonl(spark, root, _SCHEMA, mode="FAILFAST").collect()
    assert got[0].text == nasty


def test_csv_quoting_roundtrip(spark, tmp_path):
    # embedded separators and double quotes — RFC 4180 quoting
    vals = ['a,b,c', 'say "hi", ok', 'plain']
    root = str(tmp_path / "csvq")
    write_csv(
        spark.createDataFrame(list(enumerate(vals)), _SCHEMA), root
    )
    back = read_csv(spark, root, _SCHEMA, mode="FAILFAST")
    assert sorted((r.doc_id, r.text) for r in back.collect()) == list(
        enumerate(vals)
    )


def test_csv_partial_parse_is_still_quarantined(spark, tmp_path):
    # a truncated row parses its leading fields — it must STILL count
    # as malformed (the under-reporting trap the oracle query's
    # docstring names)
    root = str(tmp_path / "csvp")
    write_csv(spark.createDataFrame([(1, "ok")], _SCHEMA), root)
    _plant(root, "bad.csv", ["doc_id,text", "99"])  # dummy header + short row
    back = read_csv(spark, root, _SCHEMA, mode="PERMISSIVE")
    rows = back.collect()
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 1
    assert bad[0].doc_id == 99  # leading field parsed anyway


# ---------------------------------------------------------------------------
# Streaming face (S8): drop-directory JSONL ingestion through
# ingest_jsonl_stream — stream twin of the q_jsonl_roundtrip design.
# ---------------------------------------------------------------------------
def _landed(spark, land):
    from pyspark.sql import functions as F  # noqa: F401

    return spark.read.parquet(land)


def test_jsonl_stream_lands_batches_and_matches_batch_read(spark, tmp_path):
    import json

    src = tmp_path / "drop"
    src.mkdir()
    for i in range(2):
        with open(src / f"feed{i}.jsonl", "w") as f:
            for j in range(10):
                f.write(json.dumps({"doc_id": i * 10 + j, "text": f"d{j}"}) + "\n")
    with open(src / "bad.jsonl", "w") as f:
        f.write("{nope\n")

    from pyspec_spark.streaming.corpus import ingest_jsonl_stream

    land = str(tmp_path / "landed")
    ck = str(tmp_path / "ck")
    ingest_jsonl_stream(spark, str(src), _SCHEMA, land, checkpoint=ck)

    got = _landed(spark, land)
    # stream-end state == the one-shot batch read (the twin contract).
    # The quarantine COUNT runs on the LANDED table only — counting it
    # on the raw batch read is exactly what Spark's corrupt-only-plan
    # refusal forbids (and what landing exists to solve); the batch
    # side compares valid rows (a projection referencing data columns,
    # which is allowed).
    batch = read_jsonl(spark, str(src), _SCHEMA, mode="PERMISSIVE")
    batch_valid = sorted(
        r.doc_id
        for r in batch.select("doc_id", CORRUPT_COL).collect()
        if r[CORRUPT_COL] is None
    )
    assert got.count() == 21  # 20 valid + 1 planted bad line
    assert got.where(f"{CORRUPT_COL} IS NOT NULL").count() == 1
    assert (
        sorted(r.doc_id for r in got.collect() if r[CORRUPT_COL] is None)
        == batch_valid
        == list(range(20))
    )


def test_jsonl_stream_redrain_is_delta_only(spark, tmp_path):
    import json
    import os as _os

    from pyspec_spark.streaming.corpus import ingest_jsonl_stream

    src = tmp_path / "drop"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "x"}) + "\n")
    land = str(tmp_path / "landed")
    ck = str(tmp_path / "ck")
    ingest_jsonl_stream(spark, str(src), _SCHEMA, land, checkpoint=ck)
    assert _landed(spark, land).count() == 1

    # a second drain with NOTHING new adds nothing (checkpoint holds)
    ingest_jsonl_stream(spark, str(src), _SCHEMA, land, checkpoint=ck)
    assert _landed(spark, land).count() == 1

    # new file -> exactly the delta lands, in a NEW batch dir
    with open(src / "b.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "y"}) + "\n")
    ingest_jsonl_stream(spark, str(src), _SCHEMA, land, checkpoint=ck)
    got = _landed(spark, land)
    assert sorted(r.doc_id for r in got.collect()) == [1, 2]
    batch_dirs = [d for d in _os.listdir(land) if d.startswith("batch=")]
    assert len(batch_dirs) >= 2  # per-batch lineage preserved
