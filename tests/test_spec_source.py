"""Golden + behavior tests for the SPEC DataSource (SURVEY.md §2 S1/S2,
§5.2 layer 2).  Fixtures: synthetic SPEC files per FIXTURES.md B1."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.fixtures import MOTORS_0, MOTORS_1, SPEC_COLUMNS, make_spec_dir


@pytest.fixture(scope="module")
def spec_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("spec_files")
    truths = make_spec_dir(str(base))
    return str(base), truths


@pytest.fixture(scope="module")
def registered(spark):
    from pyspec_spark.sources.spec_datasource import register

    register(spark)
    return spark


def _points(spark, path, **opts):
    r = spark.read.format("specfile").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_point_counts_match_truth(registered, spec_dir):
    spark = registered
    base, truths = spec_dir
    df = _points(spark, base)
    got = {
        (r["file"], r["scan_number"]): r["n"]
        for r in df.groupBy("file", "scan_number").count().withColumnRenamed("count", "n").collect()
    }
    for t in truths:
        fname = t["file"]
        for n, s in t["scans"].items():
            expected = s["n_points"]
            if fname == "exp0.spec" and n == 19:
                expected += t["dup_19"]["n_points"]
            assert got[(fname, n)] == expected, (fname, n)


def test_values_map_and_columns(registered, spec_dir):
    spark = registered
    base, truths = spec_dir
    row = (
        _points(spark, base)
        .where("file = 'exp1.spec' AND scan_number = 2 AND point_index = 0")
        .collect()[0]
    )
    assert set(row["values"].keys()) == set(SPEC_COLUMNS)
    assert row["values"]["Monitor"] > 9e4


def test_scan_metadata(registered, spec_dir):
    spark = registered
    base, truths = spec_dir
    scans = _points(spark, base, table="scans")
    r = {s["scan_number"]: s for s in scans.where("file = 'exp0.spec'").collect()}
    truth = truths[0]["scans"]
    # UB, wavelength, motors, monitor
    assert r[3]["wavelength"] == pytest.approx(1.5405)
    assert list(r[3]["ub"]) == pytest.approx(truth[3]["ub"])
    assert r[3]["monitor"] == pytest.approx(truth[3]["monitor"], rel=1e-6)
    assert r[4]["monitor"] is None  # even scans have no #M
    m = r[5]["motors"]
    assert set(m.keys()) == set(MOTORS_0 + MOTORS_1)
    for k, v in truth[5]["motors"].items():
        assert m[k] == pytest.approx(v, abs=1e-4)
    # aborted quirk
    assert r[13]["aborted"] is True
    assert r[13]["n_points_declared"] == 41
    # alt-columns quirk
    assert list(r[21]["columns"]) == truth[21]["columns"]
    # command + date
    assert r[1]["command"].startswith("ascan th")
    assert r[1]["ts"] is not None and r[1]["ts"].year == 2011


def test_mca_attached(registered, spec_dir):
    spark = registered
    base, _ = spec_dir
    rows = (
        _points(spark, base)
        .where("file = 'exp0.spec' AND scan_number = 7 AND mca IS NOT NULL")
        .collect()
    )
    assert len(rows) == 2  # two points carry spectra
    assert all(len(r["mca"]) == 1024 for r in rows)


def test_duplicate_scan_number_kept(registered, spec_dir):
    spark = registered
    base, _ = spec_dir
    scans = _points(spark, base, table="scans")
    dups = scans.where("file = 'exp0.spec' AND scan_number = 19").collect()
    assert len(dups) == 2


def test_scan_number_pushdown_prunes_partitions(registered, spec_dir):
    """scan_number predicates must prune scan-block partitions in the
    reader (the distributed twin of pyspec's byte-offset index)."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    from pyspec_spark.sources.spec_datasource import (
        SpecDataSourceReader,
        SpecPushdownReader,
    )

    spark = registered
    base, _ = spec_dir
    # end-to-end: filtered read returns the right rows (pushdown opted in)
    assert (
        _points(spark, base, pushdown="true").where("scan_number = 5").count()
        == 3 * 81
    )
    # the BASE reader must NOT define pushFilters (Spark 4.1 hard-fails a
    # pushFilters-bearing reader when the session conf is false — the r8
    # driver red; pushdown is an opt-in subclass)
    assert "pushFilters" not in SpecDataSourceReader.__dict__
    # reader-level: partition list shrinks under pushdown
    full = SpecPushdownReader({"path": base}, "points")
    assert len(full.partitions()) == 3 * 25 + 1  # 25 scans/file + 1 dup block
    eq = SpecPushdownReader({"path": base}, "points")
    rejected = list(eq.pushFilters([EqualTo(("scan_number",), 5)]))
    assert rejected == []
    assert len(eq.partitions()) == 3  # one block per file
    rng = SpecPushdownReader({"path": base}, "points")
    list(rng.pushFilters([GreaterThanOrEqual(("scan_number",), 10), LessThan(("scan_number",), 12)]))
    assert len(rng.partitions()) == 6  # scans 10,11 in each of 3 files
    # IN-list (what .isin()/.where("IN (...)") push down; In.value tuple)
    from pyspark.sql.datasource import In

    inr = SpecPushdownReader({"path": base}, "points")
    assert list(inr.pushFilters([In(("scan_number",), (2, 5))])) == []
    assert len(inr.partitions()) == 6  # scans 2,5 in each of 3 files
    assert (
        _points(spark, base, pushdown="true")
        .where(F.col("scan_number").isin(2, 5))
        .count()
        == 3 * 2 * 81
    )


def test_reload_append_pattern(registered, spec_dir, tmp_path):
    """pyspec `reload`: re-running load() after append sees new scans."""
    import shutil

    spark = registered
    base, _ = spec_dir
    f = tmp_path / "grow.spec"
    shutil.copyfile(f"{base}/exp2.spec", f)
    n0 = _points(spark, str(f), table="scans").count()
    with open(f"{base}/exp2.spec") as src, open(f, "a") as dst:
        text = src.read()
        block = text[text.rindex("#S ") :].replace("#S 25", "#S 26")
        dst.write("\n" + block)
    n1 = _points(spark, str(f), table="scans").count()
    assert n1 == n0 + 1


# ---------------------------------------------------------------------------
# Streaming tail (r5): the reference's `reload` loop as a real
# Structured Streaming source (SpecSimpleStreamReader, SURVEY §2 S1xS7)
# ---------------------------------------------------------------------------
def _scan_block(src_text: str, new_number: int) -> str:
    """Clone the last #S block of a fixture file under a new number."""
    block = src_text[src_text.rindex("#S ") :]
    old = block.split()[1]
    return "\n" + block.replace(f"#S {old}", f"#S {new_number}")


def test_stream_tails_appended_scans(registered, spec_dir, tmp_path):
    """Streamed scans == batch re-read at every quiescent point, across
    a mid-stream append; the trailing scan is held until the file goes
    quiescent, then emitted exactly once."""
    import shutil
    import time as _time

    spark = registered
    base, _ = spec_dir
    f = str(tmp_path / "live.spec")
    shutil.copyfile(f"{base}/exp2.spec", f)
    src_text = open(f"{base}/exp2.spec").read()

    q = (
        spark.readStream.format("specfile")
        .option("path", f)
        .option("table", "scans")
        .load()
        .writeStream.format("memory")
        .queryName("spec_live")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        batch0 = _points(spark, f, table="scans").count()
        got0 = spark.sql("SELECT count(*) c FROM spec_live").first()["c"]
        assert got0 == batch0  # trailing scan emitted after quiescence

        # append two scans mid-stream (the pyspec reload pattern)
        with open(f, "a") as dst:
            dst.write(_scan_block(src_text, 26))
        q.processAllAvailable()
        with open(f, "a") as dst:
            dst.write(_scan_block(src_text, 27))
        q.processAllAvailable()
        # one more microbatch cycle for the quiescent trailing block
        deadline = _time.time() + 30
        want = batch0 + 2
        while _time.time() < deadline:
            q.processAllAvailable()
            if (
                spark.sql("SELECT count(*) c FROM spec_live").first()["c"]
                == want
            ):
                break
            _time.sleep(0.2)
        rows = spark.sql(
            "SELECT scan_number, count(*) n FROM spec_live "
            "GROUP BY scan_number"
        ).collect()
        streamed = {r["scan_number"]: r["n"] for r in rows}
        batch = {
            r["scan_number"]: r["n"]
            for r in _points(spark, f, table="scans")
            .groupBy("scan_number")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert streamed == batch
    finally:
        q.stop()


def test_stream_reader_replay_and_truncation_guard(spec_dir, tmp_path):
    """Unit-level offset semantics: readBetweenOffsets replays exactly
    the rows read() produced between two offsets, and a shrinking file
    (append-only violation) raises."""
    import shutil

    import pytest as _pytest

    from pyspec_spark.sources.spec_datasource import SpecSimpleStreamReader

    base, _ = spec_dir
    f = str(tmp_path / "replay.spec")
    shutil.copyfile(f"{base}/exp2.spec", f)

    r = SpecSimpleStreamReader({"path": f}, "points")
    o0 = r.initialOffset()
    rows1, o1 = r.read(o0)
    rows1 = list(rows1)
    rows2, o2 = r.read(o1)  # quiescent: trailing scan arrives
    rows2 = list(rows2)
    assert rows2  # the held-back trailing scan
    replay = list(r.readBetweenOffsets(o0, o2))
    assert replay == rows1 + rows2
    # a third poll with no growth yields nothing and a stable offset
    rows3, o3 = r.read(o2)
    assert list(rows3) == [] and o3 == o2

    # truncation: append-only violation must raise, not re-emit
    text = open(f).read()
    with open(f, "w") as fh:
        fh.write(text[: len(text) // 2])
    with _pytest.raises(ValueError, match="append-only"):
        r.read(o2)


def test_stream_normalization_prefix_matches_batch(
    registered, spec_dir, tmp_path
):
    """ST9-style composition: the getYE normalization prefix
    (streaming/spec.py) over the live tail equals the batch read
    through the SAME transformation — one code path, two runtimes."""
    import shutil

    from pyspec_spark.streaming.spec import normalized, read_spec_stream

    spark = registered
    base, _ = spec_dir
    f = str(tmp_path / "norm.spec")
    shutil.copyfile(f"{base}/exp2.spec", f)
    src_text = open(f"{base}/exp2.spec").read()

    q = (
        normalized(read_spec_stream(spark, f))
        .writeStream.format("memory")
        .queryName("spec_norm")
        .option("checkpointLocation", str(tmp_path / "ckpt_norm"))
        .start()
    )
    try:
        q.processAllAvailable()
        with open(f, "a") as dst:
            dst.write(
                "\n"
                + src_text[src_text.rindex("#S ") :].replace("#S 25", "#S 26")
            )
        q.processAllAvailable()
        q.processAllAvailable()  # quiescent poll releases the tail scan
        got = {
            (r["scan_number"], r["point_index"]): (r["norm"], r["norm_err"])
            for r in spark.sql("SELECT * FROM spec_norm").collect()
        }
        want = {
            (r["scan_number"], r["point_index"]): (r["norm"], r["norm_err"])
            for r in normalized(_points(spark, f)).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_stream_poll_detects_points_into_emitted_scan(spec_dir, tmp_path):
    """The quiescence heuristic is VERIFIED retroactively: if the
    trailing scan was emitted (file quiescent for one poll) and data
    points later land in that same scan — acquisition slower than the
    trigger interval — the reader must raise, never silently drop the
    points.  Whitespace-only extent growth (the newline before a newly
    appended #S) stays legal."""
    import shutil

    import pytest as _pytest

    from pyspec_spark.sources.spec_datasource import SpecSimpleStreamReader

    base, _ = spec_dir
    f = str(tmp_path / "slow.spec")
    shutil.copyfile(f"{base}/exp2.spec", f)
    src_text = open(f"{base}/exp2.spec").read()

    r = SpecSimpleStreamReader({"path": f, "table": "points"}, "points")
    _, off1 = r._poll(r.initialOffset())     # sees file, not quiescent
    rows2, off2 = r._poll(off1)              # quiescent -> trailing emitted
    assert rows2, "trailing scan should emit on the quiescent poll"

    # legal: append a NEW scan (leading newline grows the old block by
    # whitespace only)
    with open(f, "a") as dst:
        dst.write(_scan_block(src_text, 30))
    rows3, off3 = r._poll(off2)
    # not quiescent yet -> nothing emitted, but no error either
    _, off4 = r._poll(off3)                  # quiescent -> scan 30 emits

    # violation: data points appended INTO the (already emitted)
    # trailing scan
    with open(f, "a") as dst:
        dst.write("1.25 1 1 1 0 1 100000 4242\n")
    with _pytest.raises(ValueError, match="already-emitted"):
        r._poll(off4)


def test_stream_poll_keeps_state_for_vanished_files(spec_dir, tmp_path):
    """A file transiently missing from the glob must keep its emitted
    counter in the offset — reappearing must NOT re-emit old scans."""
    import os
    import shutil

    from pyspec_spark.sources.spec_datasource import SpecSimpleStreamReader

    base, _ = spec_dir
    d = tmp_path / "dir"
    d.mkdir()
    f = str(d / "a.spec")
    shutil.copyfile(f"{base}/exp2.spec", f)

    r = SpecSimpleStreamReader({"path": str(d), "table": "points"}, "points")
    _, off1 = r._poll(r.initialOffset())
    rows2, off2 = r._poll(off1)              # quiescent -> all scans emitted
    n_emitted = off2["files"][f]["emitted"]
    assert n_emitted > 0

    hidden = str(tmp_path / "a.spec.tmp")    # outside the globbed dir
    os.rename(f, hidden)                     # transient disappearance
    rows3, off3 = r._poll(off2)
    assert rows3 == []
    assert off3["files"][f]["emitted"] == n_emitted  # state carried

    os.rename(hidden, f)                     # file comes back
    rows4, off4 = r._poll(off3)
    assert rows4 == []                       # nothing re-emitted
    assert off4["files"][f]["emitted"] == n_emitted
