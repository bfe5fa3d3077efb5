"""Live-beamline ingestion: the specfile source as a stream, with the
reference's point-processing prefix applied batch-or-streaming.

SURVEY §2 S1×S7: pyspec's acquisition loop appends `#S` scan blocks to
an open file and analysis code polls `SpecDataFile.reload()`; here the
same file is a Structured Streaming source (SpecSimpleStreamReader) and
the normalization prefix — getYE's y/Monitor with Poisson error and the
zero-monitor guard (P3+P4+P5) — is a plain column transformation, so
one code path serves the batch re-read and the live tail (the same
batch-or-streaming design as streaming/events.py and corpus.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_spec_stream(
    spark: SparkSession, path: str, table: str = "points"
) -> DataFrame:
    """Tail a live SPEC file (appended scans become micro-batches)."""
    from pyspec_spark.sources.spec_datasource import register

    register(spark)
    return (
        spark.readStream.format("specfile")
        .option("path", path)
        .option("table", table)
        .load()
    )


def normalized(
    points: DataFrame,
    detector: str = "Detector",
    monitor: str = "Monitor",
) -> DataFrame:
    """getYE over streamed-or-batch points: norm = det/mon (NULL-safe
    on a zero/absent monitor, the P5 guard), err = sqrt(det)/mon —
    pure row-wise arithmetic, valid under any streaming output mode."""
    det = F.element_at("values", F.lit(detector)).cast("double")
    mon = F.nullif(
        F.element_at("values", F.lit(monitor)).cast("double"), F.lit(0.0)
    )
    return points.select(
        "file",
        "scan_number",
        "point_index",
        F.round(det / mon, 6).alias("norm"),
        F.round(F.sqrt(det) / mon, 6).alias("norm_err"),
    )
