"""Declared queries whose data path runs THROUGH the snapshot lake —
putting lake.py's write → manifest → read chain under the driver's
oracle gate instead of unit tests alone.

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — table-format round-trip verification, the property a lake user
cares about most: what you committed is exactly what every subsequent
reader plans from the manifest.

The query is deliberately side-effectful in a bounded way: each call
stages the documents table into a FRESH lake root under the system tmp
dir (unique per invocation, so repeated driver runs and racing
processes never collide), commits one version, and aggregates the read
back through ``lake_read``.  If any manifest field, partition string,
or file reference were wrong, the aggregation would differ from the
direct-over-parquet oracle and the value hash would catch it.

100 TB posture: the round-trip is one partitioned write (lang-keyed,
the same layout the curation lake uses) + one manifest-planned read;
nothing here scales worse than the write itself, and the read plans
from the manifest's explicit file list (no directory walk).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table


def _tmp_root(prefix: str) -> str:
    """mkdtemp whose removal is deferred to interpreter exit: the
    returned DataFrame plans lazily over the staged files (the driver
    collects AFTER the query function returns), so an eager finally
    would yank the files out from under the read — but without cleanup
    repeated sweep runs accumulate unbounded tmp disk."""
    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


@query(
    "q_lake_roundtrip",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def q_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.lake import lake_append, lake_read

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    root = _tmp_root("pyspec_lake_rt_")
    lake_append(spark, root, d, partition_col="lang", bloom_cols=["doc_id"])
    try:
        back = lake_read(spark, root)
    except ValueError:
        # a zero-row corpus stages no data files, so the committed
        # version is empty — the round-trip of nothing is nothing
        back = d
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# S1b — SPEC DataSource under the oracle gate (r7): the custom Spark 4
# Python DataSource (sources/spec_datasource.py), previously unit-only,
# made driver-checkable: synthesize a SPEC text file FROM the documents
# table (one scan, integer motor columns doc_id / n_chars — integers
# survive the %g text round-trip exactly, which is why no float column
# rides along), read it back through the registered "specfile" format's
# per-scan partitions and values map, and return the parsed columns.
# The oracle selects the same slice straight from the table: any parser
# offset error, column mix-up, or map-key defect flips the value hash.
# Bounded side effect (one tmp file per invocation); exempt from the
# zero-jobs build gate (the synthesis collect IS the fixture).
# ---------------------------------------------------------------------------
_SPEC_RT_MAX_ID = 200


@query(
    "q_spec_roundtrip",
    oracle=f"""
SELECT CAST(doc_id AS DOUBLE) AS doc_id_v,
       CAST(n_chars AS DOUBLE) AS n_chars_v
FROM documents
WHERE doc_id < {_SPEC_RT_MAX_ID}
ORDER BY doc_id_v
""",
)
def q_spec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspec_spark.sources.spec_datasource import SpecDataSource

    rows = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _SPEC_RT_MAX_ID)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
        .collect()
    )
    lines = [
        "#F roundtrip.spec",
        "#E 1300000000",
        "#D Thu Feb 24 14:05:35 2011",
        "#O0 dummy",
        "",
        f"#S 1 ascan doc 0 {max(1, len(rows) - 1)} {max(1, len(rows) - 1)} 1",
        "#D Thu Feb 24 14:06:35 2011",
        "#T 1 (Seconds)",
        "#P0 0.0",
        "#N 2",
        "#L doc_id  n_chars",
    ]
    lines += [f"{r['doc_id']} {r['n_chars']}" for r in rows]
    lines.append("")
    tmp = _tmp_root("pyspec_spec_rt_")
    path = os.path.join(tmp, "roundtrip.spec")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    try:
        spark.dataSource.register(SpecDataSource)
    except Exception:
        pass  # already registered in this session
    pts = spark.read.format("specfile").option("path", path).load()
    return pts.select(
        F.col("values")["doc_id"].alias("doc_id_v"),
        F.col("values")["n_chars"].alias("n_chars_v"),
    ).orderBy("doc_id_v")


# ---------------------------------------------------------------------------
# S6c — lake change-data capture under the oracle gate (r7): commit two
# versions derived from the documents table by CLOSED-FORM edits —
# delete doc_id % 7 == 0, update n_chars on doc_id % 5 == 0 (of the
# survivors), insert 10 fresh keys — then lake_diff the manifests and
# return the changelist.  The oracle states the same closed form
# directly over the table, so the query verifies the whole CDC chain:
# two commits, two manifest-planned reads, the keyed full-outer diff,
# and the change classification.  Same bounded-side-effect contract as
# the other round-trip rows (fresh tmp root per invocation, zero-jobs
# exempt).
# ---------------------------------------------------------------------------
_DIFF_MAX_ID = 300
_DIFF_INS_LO, _DIFF_INS_N = 10_000, 10


@query(
    "q_lake_diff",
    oracle=f"""
WITH base AS (
  SELECT doc_id FROM documents WHERE doc_id < {_DIFF_MAX_ID}
)
SELECT doc_id, 'delete' AS change FROM base WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id, 'update' FROM base WHERE doc_id % 5 = 0 AND doc_id % 7 <> 0
UNION ALL
SELECT CAST(unnest(range({_DIFF_INS_LO}, {_DIFF_INS_LO + _DIFF_INS_N}))
            AS BIGINT) AS doc_id,
       'insert'
ORDER BY doc_id
""",
)
def q_lake_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.lake import lake_diff, lake_overwrite

    base = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _DIFF_MAX_ID)
        .select("doc_id", "lang", "n_chars")
    )
    root = _tmp_root("pyspec_lake_cdc_")
    v1 = lake_overwrite(spark, root, base, partition_col="lang")
    inserted = spark.range(_DIFF_INS_LO, _DIFF_INS_LO + _DIFF_INS_N).select(
        F.col("id").alias("doc_id"),
        F.lit("xx").alias("lang"),
        F.lit(1).cast("long").alias("n_chars"),
    )
    v2_df = (
        base.where(F.col("doc_id") % 7 != 0)
        .withColumn(
            "n_chars",
            F.when(
                F.col("doc_id") % 5 == 0, F.col("n_chars") + 1
            ).otherwise(F.col("n_chars")),
        )
        .unionByName(inserted)
    )
    v2 = lake_overwrite(spark, root, v2_df, partition_col="lang")
    return lake_diff(spark, root, v1, v2, "doc_id").orderBy("doc_id")
