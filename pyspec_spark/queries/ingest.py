"""Raw text-format ingestion under the oracle gate — JSONL and CSV
round-trips with malformed-line quarantine (sources/textlines.py).

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — north-star corpus interchange (S8/S9): every public LLM corpus
ships as JSONL; CSV is the long tail of tabular drops.  The contract
proven here is the one a 100 TB ingest needs: explicit schema (no
inference pass), a POLICY for malformed lines (quarantine column in
the row stream — zero extra passes), and loss-free round-trip of the
content through the format's own escaping.

Both queries: stage the `documents` table in the format (JSONL gzip —
the ecosystem's .jsonl.gz shape; CSV with header+RFC-4180 quoting),
PLANT known-malformed lines in a sidecar file, read back PERMISSIVE,
and return every valid row plus the quarantined-line count.  The
oracle is the documents table itself with the planted count as a
literal — so the result proves (a) no valid row was lost or mangled
by JSON/CSV escaping, (b) every planted bad line was quarantined, not
silently dropped or crashed on.  Bounded-side-effect round-trip
(fresh tmp root, zero-jobs exempt).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.sources.textlines import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from pyspec_spark.tables import table

_DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)
_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

# Planted malformed lines: unparseable JSON, a type violation, and
# plain garbage — the three failure classes a real feed produces.
_BAD_JSONL = [
    '{"doc_id": 1, "text": "trunca',
    '{"doc_id": "not-a-number", "text": 7}',
    "utter garbage, not json",
]
# CSV: a type violation and a wrong field count (truncated upload).
# The first line is a dummy header — the reader skips one per file.
_BAD_CSV = [
    "doc_id,text,lang,source,n_chars",
    "not-a-number,hello,en,web,12",
    "123456,only-two-fields",
]


def _roundtrip(spark: SparkSession, back: DataFrame, staged: str) -> DataFrame:
    """Land the parsed read as columnar, then report valid rows + the
    quarantined-line count off the landed table.

    The staging step is not a workaround, it IS the ingest design: a
    raw text corpus gets exactly ONE parsing pass whose output (data
    columns + quarantine column) lands columnar, and every downstream
    consumer — including the quarantine audit — reads the landed
    table.  It also sidesteps Spark's corrupt-record restriction
    (plans referencing only the internal corrupt column off raw
    JSON/CSV are refused, because a second scan could re-parse
    differently — the exact inconsistency landing once removes).

    Quarantine = the corrupt column is set, REGARDLESS of data
    columns: a malformed CSV row can still carry successfully-parsed
    leading fields (a truncated upload parses doc_id, then runs out),
    and counting only fully-null rows would under-report it.  The
    count joins back as a 1-row broadcast."""
    back.write.mode("overwrite").parquet(staged)
    landed = spark.read.parquet(staged)
    quarantined = landed.agg(
        F.sum(
            F.when(F.col(CORRUPT_COL).isNotNull(), 1).otherwise(0)
        ).alias("n_malformed")
    )
    return (
        landed.where(F.col(CORRUPT_COL).isNull())
        .select(*_DOC_COLS)
        .crossJoin(F.broadcast(quarantined))
        .orderBy("doc_id")
    )


_INGEST_ORACLE = """
SELECT doc_id, text, lang, source, n_chars, CAST({n} AS BIGINT) AS n_malformed
FROM documents
ORDER BY doc_id
"""


@query("q_jsonl_roundtrip", oracle=_INGEST_ORACLE.format(n=len(_BAD_JSONL)))
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.queries.lake_queries import _tmp_root

    root = os.path.join(_tmp_root("pyspec_jsonl_"), "corpus")
    write_jsonl(
        table(spark, sf_dir, "documents").select(*_DOC_COLS),
        root,
        compression="gzip",
    )
    with open(os.path.join(root, "feed-bad.jsonl"), "w") as f:
        f.write("\n".join(_BAD_JSONL) + "\n")
    back = read_jsonl(spark, root, _DOC_SCHEMA, mode="PERMISSIVE")
    return _roundtrip(spark, back, root + "_parsed")


@query("q_csv_roundtrip", oracle=_INGEST_ORACLE.format(n=len(_BAD_CSV) - 1))
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.queries.lake_queries import _tmp_root

    root = os.path.join(_tmp_root("pyspec_csv_"), "corpus")
    write_csv(table(spark, sf_dir, "documents").select(*_DOC_COLS), root)
    with open(os.path.join(root, "feed-bad.csv"), "w") as f:
        f.write("\n".join(_BAD_CSV) + "\n")
    back = read_csv(spark, root, _DOC_SCHEMA, mode="PERMISSIVE")
    return _roundtrip(spark, back, root + "_parsed")
