"""Line-oriented text-format ingestion — JSONL and CSV.

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — pyspec reads SPEC instrument files; JSONL/CSV are the north-star
corpus-interchange formats (every public LLM corpus — C4, The Pile,
RedPajama, Dolma — ships as JSONL), so a training-data engine must
ingest them with an explicit malformed-line POLICY, not crash or
silently drop.

Design notes (100 TB posture):

- **Schema is mandatory.** `spark.read.json/csv` without a schema
  runs a full inference pass over the data (one extra scan of
  everything); at corpus scale the schema is a contract, not a
  discovery.  These helpers take a DDL string and never infer.
- **Malformed-line policy is the caller's choice**, surfaced exactly
  as Spark's reader modes: PERMISSIVE routes the raw offending line
  into a quarantine column (auditable — the curation answer),
  DROPMALFORMED discards silently (the throughput answer), FAILFAST
  aborts the job (the ingestion-gate answer).  The quarantine column
  rides the normal row stream: zero extra passes.
- **Compression**: gzip output is supported because the ecosystem
  ships .jsonl.gz, but each .gz file is NON-SPLITTABLE — one file =
  one task regardless of size.  That is fine here (a write produces
  one file per partition, so parallelism is preserved end-to-end) and
  at ingest time the mitigation is many moderate files, which is how
  public corpora are distributed anyway.
- Text/JSON line readers stay wholly JVM-side (no Python in the scan
  path); Catalyst prunes parsed columns (JSON parsing of unreferenced
  fields is skipped via the pruning the reader implements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_malformed"


def permissive_schema(schema: str) -> str:
    """The PERMISSIVE read schema: caller's contract + the quarantine
    column.  One definition — the batch readers and the streaming
    ingest face must never drift on the quarantine column's name or
    type (the stream-end == batch-read twin tests assume they agree)."""
    return f"{schema}, {CORRUPT_COL} STRING"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write one JSON object per line (the corpus-interchange shape),
    one file per partition."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read JSONL under an explicit schema contract.

    ``mode="PERMISSIVE"`` appends ``corrupt_col`` holding the raw text
    of every line that failed to parse (or failed the schema's types),
    with all data columns null for that row — filter on it for the
    quarantine stream.  ``DROPMALFORMED`` / ``FAILFAST`` behave as the
    Spark reader defines."""
    full = (
        f"{schema}, {corrupt_col} STRING"
        if mode.upper() == "PERMISSIVE"
        else schema
    )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    sep: str = ",",
) -> None:
    """Write CSV with a header row, quoting only where needed."""
    w = (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("sep", sep)
        .option("escape", '"')  # RFC 4180 doubled-quote escaping
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = CORRUPT_COL,
    sep: str = ",",
) -> DataFrame:
    """Read headered CSV under an explicit schema contract, with the
    same malformed-line policy surface as read_jsonl (PERMISSIVE
    quarantines lines whose field count or types violate the schema,
    e.g. a truncated upload or a stray unquoted delimiter)."""
    full = (
        f"{schema}, {corrupt_col} STRING"
        if mode.upper() == "PERMISSIVE"
        else schema
    )
    return (
        spark.read.schema(full)
        .option("header", "true")
        .option("sep", sep)
        .option("escape", '"')
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )
