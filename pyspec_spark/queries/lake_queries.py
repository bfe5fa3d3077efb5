"""Engine-subsystem ROUND-TRIP queries — the oracle gate applied to
paths that are side-effectful by nature and were historically unit-only:
the snapshot lake's write → manifest → read chain and CDC diff (S6b/
S6c), the SPEC DataSource and its UDTF twin (S1b/UD4), the SPE binary
source and the dark-frame role (S3/S4), and the streaming runtime's
watermark/late-data policy (ST4).

Shared contract: each call synthesizes its fixture into a FRESH tmp
root (unique per invocation, atexit-reclaimed, so repeated driver runs
and racing processes never collide), drives the REAL engine path, and
returns an aggregation whose oracle is either the source table itself
or a closed-form generate-series replay — any manifest field, partition
string, parser offset, header byte, or watermark boundary that goes
wrong flips the value hash.

Reference loci (SURVEY.md §0 policy): the lake/CDC rows are absent from
`stuwilkins/pyspec` [H] (table-format capability); the SPEC/SPE rows
verify the reference's own file formats through this engine's sources.

100 TB posture: every round-trip costs its own bounded write + one
manifest-/table-planned read; nothing scales worse than the write, and
lake reads plan from explicit file lists (no directory walk).
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


def _spec_fixture_rows(spark: SparkSession, sf_dir: str) -> list:
    return (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _SPEC_RT_MAX_ID)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
        .collect()
    )


def _spec_fixture_lines(rows) -> list[str]:
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
    return lines


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

    from pyspec_spark.sources.spec_datasource import read_spec

    lines = _spec_fixture_lines(_spec_fixture_rows(spark, sf_dir))
    tmp = _tmp_root("pyspec_spec_rt_")
    path = os.path.join(tmp, "roundtrip.spec")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    # read_spec sniffs spark.sql.python.filterPushdown.enabled in THIS
    # session and only serves the pushFilters-bearing reader when true —
    # the r8 driver session had it false and hard-crashed the old direct
    # format read (CORRECTNESS_r08 q_spec_roundtrip DATA_SOURCE_PUSHDOWN_
    # DISABLED); correctness must not depend on the conf.
    pts = read_spec(spark, path)
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


# ---------------------------------------------------------------------------
# ST11 — streaming vector-index ingestion under the oracle gate (r8):
# the ONE r7 engine subsystem that was still unit-only.  The query
# drives the real path end to end: derive a frozen codebook from the
# embeddings table (the 8 lowest vec_ids — no RNG), replay the table as
# an availableNow file stream through index_to_lake (map-side nearest-
# centroid assignment -> cid-partitioned lake commits with the
# exactly-once manifest watermark), then LOOK UP through manifest-
# pruned lake_scan probes of the 2 cells nearest a fixed query vector
# (vec_id 0's embedding) and rank candidates by an exact integer
# micro-unit dot product.  The oracle replays codebook, assignment
# argmin, probe choice, and scoring straight off the table in SQL: if
# ingestion dropped/duplicated a batch, assigned a wrong cell, or the
# manifest pruning surfaced the wrong files, membership or n_cand
# flips the value hash.
#
# Determinism contract (the q_ann_pq_det discipline):
# - assignment distances: explicit 64-term left-associated chains ==
#   Spark's zip_with + left-fold aggregate, bit-identical IEEE;
# - argmin: array_min / MIN(struct(dist, cid)) — shared lexicographic
#   struct order, lowest-cid tiebreak;
# - probe choice + scores: per-element micro-unit quantization ->
#   integer sums (order-free), ranked on (integer, vec_id);
# - every output column is an integer.
#
# Bounded side effect per invocation (fresh tmp root, atexit-reclaimed);
# exempt from the zero-jobs build gate as a materializing round-trip.
# ---------------------------------------------------------------------------
_VIX_D = 64
_VIX_K = 8          # codebook size (vec_id < _VIX_K)
_VIX_NPROBE = 2
_VIX_TOPK = 10


def _vix_sq_chain(e: str, c: str) -> str:
    """64-term left-associated squared-L2 chain — must mirror
    assign_cells' zip_with((a-b)*(a-b)) + left-fold exactly."""
    return " + ".join(
        f"(CAST({e}.embedding[{i}] AS DOUBLE) - CAST({c}.embedding[{i}] AS DOUBLE))"
        f" * (CAST({e}.embedding[{i}] AS DOUBLE) - CAST({c}.embedding[{i}] AS DOUBLE))"
        for i in range(1, _VIX_D + 1)
    )


def _vix_probe_chain(c: str, q: str) -> str:
    """Integer micro-unit centroid distance: per-element quantization
    then an order-free integer sum (replayed in Python driver-side)."""
    return " + ".join(
        f"CAST(ROUND((CAST({c}.embedding[{i}] AS DOUBLE) - CAST({q}.embedding[{i}] AS DOUBLE))"
        f" * (CAST({c}.embedding[{i}] AS DOUBLE) - CAST({q}.embedding[{i}] AS DOUBLE)) * 1e6) AS BIGINT)"
        for i in range(1, _VIX_D + 1)
    )


def _vix_dot_chain(e: str, q: str) -> str:
    return " + ".join(
        f"CAST(ROUND(CAST({e}.embedding[{i}] AS DOUBLE)"
        f" * CAST({q}.embedding[{i}] AS DOUBLE) * 1e6) AS BIGINT)"
        for i in range(1, _VIX_D + 1)
    )


_VIX_ORACLE = f"""
WITH cb AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding
  FROM embeddings WHERE vec_id < {_VIX_K}
),
qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
assigned AS (
  SELECT e.vec_id,
         (MIN(struct_pack(d := {_vix_sq_chain('e', 'c')}, cid := c.cid))).cid AS cid
  FROM embeddings e, cb c
  GROUP BY e.vec_id
),
probes AS (
  SELECT c.cid, {_vix_probe_chain('c', 'q')} AS dist_micro
  FROM cb c, qv q
),
probed AS (SELECT cid FROM probes ORDER BY dist_micro, cid LIMIT {_VIX_NPROBE}),
cand AS (
  SELECT a.vec_id, a.cid, e.embedding
  FROM assigned a JOIN embeddings e USING (vec_id)
  WHERE a.cid IN (SELECT cid FROM probed)
)
SELECT c.vec_id, c.cid,
       {_vix_dot_chain('c', 'q')} AS dot_micro,
       COUNT(*) OVER () AS n_cand
FROM cand c, qv q
ORDER BY dot_micro DESC, c.vec_id
LIMIT {_VIX_TOPK}
"""


def _vix_probe_score(
    spark: SparkSession,
    root: str,
    qv,
    where: list | None = None,
    extra_cols: tuple = (),
) -> DataFrame:
    """Shared probe + integer-scoring tail of the _VIX family
    (q_vector_index_roundtrip and q_vector_delete): rank centroids
    driver-side off the PERSISTED codebook (integer micro-unit
    distances == the oracle's chain), manifest-pruned lake_scan of the
    _VIX_NPROBE winning cells under ONE snapshot, exact micro-unit dot
    ranking with the n_cand witness column.  ONE definition so the
    tie-breaks and rounding discipline cannot drift between the two
    oracles.

    n_cand is a 1-row count aggregate broadcast-cross-joined onto the
    candidates (the n_docs pattern from text_ranking) — never a
    `count(*) over ()` window: with nprobe cells probed the candidate
    set is corpus-fraction-sized (~nprobe·n/k rows), and a global
    window would funnel all of it through one Exchange SinglePartition
    BEFORE the top-k.

    ``where`` (r12, L5d) composes extra lake_scan predicates with the
    cell probe — PRE-filtering: candidates are restricted BEFORE the
    top-k (n_cand witnesses it), and on a cluster_col lake the
    predicate prunes files inside each probed cell.  ``extra_cols``
    ride through to the output."""
    from pyspec_spark.functions.determinism import _fixed6
    from pyspec_spark.lake import lake_scan
    from pyspec_spark.streaming.vectors import load_centroids

    cids, C = load_centroids(root)

    def dist_micro(cvec) -> int:
        tot = 0
        for a, b in zip(cvec, qv):
            t = (a - b) * (a - b) * 1e6
            tot += int(t + 0.5) if t >= 0 else -int(0.5 - t)
        return tot

    probed = sorted(
        (dist_micro(C[i]), int(cids[i])) for i in range(len(cids))
    )[:_VIX_NPROBE]
    parts = [
        lake_scan(spark, root, [("cid", "=", cid)] + list(where or []))
        for _, cid in probed
    ]
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)

    qlit = F.array(*[F.lit(x) for x in qv])
    dot_micro = F.aggregate(
        F.zip_with("embedding", qlit, lambda a, b: a.cast("double") * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + _fixed6(x),
    )
    n_cand = cand.agg(F.count("*").alias("n_cand"))
    return (
        cand.select(
            "vec_id", "cid", *extra_cols, dot_micro.alias("dot_micro")
        )
        .crossJoin(F.broadcast(n_cand))
        .orderBy(F.desc("dot_micro"), "vec_id")
        .limit(_VIX_TOPK)
    )


@query("q_vector_index_roundtrip", oracle=_VIX_ORACLE)
def q_vector_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspec_spark.streaming.vectors import index_to_lake

    e = table(spark, sf_dir, "embeddings")
    cb_rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < _VIX_K)
        .select("vec_id", "embedding")
        .collect()
    )
    if not cb_rows or cb_rows[0][0] != 0:
        # empty (or vec_id-0-less) corpus: nothing to index or query
        return spark.createDataFrame(
            [], "vec_id BIGINT, cid INT, dot_micro BIGINT, n_cand BIGINT"
        )

    # replay the table as a 4-micro-batch availableNow file stream
    # through the real ingestion path (assignment + manifest watermark)
    src = _tmp_root("pyspec_vix_src_")
    e.select("vec_id", "embedding").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = _tmp_root("pyspec_vix_idx_")
    index_to_lake(
        stream,
        spark,
        root,
        cb_rows,
        checkpoint=os.path.join(root, "_chk"),
    )

    # probe + score off the persisted codebook (shared _VIX tail)
    return _vix_probe_score(spark, root, cb_rows[0][1])


# ---------------------------------------------------------------------------
# ST11c — vector-index DELETION under the oracle gate (r10): the
# curation-deletion symmetry.  The engine's own pipeline drops
# documents (dedup losers, quality fails, L35b split repair) and r10
# gave the TERM index tombstones (L40e, merge-on-read) — this closes
# the same gap for the VECTOR index, copy-on-write via lake_delete
# (delete_vectors in streaming/vectors.py documents why the two
# indexes want opposite designs).
#
# Flow: codebook = the 8 lowest vec_ids (the _VIX discipline), batch
# assignment via assign_cells (map-side argmin, zero shuffle),
# lake_append into a cid-partitioned root, then delete_vectors for the
# deterministic set vec_id % 7 == 3, then the SAME probe + integer
# micro-unit scoring as q_vector_index_roundtrip over the post-delete
# snapshot.  The oracle replays codebook/assignment/probe/scoring off
# the embeddings table and EXCLUDES the deleted ids from candidates
# only (assignment ran pre-delete; the frozen codebook never moves):
# a delete that dropped the wrong rows, rewrote an untouched cell
# wrongly, or resurrected a deleted id through a stale manifest entry
# flips membership, n_cand, or the value hash.
#
# Bounded side effect per invocation (fresh tmp root, atexit-
# reclaimed); exempt from the zero-jobs build gate as a materializing
# round-trip.  The touched-cells-only file accounting is pinned in
# tests/test_streaming.py (carried-by-reference manifest entries).
# ---------------------------------------------------------------------------
_VDEL_MOD, _VDEL_RESID = 7, 3

_VDEL_ORACLE = f"""
WITH cb AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding
  FROM embeddings WHERE vec_id < {_VIX_K}
),
qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
assigned AS (
  SELECT e.vec_id,
         (MIN(struct_pack(d := {_vix_sq_chain('e', 'c')}, cid := c.cid))).cid AS cid
  FROM embeddings e, cb c
  GROUP BY e.vec_id
),
probes AS (
  SELECT c.cid, {_vix_probe_chain('c', 'q')} AS dist_micro
  FROM cb c, qv q
),
probed AS (SELECT cid FROM probes ORDER BY dist_micro, cid LIMIT {_VIX_NPROBE}),
cand AS (
  SELECT a.vec_id, a.cid, e.embedding
  FROM assigned a JOIN embeddings e USING (vec_id)
  WHERE a.cid IN (SELECT cid FROM probed)
    AND a.vec_id % {_VDEL_MOD} <> {_VDEL_RESID}
)
SELECT c.vec_id, c.cid,
       {_vix_dot_chain('c', 'q')} AS dot_micro,
       COUNT(*) OVER () AS n_cand
FROM cand c, qv q
ORDER BY dot_micro DESC, c.vec_id
LIMIT {_VIX_TOPK}
"""


@query("q_vector_delete", oracle=_VDEL_ORACLE)
def q_vector_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.lake import lake_append
    from pyspec_spark.streaming.vectors import (
        assign_cells,
        delete_vectors,
        save_centroids,
    )

    e = table(spark, sf_dir, "embeddings")
    cb_rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < _VIX_K)
        .select("vec_id", "embedding")
        .collect()
    )
    if not cb_rows or cb_rows[0][0] != 0:
        return spark.createDataFrame(
            [], "vec_id BIGINT, cid INT, dot_micro BIGINT, n_cand BIGINT"
        )

    # batch build: map-side assignment -> one cid-partitioned commit
    root = _tmp_root("pyspec_vdel_idx_")
    save_centroids(root, cb_rows)
    lake_append(
        spark,
        root,
        assign_cells(e.select("vec_id", "embedding"), cb_rows),
        partition_col="cid",
        bloom_cols=["vec_id"],
    )

    # the deletion under test: ids the curation pipeline would drop
    delete_vectors(
        spark,
        root,
        e.where(F.col("vec_id") % _VDEL_MOD == _VDEL_RESID).select("vec_id"),
    )

    # probe + score over the post-delete snapshot (shared _VIX tail —
    # one definition of the tie-breaks and micro-unit rounding)
    return _vix_probe_score(spark, root, cb_rows[0][1])


# ---------------------------------------------------------------------------
# L5d — filtered vector search through the MAINTAINED vector lake
# (r12): composes L5c's pre-filtering semantics with ST11/ST11c's
# index lifecycle — the query a production vector store actually
# answers: "top-k where label=X" against the index AFTER deletes, not
# against a pristine in-plan corpus.  The r11 pieces were one seam
# apart (q_ann_ivf_filtered probes an in-plan quantizer; the lake
# index served unfiltered lookups only) — exactly the shape of the
# r10 L40g/L40d gap that became L40j.
#
# Flow: embeddings + a content-derived label ingest into the IVF lake
# with cluster_col="label" (the r12 second at-rest key: one file per
# (cid, label), so the label predicate prunes FILES inside each probed
# cell — footer min==max), then delete_vectors drops the curation
# losers (vec_id % 7 == 3, the ST11c set; lake_delete PRESERVES the
# clustered layout on rewrite), then the serve probes _VIX_NPROBE
# cells with the label predicate composed into each cell scan.
# PRE-filtering semantics: the predicate restricts candidates BEFORE
# the top-k (n_cand shrinks to the label's share — the witness
# column), so a selective filter still returns k true matches.
#
# The oracle replays codebook/assignment/probe/scoring off the
# embeddings table, excluding deleted ids AND non-matching labels from
# candidates only.  100 TB: probed-cells × matching-label files only
# are opened (inputFiles-gated in test_streaming.py); everything else
# is the ST11c posture.
# ---------------------------------------------------------------------------
_VLF_LABELS, _VLF_TARGET = 4, 1

_VLF_ORACLE = f"""
WITH cb AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding
  FROM embeddings WHERE vec_id < {_VIX_K}
),
qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
assigned AS (
  SELECT e.vec_id,
         (MIN(struct_pack(d := {_vix_sq_chain('e', 'c')}, cid := c.cid))).cid AS cid
  FROM embeddings e, cb c
  GROUP BY e.vec_id
),
probes AS (
  SELECT c.cid, {_vix_probe_chain('c', 'q')} AS dist_micro
  FROM cb c, qv q
),
probed AS (SELECT cid FROM probes ORDER BY dist_micro, cid LIMIT {_VIX_NPROBE}),
cand AS (
  SELECT a.vec_id, a.cid, e.embedding
  FROM assigned a JOIN embeddings e USING (vec_id)
  WHERE a.cid IN (SELECT cid FROM probed)
    AND a.vec_id % {_VDEL_MOD} <> {_VDEL_RESID}
    AND a.vec_id % {_VLF_LABELS} = {_VLF_TARGET}
)
SELECT c.vec_id, c.cid,
       CAST(c.vec_id % {_VLF_LABELS} AS INT) AS label,
       {_vix_dot_chain('c', 'q')} AS dot_micro,
       COUNT(*) OVER () AS n_cand
FROM cand c, qv q
ORDER BY dot_micro DESC, c.vec_id
LIMIT {_VIX_TOPK}
"""


@query("q_ann_lake_filtered", oracle=_VLF_ORACLE)
def q_ann_lake_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.lake import lake_append
    from pyspec_spark.streaming.vectors import (
        assign_cells,
        delete_vectors,
        save_centroids,
    )

    e = table(spark, sf_dir, "embeddings")
    cb_rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < _VIX_K)
        .select("vec_id", "embedding")
        .collect()
    )
    if not cb_rows or cb_rows[0][0] != 0:
        return spark.createDataFrame(
            [],
            "vec_id BIGINT, cid INT, label INT, "
            "dot_micro BIGINT, n_cand BIGINT",
        )

    # build: map-side assignment, label derived content-side, ONE
    # cid-partitioned label-clustered commit
    root = _tmp_root("pyspec_vlf_idx_")
    save_centroids(root, cb_rows)
    labeled = assign_cells(e.select("vec_id", "embedding"), cb_rows).withColumn(
        "label", F.pmod("vec_id", F.lit(_VLF_LABELS)).cast("int")
    )
    lake_append(
        spark,
        root,
        labeled,
        partition_col="cid",
        bloom_cols=["vec_id"],
        cluster_col="label",
    )

    # maintenance: the ST11c deletion (clustered layout preserved)
    delete_vectors(
        spark,
        root,
        e.where(F.col("vec_id") % _VDEL_MOD == _VDEL_RESID).select("vec_id"),
    )

    # filtered serve over the post-delete snapshot (shared _VIX tail)
    return _vix_probe_score(
        spark,
        root,
        cb_rows[0][1],
        where=[("label", "=", _VLF_TARGET)],
        extra_cols=("label",),
    )


# ---------------------------------------------------------------------------
# L5e — PQ-coded maintained vector lake (r13): the production IVFADC
# at-rest layout composed with the index lifecycle — VERDICT r12's #1
# residue: the maintained lake stored raw float vectors, so every
# probed cell's FULL vectors were read per lookup even though the repo
# owned both halves (in-plan IVFADC: q_ann_ivfpq_topk; lake index:
# ST11).  Now the lake pair is codes (hot, cid-partitioned,
# vec_id-bloomed) + raw vectors (cold, vb-clustered for point fetch),
# and the serve is: driver-side probe -> ADC over the probed cells'
# CODE files only -> shortlist -> exact micro-unit re-rank reading raw
# vectors for the SHORTLIST only (lake_scan_in bloom fetch).
#
# Determinism splice: IVF codebook/probe from the _VIX family
# (centroids = vec_id < 8, integer micro-unit probe), PQ codebooks/
# encode/ADC from q_ann_pq_det (per-subspace subvectors of vec_id <
# 16, left-associated chains, MIN(struct) argmin, ROUND(adc, 6)),
# deletes = the ST11c set (vec_id % 7 == 3, removed from BOTH
# tables), final ranking = the _vix_dot_chain micro-unit dot.  The
# oracle replays every stage off the embeddings table; a wrong code,
# torn delete, shortlist off-by-one, or fetch that missed a bloom
# match flips membership, n_cand, or the value hash.
#
# 100 TB: ADC bytes ∝ codes (d*4/M shrink at rest), raw-vector bytes
# ∝ shortlist bloom matches (inputFiles/bytes gates in
# tests/test_pq_lake.py; SCALING r13a measures the growth law).
# Bounded side effect per invocation (fresh tmp root, atexit-
# reclaimed); exempt from the zero-jobs build gate as a materializing
# round-trip.
# ---------------------------------------------------------------------------
_PQL_SHORT = 32


def _pql_oracle() -> str:
    from pyspec_spark.queries.ml import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBD,
        _pq_dist_sql,
    )

    ctes = [
        f"""cb AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding
  FROM embeddings WHERE vec_id < {_VIX_K}
)""",
        "qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0)",
        f"""assigned AS (
  SELECT e.vec_id,
         (MIN(struct_pack(d := {_vix_sq_chain('e', 'c')}, cid := c.cid))).cid AS cid
  FROM embeddings e, cb c
  GROUP BY e.vec_id
)""",
        f"""probes AS (
  SELECT c.cid, {_vix_probe_chain('c', 'q')} AS dist_micro
  FROM cb c, qv q
)""",
        f"probed AS (SELECT cid FROM probes ORDER BY dist_micro, cid "
        f"LIMIT {_VIX_NPROBE})",
    ]
    for mi in range(_PQ_M):
        lo = mi * _PQ_SUBD
        ctes.append(
            f"""pcb{mi} AS (
  SELECT vec_id AS code,
         CAST(embedding[{lo + 1}:{lo + _PQ_SUBD}] AS DOUBLE[]) AS sub
  FROM embeddings WHERE vec_id < {_PQ_K}
)"""
        )
        ctes.append(
            f"""enc{mi} AS (
  SELECT e.vec_id,
         MIN(struct_pack(d := {_pq_dist_sql('e', 'c.sub', lo)},
                         code := c.code)) AS best
  FROM embeddings e, pcb{mi} c
  GROUP BY e.vec_id
)"""
        )
        ctes.append(
            f"""lut{mi} AS (
  SELECT c.code, {_pq_dist_sql('q', 'c.sub', lo)} AS ld
  FROM pcb{mi} c, qv q
)"""
        )
    ctes.append(
        f"""cand AS (
  SELECT a.vec_id, a.cid
  FROM assigned a
  WHERE a.cid IN (SELECT cid FROM probed)
    AND a.vec_id % {_VDEL_MOD} <> {_VDEL_RESID}
)"""
    )
    adc = " + ".join(f"l{mi}.ld" for mi in range(_PQ_M))
    joins = "\n".join(
        f"JOIN enc{mi} e{mi} ON e{mi}.vec_id = c.vec_id\n"
        f"JOIN lut{mi} l{mi} ON l{mi}.code = (e{mi}.best).code"
        for mi in range(_PQ_M)
    )
    ctes.append(
        f"""adc AS (
  SELECT c.vec_id, c.cid, ROUND({adc}, 6) AS adc_dist
  FROM cand c
  {joins}
)"""
    )
    ctes.append(
        f"short AS (SELECT vec_id, cid FROM adc "
        f"ORDER BY adc_dist, vec_id LIMIT {_PQL_SHORT})"
    )
    return f"""
WITH {','.join(ctes)}
SELECT s.vec_id, s.cid,
       {_vix_dot_chain('e', 'q')} AS dot_micro,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand
FROM short s JOIN embeddings e USING (vec_id), qv q
ORDER BY dot_micro DESC, s.vec_id
LIMIT {_VIX_TOPK}
"""


# One built PQ pair per (session, sf_dir), shared by the single-query
# and batch serves (same fixture by construction — deterministic
# models, deterministic delete; rebuilding it twice per sweep would
# double a ~20 s bounded build for no coverage gain).
_PQL_FIXTURES: dict[tuple[str, str], tuple[str, list]] = {}


def _pql_fixture(spark: SparkSession, sf_dir: str):
    """(root, cb_rows) of the built + ST11c-deleted PQ pair; None root
    on an empty/vec_id-0-less corpus."""
    from pyspec_spark.operators.similarity import pq_codebooks_firstk_df
    from pyspec_spark.queries.ml import _PQ_K, _PQ_M, _PQ_SUBD
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        delete_vectors_pq,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PQL_FIXTURES:
        return _PQL_FIXTURES[key]
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb_rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < _VIX_K).collect()
    )
    if not cb_rows or cb_rows[0][0] != 0:
        _PQL_FIXTURES[key] = (None, cb_rows)
        return _PQL_FIXTURES[key]

    # PQ codebooks: deterministic first-K subvectors (one bounded
    # collect — m * K * subd doubles of index metadata)
    pq_rows = pq_codebooks_firstk_df(
        e, m=_PQ_M, subd=_PQ_SUBD, k=_PQ_K
    ).collect()
    cb = [pq_rows[0][f"cb{mi}"] for mi in range(_PQ_M)]

    # build both tables, then the ST11c maintenance delete on the pair
    root = _tmp_root("pyspec_pql_idx_")
    build_pq_lake(spark, root, e, cb_rows, cb, m=_PQ_M, subd=_PQ_SUBD)
    delete_vectors_pq(
        spark,
        root,
        e.where(F.col("vec_id") % _VDEL_MOD == _VDEL_RESID).select("vec_id"),
    )
    _PQL_FIXTURES[key] = (root, cb_rows)
    return _PQL_FIXTURES[key]


@query("q_ann_lake_pq", oracle=_pql_oracle())
def q_ann_lake_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.streaming.vectors import pq_lookup

    root, cb_rows = _pql_fixture(spark, sf_dir)
    if root is None:
        return spark.createDataFrame(
            [], "vec_id BIGINT, cid INT, dot_micro BIGINT, n_cand BIGINT"
        )

    # IVFADC serve: codes-only ADC shortlist, shortlist-only raw fetch
    return pq_lookup(
        spark,
        root,
        cb_rows[0][1],
        k=_VIX_TOPK,
        nprobe=_VIX_NPROBE,
        shortlist=_PQL_SHORT,
    )


# ---------------------------------------------------------------------------
# L5f — BATCH serving through the PQ lake (r13): the L40i
# batch-retrieval shape for vectors — offline retrieval eval and
# hard-negative mining answer MANY queries against the maintained
# index, and a per-query loop would re-open the same cell files
# |queries| times.  pq_batch_lookup scans the UNION of probed cells
# once, fans candidate rows out via a broadcast (qid, cid) pair
# table, rides per-query ADC LUTs in one broadcast table, shortlists
# per query through a qid-PARTITIONED window (hash-partitioned — the
# banned global funnel has a key here), and fetches the UNION of
# shortlists in one bloom-pruned pass.
#
# The oracle replays every per-query stage grouped by qid — the _PQL
# splice with qid carried through probe ranking, LUTs, candidates,
# shortlist, and the final per-query top-k.  Queries = vec_ids 0..2
# (vec 0 shares the single-query fixture's probe; 1 and 2 probe
# different cell unions, so the fan-out table is exercised).
# ---------------------------------------------------------------------------
_PQLB_NQ, _PQLB_K, _PQLB_SHORT = 3, 5, 16


def _pqlb_oracle() -> str:
    from pyspec_spark.queries.ml import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBD,
        _pq_dist_sql,
    )

    ctes = [
        f"""cb AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding
  FROM embeddings WHERE vec_id < {_VIX_K}
)""",
        f"qv AS (SELECT vec_id AS qid, embedding FROM embeddings "
        f"WHERE vec_id < {_PQLB_NQ})",
        f"""assigned AS (
  SELECT e.vec_id,
         (MIN(struct_pack(d := {_vix_sq_chain('e', 'c')}, cid := c.cid))).cid AS cid
  FROM embeddings e, cb c
  GROUP BY e.vec_id
)""",
        f"""probes AS (
  SELECT q.qid, c.cid, {_vix_probe_chain('c', 'q')} AS dist_micro
  FROM cb c, qv q
)""",
        f"""probed AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist_micro, cid)
             AS rn
    FROM probes
  ) WHERE rn <= {_VIX_NPROBE}
)""",
    ]
    for mi in range(_PQ_M):
        lo = mi * _PQ_SUBD
        ctes.append(
            f"""pcb{mi} AS (
  SELECT vec_id AS code,
         CAST(embedding[{lo + 1}:{lo + _PQ_SUBD}] AS DOUBLE[]) AS sub
  FROM embeddings WHERE vec_id < {_PQ_K}
)"""
        )
        ctes.append(
            f"""enc{mi} AS (
  SELECT e.vec_id,
         MIN(struct_pack(d := {_pq_dist_sql('e', 'c.sub', lo)},
                         code := c.code)) AS best
  FROM embeddings e, pcb{mi} c
  GROUP BY e.vec_id
)"""
        )
        ctes.append(
            f"""lut{mi} AS (
  SELECT q.qid, c.code, {_pq_dist_sql('q', 'c.sub', lo)} AS ld
  FROM pcb{mi} c, qv q
)"""
        )
    ctes.append(
        f"""cand AS (
  SELECT p.qid, a.vec_id, a.cid
  FROM assigned a JOIN probed p ON a.cid = p.cid
  WHERE a.vec_id % {_VDEL_MOD} <> {_VDEL_RESID}
)"""
    )
    ctes.append(
        "nc AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand "
        "FROM cand GROUP BY qid)"
    )
    adc = " + ".join(f"l{mi}.ld" for mi in range(_PQ_M))
    joins = "\n".join(
        f"JOIN enc{mi} e{mi} ON e{mi}.vec_id = c.vec_id\n"
        f"JOIN lut{mi} l{mi} ON l{mi}.qid = c.qid "
        f"AND l{mi}.code = (e{mi}.best).code"
        for mi in range(_PQ_M)
    )
    ctes.append(
        f"""adc AS (
  SELECT c.qid, c.vec_id, c.cid, ROUND({adc}, 6) AS adc_dist
  FROM cand c
  {joins}
)"""
    )
    ctes.append(
        f"""short AS (
  SELECT qid, vec_id, cid FROM (
    SELECT qid, vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id)
             AS rn
    FROM adc
  ) WHERE rn <= {_PQLB_SHORT}
)""",
    )
    ctes.append(
        f"""scored AS (
  SELECT s.qid, s.vec_id, s.cid,
         {_vix_dot_chain('e', 'q')} AS dot_micro
  FROM short s
  JOIN embeddings e USING (vec_id)
  JOIN qv q ON q.qid = s.qid
)"""
    )
    return f"""
WITH {','.join(ctes)}
SELECT qid, vec_id, cid, dot_micro, n_cand FROM (
  SELECT sc.qid, sc.vec_id, sc.cid, sc.dot_micro, nc.n_cand,
         ROW_NUMBER() OVER (PARTITION BY sc.qid
                            ORDER BY sc.dot_micro DESC, sc.vec_id) AS rn
  FROM scored sc JOIN nc USING (qid)
) WHERE rn <= {_PQLB_K}
ORDER BY qid, dot_micro DESC, vec_id
"""


@query("q_ann_lake_pq_batch", oracle=_pqlb_oracle())
def q_ann_lake_pq_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.streaming.vectors import pq_batch_lookup

    root, _cb_rows = _pql_fixture(spark, sf_dir)
    empty = (
        "qid BIGINT, vec_id BIGINT, cid INT, dot_micro BIGINT, "
        "n_cand BIGINT"
    )
    if root is None:
        return spark.createDataFrame([], empty)
    e = table(spark, sf_dir, "embeddings")
    qs = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < _PQLB_NQ)
        .select("vec_id", "embedding")
        .collect()
    )
    return pq_batch_lookup(
        spark, root, qs, k=_PQLB_K, nprobe=_VIX_NPROBE,
        shortlist=_PQLB_SHORT,
    )


# ---------------------------------------------------------------------------
# S3 — SPE binary source under the oracle gate (r8): the WinView frame
# decoder (sources/spe.py), previously unit-only, made driver-checkable
# with the q_avc_ipcm_frames closed-form trick: synthesize a 3-frame
# uint16 SPE file whose pixels are an integer modular pattern, read it
# back through read_spe's binaryFile + mapInPandas path, and aggregate
# per frame — n_px plus v/v·x/v·y integer sums, so a transposed
# reshape, wrong dtype width, off-by-one header offset, or frame-order
# defect flips an exact integer.  The oracle replays the pattern from
# generate-series arithmetic; no golden file, no table dependency.
# ---------------------------------------------------------------------------
_SPE_NF, _SPE_NY, _SPE_NX = 3, 16, 32

_SPE_RT_ORACLE = f"""
WITH f AS (SELECT CAST(unnest(range(0, {_SPE_NF})) AS INT) AS frame_id),
yy AS (SELECT CAST(unnest(range(0, {_SPE_NY})) AS INT) AS y),
xx AS (SELECT CAST(unnest(range(0, {_SPE_NX})) AS INT) AS x)
SELECT f.frame_id,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM((x * 3 + y * 5 + frame_id * 7) % 251) AS BIGINT) AS v_sum,
       CAST(SUM(((x * 3 + y * 5 + frame_id * 7) % 251) * x) AS BIGINT)
         AS vx_sum,
       CAST(SUM(((x * 3 + y * 5 + frame_id * 7) % 251) * y) AS BIGINT)
         AS vy_sum
FROM f, yy, xx
GROUP BY 1
ORDER BY 1
"""


@query("q_spe_roundtrip", oracle=_SPE_RT_ORACLE)
def q_spe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import numpy as np

    from pyspec_spark.sources.spe import encode_spe, read_spe

    fid, yy, xx = np.meshgrid(
        np.arange(_SPE_NF), np.arange(_SPE_NY), np.arange(_SPE_NX),
        indexing="ij",
    )
    frames = ((xx * 3 + yy * 5 + fid * 7) % 251).astype(np.uint16)
    tmp = _tmp_root("pyspec_spe_rt_")
    path = os.path.join(tmp, "roundtrip.spe")
    with open(path, "wb") as fh:
        fh.write(encode_spe(frames, dtype_code=3))
    pts = read_spe(spark, path)
    v = F.col("intensity").cast("long")
    return (
        pts.groupBy("frame_id")
        .agg(
            F.count("*").alias("n_px"),
            F.sum(v).alias("v_sum"),
            F.sum(v * F.col("x")).alias("vx_sum"),
            F.sum(v * F.col("y")).alias("vy_sum"),
        )
        .orderBy("frame_id")
    )


# ---------------------------------------------------------------------------
# S4 — dark-frame role under the oracle gate (r8): the remaining
# unit-only source row.  TWO real SPE files — a 3-frame data pattern
# and a single-frame dark pattern — go through read_spe and the REAL
# operators/images.dark_subtract (the broadcast (y, x) join), then
# aggregate corrected per-frame integer sums.  Oracle replays
# data − dark in closed form; a wrong join alignment, a missed
# broadcast null, or any decode defect in EITHER file flips an exact
# integer.
# ---------------------------------------------------------------------------
_SPE_DK = 11  # dark pattern modulus offset


_SPE_DARK_ORACLE = f"""
WITH f AS (SELECT CAST(unnest(range(0, {_SPE_NF})) AS INT) AS frame_id),
yy AS (SELECT CAST(unnest(range(0, {_SPE_NY})) AS INT) AS y),
xx AS (SELECT CAST(unnest(range(0, {_SPE_NX})) AS INT) AS x)
SELECT f.frame_id,
       CAST(SUM((x * 3 + y * 5 + frame_id * 7) % 251
                - (x * 2 + y * 3 + {_SPE_DK}) % 97) AS BIGINT) AS corr_sum,
       CAST(SUM(CASE WHEN (x * 3 + y * 5 + frame_id * 7) % 251
                          > (x * 2 + y * 3 + {_SPE_DK}) % 97
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
FROM f, yy, xx
GROUP BY 1
ORDER BY 1
"""


@query("q_spe_dark_roundtrip", oracle=_SPE_DARK_ORACLE)
def q_spe_dark_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import numpy as np

    from pyspec_spark.operators.images import dark_subtract
    from pyspec_spark.sources.spe import encode_spe, read_spe

    fid, yy, xx = np.meshgrid(
        np.arange(_SPE_NF), np.arange(_SPE_NY), np.arange(_SPE_NX),
        indexing="ij",
    )
    data = ((xx * 3 + yy * 5 + fid * 7) % 251).astype(np.uint16)
    dyy, dxx = np.meshgrid(
        np.arange(_SPE_NY), np.arange(_SPE_NX), indexing="ij"
    )
    dark = (((dxx * 2 + dyy * 3 + _SPE_DK) % 97).astype(np.uint16))[None]
    tmp = _tmp_root("pyspec_spe_dark_")
    dpath = os.path.join(tmp, "data.spe")
    kpath = os.path.join(tmp, "dark.spe")
    with open(dpath, "wb") as fh:
        fh.write(encode_spe(data, dtype_code=3))
    with open(kpath, "wb") as fh:
        fh.write(encode_spe(dark, dtype_code=3))
    frames = read_spe(spark, dpath)
    corrected = dark_subtract(frames, read_spe(spark, kpath))
    v = F.col("intensity").cast("long")
    return (
        corrected.groupBy("frame_id")
        .agg(
            F.sum(v).alias("corr_sum"),
            F.sum(F.when(v > 0, 1).otherwise(0)).alias("n_pos"),
        )
        .orderBy("frame_id")
    )


# ---------------------------------------------------------------------------
# UD4 — the SPEC UDTF surface under the oracle gate (r8): the SAME scan
# block q_spec_roundtrip writes to disk rides instead as a column of
# one row and lateral-explodes through the registered spec_points UDTF
# — the embedded-blocks plumbing (blocks inside another table) that the
# file DataSource cannot serve.  The oracle is spliced verbatim from
# q_spec_roundtrip's registration, so the two declarations can never
# drift; a parser or UDTF-plumbing defect flips the shared value hash.
# Exempt from the zero-jobs gate (the fixture collect, as for S1b).
# ---------------------------------------------------------------------------
def _spec_udtf_oracle() -> str:
    from pyspec_spark.registry import ORACLES

    return ORACLES["q_spec_roundtrip"]


@query("q_spec_udtf_roundtrip", oracle=_spec_udtf_oracle())
def q_spec_udtf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.sources.spec_udtf import register_spec_udtf

    rows = _spec_fixture_rows(spark, sf_dir)
    # the scan block only (no #F file preamble): the UDTF contract is
    # one block per input row, starting at #S
    block = "\n".join(_spec_fixture_lines(rows)[5:])
    register_spec_udtf(spark)
    blocks = spark.createDataFrame([(block,)], "block_text STRING")
    blocks.createOrReplaceTempView("_spec_udtf_blocks")
    pts = spark.sql(
        "SELECT s.* FROM _spec_udtf_blocks, LATERAL spec_points(block_text) s"
    )
    return pts.select(
        F.col("values")["doc_id"].alias("doc_id_v"),
        F.col("values")["n_chars"].alias("n_chars_v"),
    ).orderBy("doc_id_v")


# ---------------------------------------------------------------------------
# ST4 — watermark / late-data policy under the oracle gate (r8): the
# last unit-only streaming row.  Four parquet chunks with CLOSED-FORM
# timestamps replay as a real file-source stream (mtime-ordered,
# maxFilesPerTrigger=1, the test_watermark_drops_late_data technique):
# batch 0 = the on-time cohort (hours 0..5 at :30), batch 1 = a 7:30
# spacer, batch 2 = the late cohort at :45, batch 3 = a trailing 9:00
# spacer.  The 89-minute watermark puts every comparison strictly off
# window boundaries, and the oracle pins the EXACT observed engine
# semantics (verified against StreamingQueryProgress): the filter
# watermark lags max-event-time by one batch — during the late batch it
# is 4:01 (from batch 0's 5:30 max; batch 1's 7:30 has not propagated
# yet) — so late rows for hours 0..3 (window end <= 4:01) DROP while
# hours 4..5 (ends 5:00/6:00 > 4:01) are ACCEPTED; append output then
# flushes hours 0..3 during batch 1 (wm 4:01) and hours 4..5 during
# batch 3 (wm 6:01), and every window >= hour 6 stays withheld (final
# wm 7:31 < their ends).  Both the drop AND the accept cohort are
# value-visible, so a shifted watermark, a wrong lag, or a broken
# append horizon all flip the hash.  Closed-form generate-series
# oracle — no golden, no table dependency, no boundary ties.
# ---------------------------------------------------------------------------
_LATE_N0 = 100  # on-time rows: i in 0..99, hour = i % 6, minute :30
_LATE_N2 = 12   # late rows: j in 0..11, hour = j % 6, minute :45


_LATE_ORACLE = f"""
WITH i AS (SELECT CAST(unnest(range(0, {_LATE_N0})) AS BIGINT) AS i),
ontime AS (SELECT i % 6 AS h, CAST(i AS DOUBLE) AS v FROM i),
j AS (SELECT CAST(unnest(range(0, {_LATE_N2})) AS BIGINT) AS j),
-- accepted late rows: window end (h+1):00 > the 4:01 lagged watermark
late AS (SELECT j % 6 AS h, 1000.0 AS v FROM j WHERE j % 6 >= 4),
allr AS (SELECT * FROM ontime UNION ALL SELECT * FROM late)
SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (h) HOUR AS bucket,
       'view' AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM allr
GROUP BY h
ORDER BY bucket
"""


@query("q_stream_late_drop", oracle=_LATE_ORACLE)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid as _uuid

    import pandas as pd

    import pyspec_spark.streaming.events as se

    base = _tmp_root("pyspec_late_src_")
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    b0 = [
        (i, t0 + pd.Timedelta(hours=i % 6, minutes=30), 1, "view",
         float(i), "{}")
        for i in range(_LATE_N0)
    ]
    # spacer: advances max event time to 7:30 -> watermark 6:01 commits
    b1 = [(500, t0 + pd.Timedelta(hours=7, minutes=30), 1, "view", 1.0, "{}")]
    # late cohort: hours 0..5 at :45 — every window already finalized
    b2 = [
        (600 + j, t0 + pd.Timedelta(hours=j % 6, minutes=45), 1, "view",
         1000.0, "{}")
        for j in range(_LATE_N2)
    ]
    # trailing spacer: emission lags one batch exactly like filtering —
    # hours 4..5 finalize at the 6:01 watermark committed after b1, but
    # only a SUBSEQUENT batch flushes them to append output
    b3 = [(700, t0 + pd.Timedelta(hours=9), 1, "view", 1.0, "{}")]
    kw = dict(
        index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    for k, rows in enumerate((b0, b1, b2, b3)):
        f = os.path.join(base, f"b{k}.parquet")
        pd.DataFrame(rows, columns=cols).to_parquet(f, **kw)
        os.utime(f, (1_000_000_000 + 100 * k,) * 2)

    stream = se.read_event_stream(spark, base, max_files_per_trigger=1)
    name = f"t_late_drop_{_uuid.uuid4().hex[:10]}"
    se.run_to_memory(
        se.tumbling(stream, watermark="89 minutes"), name, "append"
    )
    return spark.table(name).orderBy("bucket")


# ---------------------------------------------------------------------------
# Lake schema evolution under the oracle gate (r11): the column-id
# mapping lifecycle — build a lake table from orders (int cents
# column), RENAME cents -> amount_cents (metadata-only: zero data files
# rewritten, pinned in test_lake.py), widen-RETYPE int -> bigint
# (read-time cast of the old era), append a NEW-era delta under the
# new logical name and type, and read the final table back.  The
# oracle computes the same per-priority aggregate straight from
# orders: any era projection bug (wrong cast, wrong physical->logical
# aliasing, dropped era, double-read) flips counts or sums.  Rounding
# before the int cast is deliberate — double*100 of a 2-dp price is
# not integral, and Spark truncates where DuckDB rounds; ROUND makes
# both engines land on the same integer.  CDC-across-rename and
# time-travel-era-correctness are pytest-pinned (test_lake.py) — a
# single-result oracle cannot show two versions at once.  Bounded
# side effect (fresh tmp root); zero-jobs-gate exempt (the lake
# commits ARE execution).
# ---------------------------------------------------------------------------
@query(
    "q_lake_evolution",
    oracle="""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_lake_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.lake import (
        lake_append,
        lake_read,
        lake_rename_column,
        lake_retype_column,
    )

    o = table(spark, sf_dir, "orders")
    base = o.where("o_orderkey % 4 <> 3").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100)
        .cast("int")
        .alias("cents"),
        F.col("o_orderpriority").alias("priority"),
    )
    root = _tmp_root("pyspec_lake_evo_")
    lake_append(spark, root, base, partition_col="priority")
    lake_rename_column(root, "cents", "amount_cents")
    lake_retype_column(root, "amount_cents", "bigint")
    delta = o.where("o_orderkey % 4 = 3").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("amount_cents"),
        F.col("o_orderpriority").alias("priority"),
    )
    lake_append(spark, root, delta, partition_col="priority")
    try:
        back = lake_read(spark, root)
    except ValueError:
        # a zero-row source commits zero data files (the lake's
        # empty-version signal) — the evolution round-trip of nothing
        # is nothing, typed to match the oracle
        return spark.createDataFrame(
            [],
            "priority STRING, n BIGINT, sum_cents BIGINT, "
            "min_cents BIGINT, max_cents BIGINT",
        )
    return (
        back.groupBy("priority")
        .agg(
            F.count("*").alias("n"),
            F.sum("amount_cents").alias("sum_cents"),
            F.min("amount_cents").alias("min_cents"),
            F.max("amount_cents").alias("max_cents"),
        )
        .orderBy("priority")
    )
