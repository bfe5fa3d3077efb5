"""Delete propagation across maintained artifacts — the
right-to-be-forgotten coordinator (L48, r13).

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — north-star: a training-data platform derives MANY artifacts from
one corpus (the snapshot lake itself, the maintained term index, the
IVF/PQ vector lake), and a deletion request is only honored when it
reaches EVERY one of them.  Each artifact already owns a delete face
with the right per-artifact mechanics:

- corpus lake: ``lake_delete`` — copy-on-write snapshot commit,
  touched partitions rewritten, history readable until vacuum;
- term index: ``delete_term_index`` — merge-on-read tombstones
  (rewrite is expensive for value-encoded postings; probe-time
  filtering is cheap), retired by ``compact_maintained_index``;
- vector lake: ``delete_vectors`` / ``delete_vectors_pq`` —
  copy-on-write cell rewrites (a lookup path must stay filter-free),
  the PQ pair deleting codes and raw vectors in lockstep.

This module adds the two missing pieces: ONE call that fans a doc-id
set out to every artifact (partial failure surfaces loudly — the
report says exactly which artifacts committed which versions), and an
independent VERIFICATION face that re-reads every artifact's CURRENT
state through its own read path and counts surviving references —
the auditor's query, not the deleter's claim.

Forget semantics are two-phase by design: ``forget_documents`` makes
the docs unreachable from every CURRENT read path (the serving
guarantee); hard erasure of historical bytes is the existing
per-artifact vacuum/compact lifecycle (``lake_vacuum``,
``compact_maintained_index``, ``vacuum_indexes``) — the audit-trail
window a regulated deployment wants, with vacuum as the actual
forget step.

Scale posture: every per-artifact step keeps that artifact's own
posture (semi-join partition discovery, touched-cell rewrites,
tombstone appends); the coordinator adds one persisted pass over the
doc-id set and NO corpus-sized work of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def forget_documents(
    spark: SparkSession,
    doc_ids: DataFrame,
    *,
    corpus_root: str | None = None,
    corpus_key: str = "doc_id",
    corpus_partition_col: str = "source",
    term_index_path: str | None = None,
    vector_root: str | None = None,
    vector_pq: bool = False,
    vec_id_map: DataFrame | None = None,
) -> dict:
    """Propagate a deletion request to every maintained artifact.

    ``doc_ids`` needs a ``doc_id`` column.  Pass the artifacts the
    deployment actually maintains; omitted ones are reported as
    ``skipped`` so an auditor can see the coverage of the request.
    ``vec_id_map`` maps doc_id -> vec_id when embeddings are keyed
    separately from documents (default: vec_id == doc_id).

    Returns a report dict: per artifact, the action taken and the
    committed version (lakes) or tombstone count (term index).
    """
    ids = doc_ids.select(F.col("doc_id").cast("long")).distinct().persist()
    try:
        n_ids = ids.count()
        report: dict = {"n_doc_ids": n_ids}

        if corpus_root is not None:
            from pyspec_spark.lake import lake_delete

            v = lake_delete(
                spark,
                corpus_root,
                ids.select(F.col("doc_id").alias(corpus_key)),
                key=corpus_key,
                partition_col=corpus_partition_col,
            )
            report["corpus"] = {"action": "cow_delete", "version": v}
        else:
            report["corpus"] = {"action": "skipped"}

        if term_index_path is not None:
            from pyspec_spark.operators.text import delete_term_index

            delete_term_index(ids, term_index_path)
            report["term_index"] = {
                "action": "tombstoned",
                "n_tombstoned": n_ids,
            }
        else:
            report["term_index"] = {"action": "skipped"}

        if vector_root is not None:
            vec_ids = (
                vec_id_map.join(ids, "doc_id").select("vec_id")
                if vec_id_map is not None
                else ids.select(F.col("doc_id").alias("vec_id"))
            )
            if vector_pq:
                from pyspec_spark.streaming.vectors import delete_vectors_pq

                vv = delete_vectors_pq(spark, vector_root, vec_ids)
            else:
                from pyspec_spark.streaming.vectors import delete_vectors

                vv = delete_vectors(spark, vector_root, vec_ids)
            report["vector_lake"] = {
                "action": "cow_delete_pq" if vector_pq else "cow_delete",
                "version": vv,
            }
        else:
            report["vector_lake"] = {"action": "skipped"}

        return report
    finally:
        ids.unpersist()


def surviving_references(
    spark: SparkSession,
    doc_ids: DataFrame,
    *,
    corpus_root: str | None = None,
    corpus_key: str = "doc_id",
    term_index_path: str | None = None,
    term_index_shard_size: int | None = None,
    vector_root: str | None = None,
    vector_pq: bool = False,
    vec_id_map: DataFrame | None = None,
) -> dict:
    """The auditor's query: re-read every artifact's CURRENT state
    through its own read face and count the DISTINCT requested ids
    still reachable there (the PQ pair counts each id once per member
    table, so a torn pair shows up as an odd count).  All-zero = the
    forget request is
    honored at serving time (historical snapshots remain until the
    vacuum lifecycle, by design).

    The term index check decodes the stored postings and applies the
    tombstone anti-join — the exact filter the maintained serve path
    uses — so a tombstone that failed to land is CAUGHT here, not
    assumed.  ``term_index_shard_size`` must match the build.
    """
    ids = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    report: dict = {}

    if corpus_root is not None:
        from pyspec_spark.lake import lake_read

        cur = lake_read(spark, corpus_root)
        report["corpus"] = (
            cur.select(F.col(corpus_key).alias("doc_id"))
            .join(ids, "doc_id", "left_semi")
            .count()
        )

    if term_index_path is not None:
        from pyspec_spark.operators.text import (
            apply_tombstones,
            decode_postings,
            read_tombstones,
        )

        idx = spark.read.parquet(term_index_path)
        decoded = decode_postings(
            idx, shard_size=term_index_shard_size
        )
        live = apply_tombstones(
            decoded, read_tombstones(spark, term_index_path)
        )
        report["term_index"] = (
            live.select("doc_id")
            .distinct()
            .join(ids, "doc_id", "left_semi")
            .count()
        )

    if vector_root is not None:
        from pyspec_spark.lake import lake_read

        vec_ids = (
            vec_id_map.join(ids, "doc_id").select("vec_id")
            if vec_id_map is not None
            else ids.select(F.col("doc_id").alias("vec_id"))
        )
        if vector_pq:
            from pyspec_spark.streaming.vectors import (
                _CODES_DIR,
                _VECS_DIR,
            )

            roots = [
                f"{vector_root}/{_CODES_DIR}",
                f"{vector_root}/{_VECS_DIR}",
            ]
        else:
            roots = [vector_root]
        total = 0
        for r in roots:
            total += (
                lake_read(spark, r)
                .select("vec_id")
                .distinct()
                .join(vec_ids, "vec_id", "left_semi")
                .count()
            )
        report["vector_lake"] = total

    return report
