"""Streaming vector-index ingestion (SURVEY.md §2 ST11, r7).

The production shape of "keep the ANN index fresh": embedding batches
land continuously (new crawl shards get embedded upstream), and each
micro-batch is assigned to its nearest frozen IVF centroid and appended
to a CELL-PARTITIONED snapshot lake.  Queries then probe only the
nprobe nearest cells — the manifest's per-file stats prune every other
cell's files before Spark opens anything, so lookup cost scales with
the probed fraction, not the corpus.

Design choices, and why they hold at 100 TB:

- **Frozen centroids.** The k x d centroid table is trained offline
  (q_kmeans2 / the IVF training sample) and treated as immutable index
  metadata — the standard IVF contract (FAISS-style): assignment drift
  from a moving codebook would silently invalidate every previously
  written cell.  Re-training = build a NEW index root, swap atomically.
  The table is tiny (k*d doubles), broadcast per batch, and persisted
  next to the manifest so the lookup path shares the exact same cells.
- **Exactly-once via the manifest watermark.** Appends go through
  lake_append_stream: the committed manifest carries
  stream_commits[query_name] = batch_id, so a restarted stream (or a
  racing replica) can never double-ingest a batch — the same guarantee
  the curation lake uses, re-verified here by the kill-and-restart
  test.
- **Map-only assignment.** Each batch crossJoins the broadcast
  centroid table and takes MIN(struct(dist, cid)) per vector: no
  shuffle of the batch beyond the per-vector argmin aggregation, no
  state operator — the index IS the lake layout.
- **Cell-pruned lookup.** ivf_lookup ranks centroids driver-side
  (numpy over index metadata, not a Spark job), then scans only the
  nprobe winning cells via lake_scan's stats pruning (each cell file
  has cid min == max == cid) and re-ranks by exact cosine.  nprobe = k
  degrades gracefully to brute force over the whole lake.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CENTROIDS_FILE = "centroids.json"


def _sqdist(e_col, c_col):
    """JVM squared L2 distance of two array columns."""
    return F.aggregate(
        F.zip_with(
            e_col,
            c_col,
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(batch: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment, fully MAP-SIDE: the codebook is
    bounded by construction (k x d), so it is folded into the plan as
    literals and the per-vector argmin is array_min over k
    (dist, cid) structs — deterministic cid tiebreak, zero shuffle of
    the batch (the crossJoin+groupBy form would shuffle every batch on
    vec_id; for a k too large to inline, that broadcast-join form is
    the fallback).  Returns (vec_id, embedding, cid)."""
    rows = sorted(
        ((r["cid"], [float(x) for x in r["c"]]) for r in cents.collect())
    )
    structs = []
    for cid, c in rows:
        clit = F.array(*[F.lit(x) for x in c])
        structs.append(
            F.struct(
                _sqdist(F.col("embedding"), clit).alias("dist"),
                F.lit(int(cid)).alias("cid"),
            )
        )
    best = F.array_min(F.array(*structs))
    return batch.select(
        "vec_id", "embedding", best.getField("cid").alias("cid")
    )


def save_centroids(root: str, cents: DataFrame) -> None:
    """Persist the frozen codebook next to the manifests (index
    metadata — k x d doubles, bounded by construction)."""
    rows = sorted(
        ((r["cid"], [float(x) for x in r["c"]]) for r in cents.collect())
    )
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, _CENTROIDS_FILE), "w") as f:
        json.dump({"cids": [c for c, _ in rows], "c": [v for _, v in rows]}, f)


def load_centroids(root: str) -> tuple[list[int], np.ndarray]:
    with open(os.path.join(root, _CENTROIDS_FILE)) as f:
        d = json.load(f)
    return d["cids"], np.asarray(d["c"], dtype=np.float64)


def index_to_lake(
    stream: DataFrame,
    spark: SparkSession,
    root: str,
    cents: DataFrame,
    checkpoint: str | None = None,
    query_name: str = "vec_index",
) -> None:
    """Ingest an embedding stream into a cid-partitioned snapshot lake,
    exactly once per batch (manifest watermark).  Blocks until the
    availableNow trigger drains."""
    from pyspec_spark.lake import lake_append_stream

    save_centroids(root, cents)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        assigned = assign_cells(batch_df, cents)
        lake_append_stream(
            spark, root, assigned, "cid", query_name, batch_id
        )

    writer = stream.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def ivf_lookup(
    spark: SparkSession,
    root: str,
    query_vec,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k by exact cosine over the nprobe cells nearest the query.
    Centroid ranking runs driver-side on index metadata (k x d — not a
    Spark job); only the probed cells' files are opened (manifest
    stats pruning on cid)."""
    from pyspec_spark.lake import lake_scan

    cids, C = load_centroids(root)
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((C - q) ** 2).sum(axis=1), kind="stable")
    probe = [cids[i] for i in order[: max(1, nprobe)]]

    parts = [lake_scan(spark, root, [("cid", "=", cid)]) for cid in probe]
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)

    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), qlit, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(
                F.col("embedding"), lambda a: a.cast("double") * a.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qn = float(np.sqrt(q @ q))
    return (
        cand.select(
            "vec_id", "cid", (dot / (nrm * F.lit(qn))).alias("score")
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )
