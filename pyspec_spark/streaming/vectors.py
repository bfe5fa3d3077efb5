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
- **Map-only assignment.** The codebook is collected once per stream
  and folded into each batch's plan as literals; the per-vector argmin
  is array_min over k (dist, cid) structs — zero shuffle per batch, no
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


def _codebook_rows(cents) -> list[tuple[int, list[float]]]:
    """Normalize a codebook to a sorted [(cid, vector)] list.  Accepts
    either a (cid, c) DataFrame (collected ONCE — callers on a hot path
    should do this themselves and pass the list) or an already-collected
    list."""
    if isinstance(cents, list):
        return sorted((int(c), [float(x) for x in v]) for c, v in cents)
    return sorted(
        (int(r["cid"]), [float(x) for x in r["c"]]) for r in cents.collect()
    )


# Above this k the literal-inlined plan gets expensive to ANALYZE (k*d
# expression nodes per batch); the broadcast-row form costs one tiny
# broadcast instead and keeps the plan O(1) in k.  Both are map-side.
# Measured (SCALING.md r8c, 20k x 64-dim batch, local[32], build+run):
# inline 2.1/20.9/91.1 s at k=8/256/1024 vs broadcast 1.1/2.4/8.5 s —
# the expression-tree analysis dominates well before k=64, so the
# threshold stays at the tiny-codebook end where the two are within
# noise and the inline plan is simplest to gate.
_INLINE_MAX_K = 8


def assign_cells(
    batch: DataFrame,
    cents,
    inline_max_k: int | None = None,
    keep_cols: tuple = (),
) -> DataFrame:
    """Nearest-centroid assignment, fully MAP-SIDE, two plan shapes:

    - k <= inline_max_k (default 8): the codebook folds into the plan
      as literals; per-vector argmin = array_min over k (dist, cid)
      structs — zero shuffle, zero join.
    - k > inline_max_k (r8): the codebook aggregates into ONE row
      holding an array<struct<cid, c>> which broadcast-crossJoins onto
      the batch; the argmin is array_min over a transform of that
      array.  Still ZERO shuffle of the batch (a 1-row broadcast is a
      metadata-sized exchange) and the plan stays O(1) in k — the
      shuffling crossJoin+groupBy form the r7 docstring named as the
      fallback is never needed.

    Both shapes use the identical (dist, cid) lexicographic argmin
    (deterministic lowest-cid tiebreak) and are equality-tested against
    each other.  ``cents`` is a (cid, c) DataFrame or a pre-collected
    [(cid, vector)] list.  Returns (vec_id, embedding, cid[, *keep]) —
    ``keep_cols`` (r12) rides metadata columns (labels, timestamps)
    through the assignment so a labeled ingest can cluster its cells
    at rest (the L5d second key)."""
    rows = _codebook_rows(cents)
    keep = list(keep_cols)
    limit = _INLINE_MAX_K if inline_max_k is None else inline_max_k
    if len(rows) <= limit:
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
            "vec_id", "embedding", best.getField("cid").alias("cid"), *keep
        )
    spark = batch.sparkSession
    cb = spark.createDataFrame(
        [(rows,)], "cb ARRAY<STRUCT<cid: INT, c: ARRAY<DOUBLE>>>"
    )
    best = F.array_min(
        F.transform(
            F.col("cb"),
            lambda s: F.struct(
                _sqdist(F.col("embedding"), s.getField("c")).alias("dist"),
                s.getField("cid").alias("cid"),
            ),
        )
    )
    return batch.crossJoin(F.broadcast(cb)).select(
        "vec_id", "embedding", best.getField("cid").alias("cid"), *keep
    )


def save_centroids(root: str, cents) -> None:
    """Persist the frozen codebook next to the manifests (index
    metadata — k x d doubles, bounded by construction).  WRITE-ONCE:
    the frozen-codebook contract (module docstring) is enforced here —
    a restart passing a DIFFERENT codebook for the same root raises
    instead of silently stranding every already-written cell under a
    stale layout; re-training means a new index root."""
    rows = _codebook_rows(cents)
    payload = {"cids": [c for c, _ in rows], "c": [v for _, v in rows]}
    path = os.path.join(root, _CENTROIDS_FILE)
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        if existing != payload:
            raise ValueError(
                f"index root {root} was built with a different codebook; "
                "re-training requires a NEW index root (frozen-centroid "
                "contract)"
            )
        return
    os.makedirs(root, exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)


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
    cluster_col: str | None = None,
) -> None:
    """Ingest an embedding stream into a cid-partitioned snapshot lake,
    exactly once per batch (manifest watermark).  Blocks until the
    availableNow trigger drains.

    ``cluster_col`` (r12, the L5d streaming face): a metadata column
    of the stream (labels, languages) rides through the assignment
    (assign_cells keep_cols) and the lake splits each cell's files one
    per value, so filtered lookups against the STREAMED index prune at
    the file level exactly like the batch-built one."""
    from pyspec_spark.lake import lake_append_stream

    codebook = _codebook_rows(cents)  # ONE collect, reused every batch
    save_centroids(root, codebook)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        assigned = assign_cells(
            batch_df, codebook,
            keep_cols=(cluster_col,) if cluster_col else (),
        )
        lake_append_stream(
            spark, root, assigned, "cid", query_name, batch_id,
            cluster_col=cluster_col,
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
    where: list | None = None,
) -> DataFrame:
    """Top-k by exact cosine over the nprobe cells nearest the query.
    Centroid ranking runs driver-side on index metadata (k x d — not a
    Spark job); only the probed cells' files are opened (manifest
    stats pruning on cid).

    ``where`` (r12, L5d) is a list of lake_scan predicates composed
    with the cell probe — PRE-filtering semantics: the predicate
    restricts the candidate set BEFORE the top-k, so a selective
    filter still returns k true matches (post-filtering a vector top-k
    under-returns, the classic filtered-ANN wrong answer).  When the
    lake was built with ``cluster_col`` on the filter column, the
    predicate prunes at the FILE level inside each probed cell (one
    file per (cid, value) — footer stats are points), so a filtered
    lookup opens only the matching slice of the probed cells."""
    from pyspec_spark.lake import lake_scan, latest_version

    cids, C = load_centroids(root)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(q @ q))
    if qn == 0.0:
        raise ValueError("zero query vector has no nearest neighbors")
    order = np.argsort(((C - q) ** 2).sum(axis=1), kind="stable")
    probe = [cids[i] for i in order[: max(1, nprobe)]]

    # resolve the snapshot ONCE: per-cell scans each re-reading
    # latest_version would tear across a concurrent commit (cell A at
    # v, cell B at v+1 — a mixed-snapshot top-k)
    v = latest_version(root)
    parts = [
        lake_scan(
            spark, root,
            [("cid", "=", cid)] + list(where or []),
            version=v,
        )
        for cid in probe
    ]
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
    # zero-norm stored vectors score NaN through the division, and
    # Spark sorts NaN ABOVE every double — pin them to -inf instead so
    # they can never top a lookup
    score = F.when(
        nrm > 0, dot / (nrm * F.lit(qn))
    ).otherwise(F.lit(float("-inf")))
    return (
        cand.select("vec_id", "cid", score.alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )


def delete_vectors(
    spark: SparkSession,
    root: str,
    vec_ids: DataFrame,
) -> int:
    """Remove vectors from a built IVF index (r10 — the curation-
    deletion symmetry: the engine's own pipeline drops documents
    (dedup losers, quality fails, split repair), and their embeddings
    must leave the index too, without a retrain).

    Copy-on-write via lake_delete, the opposite design from the term
    index's merge-on-read tombstones (operators/text.py) — and the
    right one HERE: a cell file is a flat row set re-rankable by any
    reader, so rewriting the touched cells keeps ivf_lookup entirely
    filter-free (no per-row tombstone join on the query path, which
    serves online lookups), while the term index's value-encoded
    posting shards make rewrite expensive and probe-time filtering
    cheap.  Cost scales with the TOUCHED cells only: lake_delete
    semi-joins the ids to find affected cids, carries every other
    cell's files by reference, and rewrites just the survivors.

    The pre-delete snapshot stays readable (lake version pinning)
    until lake_vacuum — the audit-trail window a right-to-be-forgotten
    pipeline wants, with vacuum as the actual forget step.  The frozen
    codebook is untouched: deletion never moves a centroid, so all
    remaining assignments stay valid (cells may thin out; re-balance
    is reindex + publish, the existing lifecycle).  Returns the new
    snapshot version."""
    from pyspec_spark.lake import lake_delete

    return lake_delete(
        spark, root, vec_ids.select("vec_id"), key="vec_id",
        partition_col="cid", bloom_cols=["vec_id"],
    )


# ---------------------------------------------------------------------------
# Re-train + atomic swap (r8) — the other half of the frozen-codebook
# contract the module docstring prescribes: assignment drift from a
# moving codebook silently invalidates every written cell, so
# re-training builds a NEW index root and PUBLISHES it atomically.
# ---------------------------------------------------------------------------
_POINTER_FILE = "CURRENT"


_HISTORY_FILE = "HISTORY"


def publish_index(base: str, root: str) -> None:
    """Atomically point base/CURRENT at a built index root (write-tmp +
    os.replace — one rename syscall, so a concurrent reader sees either
    the old root or the new one, never a partial pointer).  The root
    must already hold a codebook and at least one committed version.

    Each publish is also appended to base/HISTORY (after the pointer
    swap — CURRENT stays authoritative if the append is lost to a
    crash), giving vacuum_indexes an ordered record of superseded
    roots to reclaim."""
    import uuid as _uuid

    if not os.path.exists(os.path.join(root, _CENTROIDS_FILE)):
        raise ValueError(f"{root} has no codebook — build before publish")
    os.makedirs(base, exist_ok=True)
    tmp = os.path.join(base, f".tmp-{_uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(os.path.abspath(root))
    os.replace(tmp, os.path.join(base, _POINTER_FILE))
    with open(os.path.join(base, _HISTORY_FILE), "a") as f:
        f.write(os.path.abspath(root) + "\n")


def current_index(base: str) -> str:
    """Resolve the published index root."""
    with open(os.path.join(base, _POINTER_FILE)) as f:
        return f.read().strip()


def reindex(
    spark: SparkSession,
    old_root: str,
    new_root: str,
    new_cents,
) -> int:
    """Rebuild an index under a NEW codebook: batch-read the old lake's
    current snapshot, re-assign every vector map-side against the new
    frozen centroids, and commit the cid-partitioned layout into
    ``new_root`` (one lake version).  Returns the committed version.
    The caller publishes with publish_index when ready — readers of the
    old root are never disturbed (separate manifests, separate files).

    100 TB posture: ONE scan of the stored vectors + the partitioned
    write — the same cost as the original ingest; assignment stays
    map-side (broadcast-row codebook above the inline threshold)."""
    from pyspec_spark.lake import lake_append, lake_read

    codebook = _codebook_rows(new_cents)
    save_centroids(new_root, codebook)
    vecs = lake_read(spark, old_root).select("vec_id", "embedding")
    assigned = assign_cells(vecs, codebook)
    return lake_append(spark, new_root, assigned, partition_col="cid")


def index_history(base: str) -> list[str]:
    """Ordered distinct publish history (oldest first, last occurrence
    wins the position — re-publishing an old root moves it to newest)."""
    path = os.path.join(base, _HISTORY_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        raw = [ln.strip() for ln in f if ln.strip()]
    out: list[str] = []
    for r in raw:
        if r in out:
            out.remove(r)
        out.append(r)
    return out


def vacuum_indexes(
    base: str, keep: int = 1, retention_seconds: float = 3600.0
) -> list[str]:
    """Index-lifecycle GC (r9 — the other end of reindex + atomic
    publish, which otherwise accumulates old roots forever).  Deletes:

    - **superseded roots**: publish-history entries older than the
      newest ``keep`` — committed history, reclaimed regardless of age
      (the lake_vacuum expired-manifest rule).  The CURRENT root is
      never deleted, whatever ``keep`` says.
    - **orphan roots**: directories under ``base/`` that hold a
      codebook but were never published — but only when older than
      ``retention_seconds``: a root a CONCURRENT rebuild is still
      writing looks identical to an abort-orphan, and deleting it
      would break the builder's upcoming publish (the same
      vacuum-retention discipline as lake_vacuum's staged-file rule).

    Readers that re-resolve base/CURRENT per query are never affected;
    a reader still holding a superseded root's path fails LOUDLY on
    its next scan (missing files), never silently — the retention
    contract is that readers re-resolve at least every
    ``retention_seconds``.  Rewrites HISTORY to the kept entries and
    returns the deleted root paths."""
    import shutil
    import time

    try:
        current = os.path.abspath(current_index(base))
    except FileNotFoundError:
        current = None
    hist = index_history(base)
    keep_roots = set(hist[-max(keep, 1):])
    if current:
        keep_roots.add(current)
    removed: list[str] = []
    for r in hist:
        if r not in keep_roots and os.path.isdir(r):
            shutil.rmtree(r, ignore_errors=True)
            removed.append(r)
    # orphans under base: codebook-bearing dirs never published
    now = time.time()
    known = set(hist) | keep_roots
    for name in sorted(os.listdir(base)):
        p = os.path.abspath(os.path.join(base, name))
        if not os.path.isdir(p) or p in known:
            continue
        if not os.path.exists(os.path.join(p, _CENTROIDS_FILE)):
            continue  # not an index root — never touch
        try:
            if now - os.path.getmtime(p) < retention_seconds:
                continue  # possibly an in-flight rebuild
        except OSError:
            continue
        shutil.rmtree(p, ignore_errors=True)
        removed.append(p)
    kept = [r for r in hist if r in keep_roots]
    with open(os.path.join(base, _HISTORY_FILE), "w") as f:
        f.writelines(r + "\n" for r in kept)
    return removed
