#!/usr/bin/env python
"""Weak-scaling probe for the round-6b additions.

- q_ppl_gate: salted document replicas (build_neardup_replica) — LM
  model tables grow with the ×k vocabulary bijection, scoring stream
  grows ×k, the NTILE(3) per-lang window sorts ×k rows.
- q_mmr_rerank: offset-vec_id embedding replicas — the corpus-sized
  shortlist scan grows ×k while the greedy stays a constant 20-row
  applyInPandas group (the wall should flatten toward scan cost).
- snapshot lake: commit/read/upsert wall vs file count and version
  count — planning from one manifest JSON must stay flat while
  directory listing grows with files.

Prints SCALING.md-ready markdown lines.  noop sink = full
re-execution, warm best-of-3, local[32].
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import SRC, WORK, _best_of, build_neardup_replica  # noqa: E402
from tools.scale_probe_r5b import build_embed_replica  # noqa: E402

from pyspec_spark import registry  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402


def probe_queries(spark, ks) -> None:
    print("| k | docs | q_ppl_gate |")
    print("|---|---|---|")
    for k in ks:
        d = build_neardup_replica(spark, k)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        fn = registry.QUERIES["q_ppl_gate"]
        t = _best_of(
            lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
        )
        print(f"| {k} | {n:,} | {t * 1000:.0f} ms |")
    print("| k | vecs | q_mmr_rerank |")
    print("|---|---|---|")
    for k in ks:
        d = build_embed_replica(spark, k)
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        fn = registry.QUERIES["q_mmr_rerank"]
        t = _best_of(
            lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
        )
        print(f"| {k} | {n:,} | {t * 1000:.0f} ms |")


def probe_lake(spark) -> None:
    """Lake metadata scaling: read-planning and append-commit wall as
    versions (and with them live files) accumulate."""
    from pyspark.sql import functions as F

    from pyspec_spark.lake import lake_append, lake_read, lake_upsert

    root = os.path.join(WORK, "lake_probe")
    shutil.rmtree(root, ignore_errors=True)
    docs = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .select("doc_id", "text", (F.col("doc_id") % 16).alias("part"))
    )
    docs.persist().count()
    print("| commits | live files | append wall | read (count) wall |")
    print("|---|---|---|---|")
    marks = {1, 4, 16, 64}
    n_files = 0
    for c in range(1, 65):
        t = time.time()
        lake_append(spark, root, docs.limit(2000), "part")
        t_append = time.time() - t
        if c in marks:
            from pyspec_spark.lake import _load_manifest, latest_version

            n_files = len(
                _load_manifest(root, latest_version(root))["files"]
            )
            t_read = _best_of(lambda: lake_read(spark, root).count(), n=3)
            print(
                f"| {c} | {n_files} | {t_append * 1000:.0f} ms "
                f"| {t_read * 1000:.0f} ms |"
            )
    # partition-pruned upsert at the 64-commit state: touch 1 of 16
    upd = docs.where(F.col("part") == 3).limit(500)
    t = time.time()
    lake_upsert(spark, root, upd, "doc_id", "part")
    print(
        f"| upsert(1/16 partitions) at 64 commits | {n_files} files "
        f"| {(time.time() - t) * 1000:.0f} ms | |"
    )
    docs.unpersist()


def main() -> None:
    spark = get_spark("scale_probe_r6b")
    registry.load_all()
    ks = [1, 2, 4, 8]
    probe_queries(spark, ks)
    probe_lake(spark)


if __name__ == "__main__":
    main()
