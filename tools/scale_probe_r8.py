#!/usr/bin/env python
"""Weak-scaling probe for the round-8 additions.

- bitext_mine_lsh (the corpus x corpus scale path): BOTH sides grow xk
  (src = even vec_ids, tgt = odd vec_ids of an offset-id embeddings
  replica).  The exact variant's cost is |src| x |tgt| ~ k²; the banded
  shortlist's candidate count should track the band-bucket collision
  mass, and wall should stay far under the exact curve's growth.  The
  exact q_bitext_mine (broadcast anchors, |src| FIXED at 8) is probed
  on the same replicas as the contrast line.
- q_triangles degree orientation: oriented_wedges(orient="degree") vs
  "id" on the near-dup graph replica — wedge counts are the cost.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _best_of  # noqa: E402

from pyspec_spark import registry  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/pyspec_spark_scale"


def build_embed_replica(spark, k: int) -> str:
    from functools import reduce

    from pyspark.sql import functions as F

    dest = f"{WORK}/embed_x{k}"
    if os.path.exists(f"{dest}/embeddings.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    off = e.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [
        e.withColumn("vec_id", F.col("vec_id") + F.lit(i * off))
        for i in range(k)
    ]
    reduce(lambda a, b: a.unionAll(b), parts).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/embeddings.parquet")
    return dest


def main() -> None:
    from pyspark.sql import functions as F

    from pyspec_spark.operators.similarity import bitext_mine_lsh

    registry.load_all()
    spark = get_spark("scale_probe_r8")
    ks = [1, 2, 4, 8]

    print("| k | vectors | bitext_mine_lsh (both sides xk) | candidates |")
    print("|---|---|---|---|")
    for k in ks:
        d = build_embed_replica(spark, k)
        e = spark.read.parquet(f"{d}/embeddings.parquet")
        n = e.count()
        src = e.where(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("src_id"), F.col("embedding").alias("se")
        )
        tgt = e.where(F.col("vec_id") % 2 == 1).select(
            F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("te")
        )

        def run():
            bitext_mine_lsh(src, tgt, k=4, max_hamming=4).write.format(
                "noop"
            ).mode("overwrite").save()

        t = _best_of(run)
        n_out = bitext_mine_lsh(src, tgt, k=4, max_hamming=4).count()
        print(f"| {k} | {n:,} | {t * 1000:.0f} ms | {n_out:,} mined |",
              flush=True)

    print()
    print("| k | vectors | q_bitext_mine (exact, 8 fixed anchors) |")
    print("|---|---|---|")
    for k in ks:
        d = build_embed_replica(spark, k)
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        fn = getattr(
            registry.QUERIES["q_bitext_mine"],
            "__wrapped__",
            registry.QUERIES["q_bitext_mine"],
        )

        def run():
            fn(spark, d).write.format("noop").mode("overwrite").save()

        t = _best_of(run)
        print(f"| {k} | {n:,} | {t * 1000:.0f} ms |", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
