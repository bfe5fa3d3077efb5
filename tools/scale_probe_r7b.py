#!/usr/bin/env python
"""Weak-scaling probe for the round-7b additions.

- q_soft_dedup: token-salted ×k replicas (vocabulary bijection per
  replica) — the shingle-df table grows ×k and BOTH shuffles (df
  groupBy, per-doc agg) carry ×k rows, the heaviest legal shape here;
  wall should grow ~linearly, and per-replica weights must equal the
  k=1 weights exactly (the salting preserves within-replica df).
- q_sem_decontam: offset-vec_id embedding replicas — the 8-row bench
  broadcast meets a ×k corpus map-side; the argmax shuffle only ever
  carries the ~8 planted hits of replica 0 (the planted sources exist
  once), so wall ≈ the scored scan, flat per-row.
- q_gate_sweep: ×k documents through the 20× grid explode into a
  20-key shuffle — map-side partial aggregation must absorb the
  explosion (shuffle bytes stay 20 rows per task regardless of k).

Prints SCALING.md-ready markdown lines.  noop sink = full
re-execution, warm best-of-3, local[32].
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _best_of, build_neardup_replica  # noqa: E402
from tools.scale_probe_r5b import build_embed_replica  # noqa: E402

from pyspec_spark import registry  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r7b")
    ks = [1, 2, 4, 8]

    for qname, builder, table in (
        ("q_soft_dedup", build_neardup_replica, "documents"),
        ("q_sem_decontam", build_embed_replica, "embeddings"),
        ("q_gate_sweep", build_neardup_replica, "documents"),
    ):
        print(f"| k | {table} | {qname} |")
        print("|---|---|---|")
        for k in ks:
            d = builder(spark, k)
            n = spark.read.parquet(f"{d}/{table}.parquet").count()
            fn = registry.QUERIES[qname]
            t = _best_of(
                lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
            )
            print(f"| {k} | {n:,} | {t * 1000:.0f} ms |", flush=True)


if __name__ == "__main__":
    main()
