#!/usr/bin/env python
"""Weak-scaling probe for the round-7 additions.

- q_source_overlap: salted document replicas — the gram-hash shuffle
  grows ×k (every replica contributes its own vocabulary-disjoint
  grams) while the pair aggregation stays |sources|²-bounded, so wall
  should track the corpus-sized stage linearly.
- q_filter_attribution: map-only Gopher metrics + a 7-key aggregation
  over ×k docs — the flattest possible shape; wall ≈ scan cost.
- q_hard_negatives: offset-vec_id embedding replicas — 8 anchors
  broadcast against a ×k corpus; WindowGroupLimit caps the rank
  shuffle at k_neg rows per anchor per partition, so wall should track
  the scored scan, not the shuffle.

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
    spark = get_spark("scale_probe_r7")
    ks = [1, 2, 4, 8]

    for qname, builder, table in (
        ("q_source_overlap", build_neardup_replica, "documents"),
        ("q_filter_attribution", build_neardup_replica, "documents"),
        ("q_hard_negatives", build_embed_replica, "embeddings"),
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
