#!/usr/bin/env python
"""Weak-scaling probe for the round-7c additions.

- q_inverted_index: token-salted xk document replicas — a vocabulary
  bijection per replica, so |vocab| grows xk while each posting list keeps
  its k=1 length; both the (doc,term) shuffle and the term window carry
  xk rows.  Wall should grow ~linearly (the web-scale axis: vocabulary
  growth, not stopword blowup).
- q_bitext_mine: offset-vec_id embedding replicas — the target side
  grows xk while the 8 anchors stay fixed, so the scored table and the
  8-key source windows carry xk rows (the deliberate skew axis the
  docstring declares: at production the LSH shortlist caps this).
- q_linreg_stats: xk documents through the map-only feature projection
  into ONE global aggregate — the flattest legal curve; the exchange
  carries one row per map partition regardless of k.

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
    spark = get_spark("scale_probe_r7c")
    ks = [1, 2, 4, 8]

    for qname, builder, table in (
        ("q_inverted_index", build_neardup_replica, "documents"),
        ("q_bitext_mine", build_embed_replica, "embeddings"),
        ("q_linreg_stats", build_neardup_replica, "documents"),
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
