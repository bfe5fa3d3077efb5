#!/usr/bin/env python
"""Weak-scaling probe for the round-7d additions.

- q_drop_audit: token-salted xk document replicas through every
  pipeline stage's flag computation — the audit's cost must track the
  pipeline's own (its joins add only vanishing-fraction flag tables).
- q_dedup_tau_sweep: xk docs through the full MinHash signature/band
  build plus the 33-level explode — the sweep should cost the index
  build, with the tuning table itself ~free.
- q_triangles is NOT probed: its declared edge basis is the
  q_jaccard doc_id < 500 slice (oracle-replayable by construction), so
  replicas with offset ids cannot scale it — the join shape's growth
  story is the standard wedge bound (deg^2/2 per hub; degree
  orientation at production).

Prints SCALING.md-ready markdown lines.  noop sink = full
re-execution, warm best-of-3, local[32].
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _best_of, build_neardup_replica  # noqa: E402

from pyspec_spark import registry  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r7d")
    ks = [1, 2, 4, 8]

    for qname in ("q_drop_audit", "q_dedup_tau_sweep"):
        print(f"| k | documents | {qname} |")
        print("|---|---|---|")
        for k in ks:
            d = build_neardup_replica(spark, k)
            n = spark.read.parquet(f"{d}/documents.parquet").count()
            fn = getattr(
                registry.QUERIES[qname], "__wrapped__", registry.QUERIES[qname]
            )

            def run():
                spark.catalog.clearCache()
                fn(spark, d).write.format("noop").mode("overwrite").save()

            t = _best_of(run)
            print(f"| {k} | {n:,} | {t * 1000:.0f} ms |", flush=True)


if __name__ == "__main__":
    main()
