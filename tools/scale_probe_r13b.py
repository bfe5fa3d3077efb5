#!/usr/bin/env python
"""Scaling probe for the r13 versioned mix (L46d): when a delta lands,
what does EXTENDING the mix cost vs REBUILDING it?

Corpus: N docs over 20 sources (the r12b shape, ~4x replication);
delta = a fixed 500k-doc late-landing slice appended to a growing
base.  Arms, both consumed by the r12b noop (count + max pos):

- **rebuild**: the full L46 pipeline over base+delta — replicate all,
  rank all (what the engine did before L46d; cost ∝ corpus).
- **extend**: the L46d path — base replicate COUNT (map-side explode +
  1-row agg, no ordering), delta replicate + version-seeded rank over
  the DELTA only (cost ∝ delta + one cheap base pass).

Expectation: rebuild wall grows with the corpus (it re-ranks
history); extend wall stays ~flat (its only rank is over the fixed
delta; the base pass is a shuffle-free count).

    python tools/scale_probe_r13b.py [k ...]     # default 1 4 16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspec_spark.session import get_spark  # noqa: E402

ROWS_PER_UNIT = 1_000_000
DELTA_ROWS = 500_000
MICRO = 1_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from pyspec_spark.queries.curation import (
        _replicate_copies,
        _replicate_order_shard,
    )
    from pyspec_spark.operators.ordering import global_order_index

    spark = get_spark("scale_probe_r13b")
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]

    alloc = spark.createDataFrame(
        [(f"src{i}", int((3.5 + i * 0.05) * MICRO)) for i in range(20)],
        "source STRING, _em BIGINT",
    )

    def docs_of(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("src"), (F.col("id") % 20)).alias("source"),
            )
        )

    print("| base docs | arm | replicated rows touched | wall |")
    print("|---|---|---|---|")
    for k in ks:
        n = k * ROWS_PER_UNIT
        base = docs_of(0, n)
        delta = docs_of(n, n + DELTA_ROWS)

        # rebuild arm: full pipeline over base+delta
        spark.catalog.clearCache()
        t0 = time.time()
        out = _replicate_order_shard(
            docs_of(0, n + DELTA_ROWS), alloc, "#probe", "r13brebuild"
        )
        row = out.agg(F.count("*").alias("n"), F.max("pos").alias("mx")).collect()[0]
        wall = time.time() - t0
        assert row["mx"] == row["n"] - 1
        print(
            f"| {n // 1_000_000}M | rebuild | {row['n'] / 1e6:.1f}M "
            f"| {wall:.2f} s |",
            flush=True,
        )

        # extend arm: base count (order-free) + version-seeded delta rank
        spark.catalog.clearCache()
        t0 = time.time()
        nb = _replicate_copies(base, alloc, "#probe").agg(
            F.count("*").cast("bigint").alias("_nb")
        )
        keyed = _replicate_copies(delta, alloc, "#probe")
        ordered = global_order_index(keyed, "_rid", seed="r13bdelta#v2")
        ext = ordered.crossJoin(F.broadcast(nb)).select(
            (F.col("pos") + F.col("_nb")).alias("pos")
        )
        row = ext.agg(
            F.count("*").alias("n"), F.max("pos").alias("mx"),
            F.min("pos").alias("mn"),
        ).collect()[0]
        wall = time.time() - t0
        assert row["mx"] - row["mn"] == row["n"] - 1  # contiguous extension
        print(
            f"| {n // 1_000_000}M | extend | {row['n'] / 1e6:.1f}M "
            f"| {wall:.2f} s |",
            flush=True,
        )


if __name__ == "__main__":
    main()
