#!/usr/bin/env python
"""Weak-scaling probe for the materialized training mix (L46, r12):
the full replicate -> two-level global order -> shard pipeline over a
growing corpus.  r11b measured the two-level rank alone (sub-linear to
16M, vs the naive global window's super-linear one-core sort); this
probe adds the L46 stages on top — the fractional-epoch explode
(map-side, each row emits its own copies) and the shard arithmetic —
over a 20-source corpus at ~4 epochs/source, i.e. ~4x replication:
1M/4M/16M docs -> ~4M/16M/64M ordered rows.  Linear-ish wall growth
means the replication added no new bottleneck class on top of the
(already-measured) rank.

    python tools/scale_probe_r12b.py [k ...]     # default 1 4 16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspec_spark.session import get_spark  # noqa: E402

ROWS_PER_UNIT = 1_000_000
MICRO = 1_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from pyspec_spark.queries.curation import _replicate_order_shard

    spark = get_spark("scale_probe_r12b")
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]

    # fixed 20-source allocation ~ the L16c shape: 3.5..4.45 epochs
    alloc = spark.createDataFrame(
        [(f"src{i}", int((3.5 + i * 0.05) * MICRO)) for i in range(20)],
        "source STRING, _em BIGINT",
    )

    print("| docs | replicated rows | pipeline wall (noop count) |")
    print("|---|---|---|")
    for k in ks:
        n = k * ROWS_PER_UNIT
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 20)).alias("source"),
        )
        spark.catalog.clearCache()
        t0 = time.time()
        out = _replicate_order_shard(docs, alloc, "#probe", "r12bseed")
        # noop consumption: count + max pos (forces the full order)
        row = out.agg(
            F.count("*").alias("n"), F.max("pos").alias("mx")
        ).collect()[0]
        wall = time.time() - t0
        assert row["mx"] == row["n"] - 1  # positions are a permutation
        print(
            f"| {n // 1_000_000}M | {row['n'] / 1e6:.1f}M | {wall:.2f} s |",
            flush=True,
        )


if __name__ == "__main__":
    main()
