#!/usr/bin/env python
"""Scaling probe for the r12 clustered at-rest layout (S6e) feeding
filtered vector lookups (L5d): at corpus scale, what does
``cluster_col`` buy a "top-k where label=X" serve?

Two IVF lakes of the SAME synthetic corpus (8 cells x 8 labels,
deterministic vectors) at each scale — one appended with
cluster_col="label" (one file per (cid, label), point footer stats),
one plain (one file per cid, labels mixed).  Both serve the identical
filtered lookup (nprobe=2, label=3, k=10; ivf_lookup where=).  The
clustered lake's scan must open ~1/|labels| of the probed cells'
files; the plain lake opens every probed-cell file and pays the
filter row-side.  Wall time is collected cold-ish (fresh plan per
measurement, caches cleared) — at local[32] sizes the win is mostly
IO/decode rows; at 100 TB it is also the object-store GETs.

    python tools/scale_probe_r12a.py [k ...]     # default 1 4 16
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402

ROWS_PER_UNIT = 100_000
K_CELLS = 8
LABELS = 8
DIM = 8
TARGET = 3
NPROBE = 2


def _vectors(spark, n):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                ((F.col("id") * 31 + j * 17) % 1000) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
        (F.col("id") % LABELS).cast("int").alias("label"),
    )


def _build(spark, df, root, clustered: bool):
    from pyspec_spark.lake import lake_append
    from pyspec_spark.streaming.vectors import assign_cells, save_centroids

    cents = [
        (i, [((i * 31 + j * 17) % 1000) / 1000.0 for j in range(DIM)])
        for i in range(K_CELLS)
    ]
    save_centroids(root, cents)
    assigned = assign_cells(df.select("vec_id", "embedding"), cents).join(
        df.select("vec_id", "label"), "vec_id"
    )
    lake_append(
        spark, root, assigned, partition_col="cid",
        cluster_col="label" if clustered else None,
    )
    return cents


def main() -> None:
    from pyspec_spark.streaming.vectors import ivf_lookup

    spark = get_spark("scale_probe_r12a")
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    qv = [((7 * 31 + j * 17) % 1000) / 1000.0 for j in range(DIM)]

    print(
        "| rows | layout | files opened | MB opened | lookup wall "
        "(best of 3) |"
    )
    print("|---|---|---|---|---|")
    for k in ks:
        n = k * ROWS_PER_UNIT
        df = _vectors(spark, n)
        for clustered in (False, True):
            root = f"{WORK}/vlf_{'c' if clustered else 'p'}_{k}"
            shutil.rmtree(root, ignore_errors=True)
            _build(spark, df, root, clustered)
            walls = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.time()
                got = ivf_lookup(
                    spark, root, qv, k=10, nprobe=NPROBE,
                    where=[("label", "=", TARGET)],
                )
                rows = got.collect()
                walls.append(time.time() - t0)
            files = got.inputFiles()
            mb = sum(
                os.path.getsize(f.replace("file:", "")) for f in files
            ) / 1e6
            assert rows and all(
                int(r["vec_id"]) % LABELS == TARGET for r in rows
            )
            print(
                f"| {k} ({n // 1000}k) | "
                f"{'clustered' if clustered else 'plain'} | "
                f"{len(files)} | {mb:.1f} MB | {min(walls):.2f} s |",
                flush=True,
            )
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
