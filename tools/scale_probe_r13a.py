#!/usr/bin/env python
"""Scaling probe for the r13 PQ-coded maintained vector lake (L5e):
at corpus scale, what does storing PQ codes in the cells buy a top-k
serve?  The direct sequel to r12a, which proved bytes-opened is the
bill — here the bill itself changes shape.

Two maintained lakes of the SAME synthetic corpus (8 cells, dim-64
deterministic vectors) at each scale:

- **raw**: the ST11 layout — cid-partitioned raw vectors; ivf_lookup
  reads every probed cell's FULL vectors and re-ranks.
- **pq**: the L5e pair — codes table (m=4 x 16-dim subspaces, K=16
  codewords, deterministic first-K codebooks) + vb-bucketed raw
  vectors; pq_lookup ADC-scans the probed cells' CODE files, then
  fetches raw vectors for the 32-row shortlist only (bloom-pruned).

"MB opened" = the serve plan's inputFiles byte total (the object-
store GET bill).  Expectation: the raw arm's bytes grow linearly with
the corpus (probed-cell vectors); the pq arm's bytes grow with the
CODES (a ~d*4/m-fold smaller column set) plus a shortlist-bounded
fetch that stays flat — bytes-opened ∝ codes, not vectors.

    python tools/scale_probe_r13a.py [k ...]     # default 1 4 16
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
DIM = 64
M, SUBD, PQ_K = 4, 16, 16
NPROBE = 2
SHORTLIST = 32


def _vectors(spark, n):
    from pyspark.sql import functions as F

    # Knuth-hash coordinates: real embeddings are incompressible, and a
    # repetitive pattern would let parquet shrink the raw arm unfairly
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (
                ((F.col("id") * 2654435761 + j * 40503 + 7) % 100003)
                / 100003.0
            ).cast("float"),
        ).alias("embedding"),
    )


def _coord(i: int, j: int) -> float:
    return float(
        np_f32(((i * 2654435761 + j * 40503 + 7) % 100003) / 100003.0)
    )


def np_f32(x: float) -> float:
    import numpy as np

    return float(np.float32(x))


def _cents():
    return [
        (i, [_coord(i, j) for j in range(DIM)]) for i in range(K_CELLS)
    ]


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from pyspec_spark.lake import lake_append
    from pyspec_spark.operators.similarity import pq_codebooks_firstk_df
    from pyspec_spark.streaming.vectors import (
        assign_cells,
        build_pq_lake,
        ivf_lookup,
        pq_lookup,
        save_centroids,
    )

    spark = get_spark("scale_probe_r13a")
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    cents = _cents()
    qv = [_coord(7, j) for j in range(DIM)]

    print(
        "| rows | layout | files opened | MB opened | lookup wall "
        "(best of 3) |"
    )
    print("|---|---|---|---|---|")
    for k in ks:
        n = k * ROWS_PER_UNIT
        df = _vectors(spark, n)
        cb_row = pq_codebooks_firstk_df(df, m=M, subd=SUBD, k=PQ_K).collect()[0]
        cb = [cb_row[f"cb{mi}"] for mi in range(M)]

        # raw arm (the ST11 layout)
        root = f"{WORK}/pqr_raw_{k}"
        shutil.rmtree(root, ignore_errors=True)
        save_centroids(root, cents)
        lake_append(
            spark, root, assign_cells(df, cents), partition_col="cid"
        )
        walls = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            got = ivf_lookup(spark, root, qv, k=10, nprobe=NPROBE)
            rows = got.collect()
            walls.append(time.time() - t0)
        files = got.inputFiles()
        mb = sum(os.path.getsize(f.replace("file:", "")) for f in files) / 1e6
        assert len(rows) == 10
        print(
            f"| {k} ({n // 1000}k) | raw | {len(files)} | {mb:.1f} MB "
            f"| {min(walls):.2f} s |",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)

        # pq arm (the L5e pair).  fetch_buckets scales with the corpus
        # so each (cid, vb) file stays ~500 rows — the bounded-file-
        # size rule every production layout follows; with it, the
        # shortlist fetch opens <= SHORTLIST files of CONSTANT size
        # (flat bytes), while the raw arm's probed-cell bytes grow
        # linearly.
        root = f"{WORK}/pqr_pq_{k}"
        shutil.rmtree(root, ignore_errors=True)
        build_pq_lake(
            spark, root, df, cents, cb, m=M, subd=SUBD,
            fetch_buckets=max(16, n // (K_CELLS * 500)),
        )
        walls = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            got = pq_lookup(
                spark, root, qv, k=10, nprobe=NPROBE, shortlist=SHORTLIST
            )
            rows = got.collect()
            walls.append(time.time() - t0)
        files = [f.replace("file:", "") for f in got.inputFiles()]
        cmb = sum(
            os.path.getsize(f) for f in files if f"{os.sep}codes{os.sep}" in f
        ) / 1e6
        fmb = sum(
            os.path.getsize(f) for f in files if f"{os.sep}vecs{os.sep}" in f
        ) / 1e6
        assert len(rows) == 10
        print(
            f"| {k} ({n // 1000}k) | pq | {len(files)} | "
            f"{cmb + fmb:.1f} MB ({cmb:.1f} codes + {fmb:.1f} fetch) "
            f"| {min(walls):.2f} s |",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
