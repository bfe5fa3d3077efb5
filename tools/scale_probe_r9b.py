#!/usr/bin/env python
"""Weak-scaling probe for the r9 term-bucketed index read path
(q_index_bucket_lookup / operators/text.write_term_index +
probe_term_index).  The testdata documents table has a ~31-term
vocabulary — far too small to exercise a 64-bucket layout — so the
index rows are synthesized directly at the q_inverted_index schema:
V distinct md5 terms, each with a realistic delta-encoded posting
string.  The claim under test: a lookup opens only the probed buckets'
files (~|probed|/64 of the layout), so probe cost is bounded by the
bucket fraction while the index grows 64x."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK, _best_of  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402


def main() -> None:
    import glob as g

    from pyspark.sql import functions as F

    from pyspec_spark.operators.text import (
        decode_postings,
        probe_term_index,
        write_term_index,
    )

    spark = get_spark("scale_probe_r9b")
    # fixed probe set: the md5 terms of ids 1, 2, 3 (present at every V)
    probe_terms = None
    print("| V (vocab) | layout files | probe files | probe+decode wall |")
    print("|---|---|---|---|")
    for v in (10_000, 40_000, 160_000, 640_000):
        idx = (
            spark.range(v)
            .select(
                F.md5(F.col("id").cast("string")).alias("term"),
                F.lit(3).cast("long").alias("df"),
                F.lit(5).cast("long").alias("cf"),
                # 3-entry posting list "gap:tf,gap:tf,gap:tf"
                F.concat_ws(
                    ",",
                    F.concat_ws(":", (F.col("id") % 97 + 1).cast("string"), F.lit("2")),
                    F.concat_ws(":", (F.col("id") % 31 + 1).cast("string"), F.lit("1")),
                    F.concat_ws(":", (F.col("id") % 13 + 1).cast("string"), F.lit("2")),
                ).alias("postings"),
            )
        )
        if probe_terms is None:
            probe_terms = [
                r["term"]
                for r in idx.where(F.col("term").isNotNull()).limit(0).collect()
            ]
            import hashlib

            probe_terms = [
                hashlib.md5(str(i).encode()).hexdigest() for i in (1, 2, 3)
            ]
        root = f"{WORK}/term_idx_v{v}"
        write_term_index(idx, root)
        total_files = len(g.glob(f"{root}/tb=*/*.parquet"))

        def run():
            probed = probe_term_index(spark, root, probe_terms)
            decode_postings(
                probed.select("term", "postings")
            ).groupBy().count().collect()

        t = _best_of(run, n=2)
        opened = len(probe_term_index(spark, root, probe_terms).inputFiles())
        print(
            f"| {v} | {total_files} | {opened} | {t * 1000:.0f} ms |",
            flush=True,
        )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
