#!/usr/bin/env python
"""Weak-scaling probe for incremental index maintenance (r9,
append_term_index): as the already-indexed corpus grows xk, a
FULL REBUILD pays the whole corpus again while an APPEND of one
fixed-size delta pays only the delta.  Synthetic (doc_id, term, tf)
stream (the testdata vocabulary is too small): per corpus unit,
50k docs x 20 terms drawn from a 100k-term vocabulary."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402

DOCS_PER_UNIT = 50_000
TERMS_PER_DOC = 20
SHARD = 10_000


def _tf_unit(spark, unit: int):
    from pyspark.sql import functions as F

    lo = unit * DOCS_PER_UNIT
    return (
        spark.range(lo, lo + DOCS_PER_UNIT)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(TERMS_PER_DOC)),
                    lambda i: F.md5(
                        ((F.col("id") * 37 + i * 1009) % 100_000).cast("string")
                    ),
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def main() -> None:
    from functools import reduce

    from pyspec_spark.operators.text import (
        append_term_index,
        sharded_postings,
        write_term_index,
    )

    spark = get_spark("scale_probe_r9c")
    print("| corpus units | rebuild wall | append-1-unit wall |")
    print("|---|---|---|")
    for k in (1, 2, 4, 8):
        units = [_tf_unit(spark, u) for u in range(k)]
        full_tf = reduce(lambda a, b: a.unionByName(b), units)
        root = f"{WORK}/inc_idx_k{k}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        write_term_index(sharded_postings(full_tf, SHARD), root)
        rebuild = time.time() - t0
        t0 = time.time()
        append_term_index(_tf_unit(spark, k), root, SHARD)
        append = time.time() - t0
        print(
            f"| {k} | {rebuild:.2f} s | {append:.2f} s |", flush=True
        )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
