#!/usr/bin/env python
"""Weak-scaling probe for index document deletion (r10, L40e): as the
already-indexed corpus grows xk, deleting a FIXED batch of documents
must cost delta-time (one tombstone write + a broadcast anti-join on
reads), while the only alternative without tombstones — rebuilding the
index over the survivors — pays the whole corpus again.  Synthetic
(doc_id, term, tf) stream (the r9c generator: 50k docs x 20 terms/unit
from a 100k-term vocabulary, 10k-doc shards, 64-bucket layout)."""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK  # noqa: E402
from tools.scale_probe_r9c import SHARD, _tf_unit  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402

DELETE_DOCS = 5_000  # the fixed delete delta (docs 0..4999)


def main() -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    from pyspec_spark.operators.text import (
        apply_tombstones,
        decode_postings,
        delete_term_index,
        probe_term_index,
        read_tombstones,
        sharded_postings,
        write_term_index,
    )

    spark = get_spark("scale_probe_r10a")
    probe_terms = [hashlib.md5(str(v).encode()).hexdigest() for v in (1, 2, 3)]
    print(
        "| corpus units | delete wall | tombstoned-probe wall "
        "| rebuild-instead wall |"
    )
    print("|---|---|---|---|")
    for k in (1, 2, 4, 8):
        units = [_tf_unit(spark, u) for u in range(k)]
        full_tf = reduce(lambda a, b: a.unionByName(b), units)
        root = f"{WORK}/del_idx_k{k}"
        shutil.rmtree(root, ignore_errors=True)
        write_term_index(sharded_postings(full_tf, SHARD), root)

        t0 = time.time()
        delete_term_index(
            spark.range(DELETE_DOCS).select(F.col("id").alias("doc_id")), root
        )
        t_delete = time.time() - t0

        t0 = time.time()
        live = apply_tombstones(
            decode_postings(
                probe_term_index(
                    spark, root, probe_terms,
                    empty_schema="term STRING, shard BIGINT, df_shard BIGINT,"
                    " cf_shard BIGINT, postings STRING",
                ).select("term", "shard", "postings"),
                shard_size=SHARD,
            ),
            read_tombstones(spark, root),
        )
        n = live.count()
        t_read = time.time() - t0

        dest = f"{WORK}/del_idx_k{k}_rb"
        shutil.rmtree(dest, ignore_errors=True)
        t0 = time.time()
        write_term_index(
            sharded_postings(
                full_tf.where(F.col("doc_id") >= DELETE_DOCS), SHARD
            ),
            dest,
        )
        t_rebuild = time.time() - t0
        print(
            f"| {k} | {t_delete:.2f} s | {t_read:.2f} s ({n} rows) "
            f"| {t_rebuild:.2f} s |",
            flush=True,
        )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
