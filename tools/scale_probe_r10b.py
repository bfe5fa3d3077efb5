#!/usr/bin/env python
"""Weak-scaling probe for top-k retrieval with skipping (r10, L40g):
as the indexed corpus grows xk, a conjunctive query whose rarest term
has FIXED df must decode a FIXED amount of postings (the rare term's
shard set bounds everything decoded), while the no-skip alternative —
decode every probed posting — grows with the frequent terms' df.

Corpus: the r9c background generator (50k docs x 20 terms/unit from a
100k-term vocabulary, 10k-doc shards) plus five planted query terms:
'rareq' in 200 docs spread over the FIRST unit only (the fixed-df rare
term — a topic that arrived with one ingestion batch) and four
'freqq*' terms present in EVERY document (df grows linearly with k —
the frequent side whose postings the skip never decodes)."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK  # noqa: E402
from tools.scale_probe_r9c import DOCS_PER_UNIT, SHARD, _tf_unit  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402

RARE_DF = 200
FREQ_TERMS = 4  # planted every-doc terms: the frequent side the skip avoids

_SHARDED_SCHEMA = (
    "term STRING, shard BIGINT, df_shard BIGINT, "
    "cf_shard BIGINT, postings STRING"
)


def _query_tf(spark, k: int):
    from pyspark.sql import functions as F

    from functools import reduce

    n = k * DOCS_PER_UNIT
    rare = (
        spark.range(0, DOCS_PER_UNIT, DOCS_PER_UNIT // RARE_DF)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("rareq").alias("term"),
            (F.col("id") % 3 + 1).alias("tf"),
        )
    )
    freqs = [
        spark.range(0, n).select(
            F.col("id").alias("doc_id"),
            F.lit(f"freqq{i}").alias("term"),
            (F.col("id") % (4 + i) + 1).alias("tf"),
        )
        for i in range(1, FREQ_TERMS + 1)
    ]
    return reduce(lambda a, b: a.unionByName(b), freqs, rare)


def main() -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    from pyspec_spark.operators.text import (
        decode_postings,
        probe_term_index,
        sharded_postings,
        write_term_index,
    )

    spark = get_spark("scale_probe_r10b")
    terms = ["rareq"] + [f"freqq{i}" for i in range(1, FREQ_TERMS + 1)]
    print(
        "| corpus units | skip-decode wall (rows) | "
        "full-decode wall (rows) | kept/total shard rows |"
    )
    print("|---|---|---|---|")
    for k in (1, 2, 4, 8, 16, 32, 64):
        units = [_tf_unit(spark, u) for u in range(k)]
        full_tf = reduce(lambda a, b: a.unionByName(b), units).unionByName(
            _query_tf(spark, k)
        )
        root = f"{WORK}/topk_idx_k{k}"
        shutil.rmtree(root, ignore_errors=True)
        write_term_index(sharded_postings(full_tf, SHARD), root)

        probed = probe_term_index(
            spark, root, terms, empty_schema=_SHARDED_SCHEMA
        )

        # the conjunctive skip: every term restricted to the rare
        # term's shard set (q_index_topk_and's kept computation)
        def _skip_count():
            rs = (
                probed.where(F.col("term") == "rareq")
                .select("shard")
                .distinct()
            )
            kept = probed.join(F.broadcast(rs), "shard", "left_semi")
            return kept, decode_postings(
                kept.select("term", "shard", "postings"), shard_size=SHARD
            ).count()

        def _full_count():
            return decode_postings(
                probed.select("term", "shard", "postings"), shard_size=SHARD
            ).count()

        # best-of-2 (first run pays job-warmup noise at small k)
        t_skip, n_skip, kept = 1e9, 0, None
        for _ in range(2):
            t0 = time.time()
            kept, n_skip = _skip_count()
            t_skip = min(t_skip, time.time() - t0)
        t_full, n_full = 1e9, 0
        for _ in range(2):
            t0 = time.time()
            n_full = _full_count()
            t_full = min(t_full, time.time() - t0)

        n_kept_rows = kept.count()
        n_rows = probed.count()
        print(
            f"| {k} | {t_skip:.2f} s ({n_skip}) | {t_full:.2f} s ({n_full}) "
            f"| {n_kept_rows}/{n_rows} |",
            flush=True,
        )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
