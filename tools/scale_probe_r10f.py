#!/usr/bin/env python
"""Scaling probe for BATCH multi-query retrieval (r10, L40i): as the
query workload grows x|Q| over a FIXED indexed corpus, the batch plan
pays ONE probe + ONE decode of the term union + one scored-pair
shuffle, while a per-query serving loop pays |Q| probes and re-decodes
shared terms once per query that references them.

Corpus: 2 r9c units (100k docs x 20 terms from a 100k-term md5
vocabulary).  Workload: query i = the two terms md5((13i)%100k),
md5((13i+7)%100k) — deterministic, no RNG.  The loop arm is MEASURED
on 16 queries at every |Q| and projected linearly (mean x |Q|): a
thousand sequential driver jobs is exactly the cost the batch plan
exists to avoid, and the projection is conservative for the loop
(ignores per-job scheduling overhead beyond the measured mean).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK  # noqa: E402
from tools.scale_probe_r9c import SHARD, _tf_unit  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402

UNITS = 2
LOOP_SAMPLE = 16

_SHARDED_SCHEMA = (
    "term STRING, shard BIGINT, df_shard BIGINT, "
    "cf_shard BIGINT, postings STRING"
)


def _qterms(i: int) -> tuple[str, str]:
    import hashlib

    a = hashlib.md5(str((13 * i) % 100_000).encode()).hexdigest()
    b = hashlib.md5(str((13 * i + 7) % 100_000).encode()).hexdigest()
    return a, b


def _score(spark, root, decoded, qmap, k: int = 10):
    """The q_batch_retrieval scoring shape: broadcast fan-out + round-6
    BM25 parts + per-(query, doc) sum + per-query top-k window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pyspec_spark.operators.text import read_norm_stats, read_norms
    from pyspec_spark.queries.text_ranking import _BM25_B as B
    from pyspec_spark.queries.text_ranking import _BM25_K1 as K1

    dl = read_norms(spark, root)
    stats = read_norm_stats(spark, root)
    dfs = decoded.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = dfs.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            6,
        ).alias("idf"),
    )
    part = F.round(
        F.col("idf") * (F.col("tf") * (K1 + 1.0))
        / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        decoded.join(F.broadcast(qmap), "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", part.alias("part"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    return scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )


def main() -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    from pyspec_spark.operators.text import (
        decode_postings,
        probe_term_index,
        sharded_postings,
        write_norms,
        write_term_index,
    )

    spark = get_spark("scale_probe_r10f")
    units = [_tf_unit(spark, u) for u in range(UNITS)]
    full_tf = reduce(lambda a, b: a.unionByName(b), units)
    root = f"{WORK}/batch_ret_idx"
    shutil.rmtree(root, ignore_errors=True)
    write_term_index(sharded_postings(full_tf, SHARD), root)
    write_norms(
        full_tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")),
        root,
        shard_size=SHARD,
    )

    print(
        "| |Q| | union terms | batch wall (decoded rows) | "
        "loop mean/query | loop projected |"
    )
    print("|---|---|---|---|---|")
    for nq in (4, 16, 64, 256, 1024):
        pairs = [(i, t) for i in range(nq) for t in _qterms(i)]
        union_terms = sorted({t for _, t in pairs})
        qmap = spark.createDataFrame(pairs, "query_id INT, term STRING")

        def _batch():
            probed = probe_term_index(
                spark, root, union_terms, empty_schema=_SHARDED_SCHEMA
            )
            decoded = decode_postings(
                probed.select("term", "shard", "postings"), shard_size=SHARD
            )
            n_dec = decoded.count()
            n_out = _score(spark, root, decoded, qmap).count()
            return n_dec, n_out

        t_batch, n_dec = 1e9, 0
        for _ in range(2):  # best-of-2: first run pays warmup
            t0 = time.time()
            n_dec, _n = _batch()
            t_batch = min(t_batch, time.time() - t0)

        # loop arm: LOOP_SAMPLE individually-served queries, measured
        t0 = time.time()
        for i in range(min(nq, LOOP_SAMPLE)):
            ts = list(_qterms(i))
            probed = probe_term_index(
                spark, root, ts, empty_schema=_SHARDED_SCHEMA
            )
            decoded = decode_postings(
                probed.select("term", "shard", "postings"), shard_size=SHARD
            )
            one = spark.createDataFrame(
                [(i, t) for t in ts], "query_id INT, term STRING"
            )
            _score(spark, root, decoded, one).count()
        per_q = (time.time() - t0) / min(nq, LOOP_SAMPLE)
        print(
            f"| {nq} | {len(union_terms)} | {t_batch:.2f} s ({n_dec}) "
            f"| {per_q:.2f} s | {per_q * nq:.0f} s |",
            flush=True,
        )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
