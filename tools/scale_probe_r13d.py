#!/usr/bin/env python
"""Scaling probe for the duplicated_span_stats gram-build arms (r13
session 4): JVM zip_with/transform vs the byte-slice mapInArrow kernel
(`arrow=True`).

The claim under test: the two arms are value-identical (the kernel's
gram multiset is pinned to the JVM form in tests/test_llm_ops.py), and
which one is FASTER is a corpus-density question — at the bench corpus
(~50 tokens/doc) the per-stage Python-boundary latency exceeds the JVM
CPU saved (the session-4 A/B: JVM wins by ~0.3 s at 32 AND 8 cores),
while on denser corpora the gram-construction CPU dominates and the
kernel side wins.  This probe measures the crossover so the `arrow`
knob's production default is a measurement, not a guess.

Corpus: n_docs x toks/doc deterministic tokens; every 50-token window
opens with an 8-token boilerplate run shared by ALL docs (planted
cross-doc duplicated spans — the operator's real workload), the rest
are Knuth-hash doc-specific tokens.  Written to parquet (32 splits)
so both arms read identical input and generation cost is excluded.
Both arms' full results are checksum-compared at every scale (count +
sums of dup_ngrams/dup_cover) — a divergence fails the probe.

    python tools/scale_probe_r13d.py [n_docs:toks ...]
    # default 5000:150 20000:300 20000:1200
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspec_spark.operators.text import duplicated_span_stats  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402


def main() -> None:
    scales = [
        tuple(int(x) for x in a.split(":"))
        for a in (sys.argv[1:] or ["5000:150", "20000:300", "20000:1200"])
    ]
    spark = get_spark("scale_probe_r13d")

    for n_docs, n_tok in scales:
        path = f"/tmp/pyspec_r13d_{n_docs}_{n_tok}.parquet"
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"concat_ws(' ', transform(sequence(1, {n_tok}),"
                " i -> CASE WHEN i % 50 < 8"
                " THEN concat('b', CAST(i % 50 AS STRING))"
                " ELSE concat('w', CAST(pmod(id * 7919 + i * 104729,"
                " 1000000) AS STRING)) END))"
            ).alias("text"),
        ).repartition(32).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        mb = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ) / 1e6

        walls: dict[str, float] = {}
        sums: dict[str, tuple] = {}
        for name, arrow in (("jvm", False), ("kernel", True)):
            out = duplicated_span_stats(df, n=5, arrow=arrow)
            out.write.format("noop").mode("overwrite").save()  # warmup
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t = time.time()
                duplicated_span_stats(df, n=5, arrow=arrow).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.time() - t)
            walls[name] = best
            r = duplicated_span_stats(df, n=5, arrow=arrow).agg(
                F.count("*"),
                F.sum("dup_ngrams"),
                F.sum("dup_cover"),
                F.sum("n_tokens"),
            ).collect()[0]
            sums[name] = tuple(r)
        assert sums["jvm"] == sums["kernel"], (
            f"arms diverged at {n_docs}x{n_tok}: {sums}"
        )
        print(
            f"docs={n_docs} toks/doc={n_tok} parquet={mb:.0f}MB  "
            f"jvm={walls['jvm']:.2f}s kernel={walls['kernel']:.2f}s  "
            f"jvm/kernel={walls['jvm'] / walls['kernel']:.2f}  "
            f"checksums equal: {sums['jvm']}"
        )


if __name__ == "__main__":
    main()
