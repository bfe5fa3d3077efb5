#!/usr/bin/env python
"""Ad-hoc cold re-exec timer for a list of queries (bench.py cold
methodology: rebuilt plan, caches cleared, noop sink, best-of-N).

Usage: python tools/cold_ab.py [--n N] sf_dir query [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "--n":
        n = int(args[1])
        del args[:2]
    sf_dir = args.pop(0)
    from pyspec_spark import registry
    from pyspec_spark.session import get_spark

    registry.load_all()
    spark = get_spark("cold_ab")
    out: dict[str, float] = {}
    for name in args:
        builder = getattr(
            registry.QUERIES[name], "__wrapped__", registry.QUERIES[name]
        )
        spark.sparkContext.setJobDescription(f"cold_ab warmup {name}")
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        registry.release_persisted()
        best = float("inf")
        for _ in range(n):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"cold_ab {name}")
            t = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t)
            registry.release_persisted()
        out[name] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
