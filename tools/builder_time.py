#!/usr/bin/env python
"""Time PLAN CONSTRUCTION (builder call, no action) per query.

Guide §7.3: driver-side single-threaded work — py4j expression
building + analysis — is part of every cold re-execution.  This tool
ranks the builders so the batching effort goes where the driver time
actually is.  min-of-N in a warm session (first call per query is
reported separately as "first" since codegen/analysis caches warm up).

Usage: python tools/builder_time.py [--n N] sf_dir [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "--n":
        n = int(args[1])
        del args[:2]
    sf_dir = args.pop(0)
    from pyspec_spark import registry
    from pyspec_spark.session import get_spark

    registry.load_all()
    import bench

    names = args or bench.HEADLINE
    spark = get_spark("builder_time")
    out = {}
    for name in names:
        builder = getattr(
            registry.QUERIES[name], "__wrapped__", registry.QUERIES[name]
        )
        t0 = time.time()
        df = builder(spark, sf_dir)
        first = time.time() - t0
        registry.release_persisted()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            df = builder(spark, sf_dir)
            best = min(best, time.time() - t0)
            registry.release_persisted()
        out[name] = {"first": round(first, 3), "min": round(best, 3)}
        del df
    total_min = sum(v["min"] for v in out.values())
    print(json.dumps({"total_min_s": round(total_min, 2), "per_query": out}))


if __name__ == "__main__":
    main()
