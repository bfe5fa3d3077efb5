#!/usr/bin/env python
"""Count py4j ROUND TRIPS per query builder (plan construction only).

Wall-clock on this box drifts 1.5-3x between runs, so builder-time A/Bs
across commits are unreadable; the py4j command count is deterministic
and is the quantity the batching work actually reduces (each round trip
costs ~0.4-0.65 ms of single-threaded driver time here, at every core
count).

Usage: python tools/builder_calls.py sf_dir [query ...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0)
    from pyspec_spark import registry
    from pyspec_spark.session import get_spark

    registry.load_all()
    import bench

    names = args or bench.HEADLINE
    spark = get_spark("builder_calls")

    import gc

    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, command, *a, **k):
        # Exclude py4j MEMORY commands ('m...'): proxy finalizers fire
        # at GC time, i.e. nondeterministically relative to the builder
        # under measurement, and they are not plan-construction work.
        if not command.startswith("m"):
            counter["n"] += 1
        return orig(self, command, *a, **k)

    cs.ClientServerConnection.send_command = counted
    out = {}
    for name in names:
        builder = getattr(
            registry.QUERIES[name], "__wrapped__", registry.QUERIES[name]
        )
        builder(spark, sf_dir)  # warm analysis caches
        registry.release_persisted()
        gc.collect()
        counter["n"] = 0
        builder(spark, sf_dir)
        out[name] = counter["n"]
        registry.release_persisted()
    cs.ClientServerConnection.send_command = orig
    print(json.dumps({"total_calls": sum(out.values()), "per_query": out}))


if __name__ == "__main__":
    main()
