#!/usr/bin/env python
"""Attribute py4j round trips of a query builder to repo code lines.

Companion to builder_calls.py: same counting hook, but each counted
send_command records the innermost pyspec_spark/bench frame of the
Python stack, so the per-line histogram says WHERE a builder spends its
round trips (plan-construction work only; deterministic).

Usage: python tools/builder_call_sites.py sf_dir query [top_n]
"""
from __future__ import annotations

import os
import sys
import traceback
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    from pyspec_spark import registry
    from pyspec_spark.session import get_spark

    registry.load_all()
    spark = get_spark("builder_call_sites")

    import gc

    import py4j.clientserver as cs

    hist: Counter[str] = Counter()
    orig = cs.ClientServerConnection.send_command
    marker = os.sep + "pyspec_spark" + os.sep

    def counted(self, command, *a, **k):
        if not command.startswith("m"):
            site = "<other>"
            for f in reversed(traceback.extract_stack()):
                if marker in f.filename or f.filename.endswith("bench.py"):
                    site = f"{os.path.relpath(f.filename)}:{f.lineno} {f.line}"
                    break
            hist[site] += 1
        return orig(self, command, *a, **k)

    builder = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
    builder(spark, sf_dir)  # warm analysis caches
    registry.release_persisted()
    gc.collect()
    cs.ClientServerConnection.send_command = counted
    builder(spark, sf_dir)
    cs.ClientServerConnection.send_command = orig
    registry.release_persisted()

    total = sum(hist.values())
    print(f"{name}: {total} round trips")
    for site, n in hist.most_common(top_n):
        print(f"{n:6d}  {site}")


if __name__ == "__main__":
    main()
