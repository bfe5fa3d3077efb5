#!/usr/bin/env python
"""Skew probe for the r8 degree-ordered triangle orientation.

A planted middle-id hub with in-degree = out-degree = d/2 under id
orientation generates (d/2)^2 wedges — the quadratic term that stalls
the straggler task at scale.  Degree orientation points every star
edge INTO the hub, so the hub centers zero wedges and the wedge mass
collapses to the background graph.  Wall-clock of the full triangle
count (noop-sink equivalent: .count of memberships) at hub degree
2000*k, background = 3000 random sparse edges (fixed):

Both orientations count IDENTICAL triangles (property-tested); only
the intermediate differs — which is the entire point.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _best_of  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402


def build_hub_edges(spark, k: int):
    import random

    from pyspark.sql import functions as F  # noqa: F401

    d = 2000 * k
    hub = d  # middle id: d/2 lower ids point in, d/2 higher point out
    star = [(i, hub) for i in range(d // 2)] + [
        (hub, hub + 1 + j) for j in range(d // 2)
    ]
    rng = random.Random(13)
    n_nodes = 2 * d + 2
    bg = set()
    while len(bg) < 3000:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            bg.add((min(a, b), max(a, b)))
    edges = sorted(set(star) | bg)
    return spark.createDataFrame(edges, "a LONG, b LONG").repartition(32)


def main() -> None:
    from pyspec_spark.queries.graph import (
        oriented_wedges,
        triangle_memberships,
    )

    spark = get_spark("scale_probe_r8b")
    print("| k | hub degree | wedges (id) | wedges (degree) |"
          " triangles wall (id) | triangles wall (degree) |")
    print("|---|---|---|---|---|---|")
    for k in (1, 2, 4, 8):
        e = build_hub_edges(spark, k).cache()
        e.count()
        w_id = oriented_wedges(e, "id").count()
        w_deg = oriented_wedges(e, "degree").count()

        def run(orient):
            def f():
                triangle_memberships(e, orient).count()
            return f

        t_id = _best_of(run("id"), n=2)
        t_deg = _best_of(run("degree"), n=2)
        print(
            f"| {k} | {2000 * k:,} | {w_id:,} | {w_deg:,} |"
            f" {t_id * 1000:.0f} ms | {t_deg * 1000:.0f} ms |",
            flush=True,
        )
        e.unpersist()


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
