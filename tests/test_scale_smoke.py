"""Scale smoke (SURVEY.md §5.2 layer 5): run partition-sensitive queries
under a REAL multi-executor local-cluster and assert identical results
to the in-process local session.  Catches partition-boundary bugs
(window frames, as-of carry-forward, partial-agg merges) that local[N]
single-JVM execution can hide.

The cluster run happens in a subprocess because one JVM can only host
one Spark master."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap

import pytest

SF = "/root/testdata/sf0.01"
# queries whose correctness depends on cross-partition merge logic
QUERIES = ["q_pricing_summary", "q_grid3d", "q_window_cumsum", "q_asof_join"]

_RUNNER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local-cluster[2,4,2048]")
             .appName("scale-smoke")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    from pyspec_spark import registry
    registry.load_all()
    out = {}
    for name in %(queries)r:
        rows = registry.QUERIES[name](spark, %(sf)r).collect()
        out[name] = sorted(str(sorted(r.asDict().items())) for r in rows)
    print("RESULT:" + json.dumps(out))
    spark.stop()
    """
)


@pytest.mark.slow
def test_multi_executor_matches_local(spark):
    from pyspec_spark import registry

    registry.load_all()
    local = {
        name: sorted(
            str(sorted(r.asDict().items()))
            for r in registry.QUERIES[name](spark, SF).collect()
        )
        for name in QUERIES
    }
    script = _RUNNER % {"queries": QUERIES, "sf": SF}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=480,
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert marker, f"cluster run failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    cluster = json.loads(marker[0][len("RESULT:"):])
    for name in QUERIES:
        assert cluster[name] == local[name], f"{name} differs across executors"
