#!/usr/bin/env python
"""Capture .explain("formatted") for the headline + serving queries into
plans/r13/<query>_<tag>.txt — the optimization round's before/after plan
evidence (the judge checks plan claims against these files).

Usage: python tools/plans_r13.py <tag> [query ...]
  tag: "before" or "after"; with no query list, dumps the full
  HEADLINE + SERVING sets from bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SERVING  # noqa: E402
from pyspec_spark import registry  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [*HEADLINE, *SERVING]
    os.makedirs(OUT, exist_ok=True)
    registry.load_all()
    spark = get_spark("pyspec_plans_r13")
    for name in names:
        if name not in registry.QUERIES:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        builder = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
        try:
            df = builder(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — keep dumping the rest
            plan = f"ERROR building/explaining {name}: {e}"
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
