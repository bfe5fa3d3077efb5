#!/usr/bin/env python
"""Run every registered query against the DuckDB oracle (driver mimic).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspec_spark import registry
from pyspec_spark.oracle import check_query, duckdb_connect
from pyspec_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    registry.load_all()
    names = args or sorted(registry.QUERIES)
    spark = get_spark("pyspec_spark_check")
    con = duckdb_connect(sf_dir)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            res = check_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        print(f"{res}  ({dt:.2f}s)")
        if not res.ok:
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
