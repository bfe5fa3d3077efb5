"""Central query registry — the t2 contract surface.

Every declared query from SURVEY.md §2 registers here with BOTH a
DataFrame builder and (when SQL-expressible) the equivalent DuckDB oracle
SQL.  ``__spark_entry__.py`` exposes these dicts to the driver verbatim.

Builder signature: ``fn(spark: SparkSession, sf_dir: str) -> DataFrame``.

Determinism rules (SURVEY.md §5.3) apply to every registered pair:
- floating aggregates via exact DECIMAL(18,6) sums, cast back to DOUBLE
- ratios rounded to 6 places
- every LIMIT preceded by a total order with a unique-key tiebreak
- no approximate / platform-defined functions
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}

# Tracked persisted INPUTS (r13, ADVICE): a builder that persists an
# intermediate (q_train_mix_curated's kept frame) has no post-action
# unpersist hook on the returned plan, so the cache would live for the
# session.  track_persist bounds the leak to ONE frame per query name
# (a rebuild for a new sf_dir releases the previous one) and
# release_persisted() gives harnesses (bench.py, sweeps) an explicit
# drain between queries.
_PERSISTED: dict[tuple[str, str], Any] = {}


# Monotone tag source for track_persist calls that may coexist within
# one plan (r13): unique tags mean a later persist can never evict an
# earlier one the same plan still reads; release_persisted() drains
# them all, and bench/sweep harnesses call it between phases.
import itertools as _itertools

PERSIST_SEQ = _itertools.count()


def track_persist(spark: Any, name: str, df: Any) -> Any:
    """Persist ``df`` as query ``name``'s tracked input; unpersists the
    frame previously tracked under the same name (different sf_dir)."""
    key = (spark.sparkContext.applicationId, name)
    old = _PERSISTED.pop(key, None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass
    _PERSISTED[key] = df.persist()
    return _PERSISTED[key]


def release_persisted() -> int:
    """Unpersist every tracked input (harness drain); returns count."""
    n = 0
    for key in list(_PERSISTED):
        df = _PERSISTED.pop(key)
        try:
            df.unpersist()
        except Exception:
            pass
        n += 1
    return n

# Built-DataFrame cache (a prepared-statement cache): builders are pure
# functions of (spark, sf_dir) and DataFrames are immutable, so the
# analyzed plan can be reused across calls.  Building a complex declared
# query costs 100-700 ms of driver-side py4j expression construction +
# analysis; execution itself is unaffected (every collect() still runs
# the full job).  Keyed by applicationId so a restarted session never
# sees plans from a dead context.
_DF_CACHE: dict[tuple[str, str, str], Any] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query; ``oracle=None`` → rows-only check."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")

        @functools.wraps(fn)
        def cached(spark: Any, sf_dir: str) -> Any:
            key = (spark.sparkContext.applicationId, sf_dir, name)
            df = _DF_CACHE.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                _DF_CACHE[key] = df
            return df

        QUERIES[name] = cached
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        cached.__query_name__ = name
        return cached

    return deco


def load_all() -> None:
    """Import every query module so registrations run (idempotent)."""
    import pyspec_spark.queries  # noqa: F401
