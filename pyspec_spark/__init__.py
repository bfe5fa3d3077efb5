"""pyspec_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``stuwilkins/pyspec``.

The reference (`stuwilkins/pyspec`, public GitHub; see SURVEY.md §0 for the
citation policy — the local reference mount is empty, so all reference loci
are public-repo paths, not file:line) is a single-node numpy/C toolkit for
SPEC x-ray scan files and CCD image stacks.  This package re-expresses its
capabilities Spark-first:

- ``sources/``   — SPEC text-file DataSource, SPE binary decode (§2.1)
- ``queries/``   — the declared t2 query inventory (SURVEY.md §2), each
                   registered with a DuckDB oracle
- ``functions/`` — scalar/model functions (fitfuncs analogs), determinism
                   helpers
- ``operators/`` — composite operators (gridder, as-of join, dedup, ANN)
- ``streaming/`` — Structured Streaming twins of the event queries
- ``plans/``     — plan-inspection helpers (explain capture for tuning)
"""

from pyspec_spark.registry import QUERIES, ORACLES, query  # noqa: F401

__version__ = "0.1.0"
