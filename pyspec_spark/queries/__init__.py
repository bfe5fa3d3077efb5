"""Declared t2 queries — importing this package registers all of them."""

import pyspec_spark.queries.relational  # noqa: F401
import pyspec_spark.queries.relational_ext  # noqa: F401
import pyspec_spark.queries.grids  # noqa: F401
import pyspec_spark.queries.windows  # noqa: F401
import pyspec_spark.queries.events  # noqa: F401
import pyspec_spark.queries.events_analytics  # noqa: F401
import pyspec_spark.queries.arrays  # noqa: F401
import pyspec_spark.queries.llm  # noqa: F401
import pyspec_spark.queries.text_ranking  # noqa: F401
import pyspec_spark.queries.llm_advanced  # noqa: F401
import pyspec_spark.queries.joins_advanced  # noqa: F401
import pyspec_spark.queries.scalars  # noqa: F401
import pyspec_spark.queries.fitting  # noqa: F401
import pyspec_spark.queries.ml  # noqa: F401
import pyspec_spark.queries.quality  # noqa: F401
import pyspec_spark.queries.curation  # noqa: F401
import pyspec_spark.queries.graph  # noqa: F401
import pyspec_spark.queries.lake_queries  # noqa: F401
import pyspec_spark.queries.ingest  # noqa: F401
import pyspec_spark.queries.contracts  # noqa: F401
import pyspec_spark.queries.plots  # noqa: F401
