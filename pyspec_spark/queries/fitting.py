"""Declared fit queries (SURVEY.md §2 X4/UD2) — rows-only (not
SQL-expressible; the driver records rows+schema, the golden tests in
tests/test_fitting.py carry the correctness load)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table


@query("q_fit_gauss_groups")
def q_fit_gauss_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag gaussian fit over a noise-free synthetic peak
    (y = 10 exp(-(q-25)^2/128) evaluated on each group's quantities) —
    deterministic end-to-end exercise of groupBy().applyInPandas LM
    fitting (`pyspec/fit.py` E3 path, distributed)."""
    from pyspec_spark.operators.fitting import fit_groups

    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    series = li.select(
        F.col("l_returnflag").alias("series_id"),
        x.alias("x"),
        (10.0 * F.exp(-((x - 25.0) * (x - 25.0)) / (2.0 * 64.0))).alias("y"),
        F.lit(1.0).alias("e"),
    )
    fits = fit_groups(series, ["gauss"])
    # project to scalars + round so the rows-only schema is stable
    return fits.select(
        "series_id",
        "models",
        F.round(F.element_at("p", 1), 4).alias("amp"),
        F.round(F.element_at("p", 2), 4).alias("mu"),
        F.round(F.abs(F.element_at("p", 3)), 4).alias("sigma"),
        "n_points",
        "converged",
    )
