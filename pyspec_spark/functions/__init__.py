from pyspec_spark.functions.determinism import davg, dsum, dround  # noqa: F401
