"""Empty-input robustness: every declared query must execute cleanly
over zero-row tables with the production schemas.  At 100 TB scale empty
inputs are routine — empty partitions after pruning, empty groups after
filters, fresh streaming sinks — and an operator that divides by a
count or reduces an empty accumulator without a guard dies there."""

from __future__ import annotations

import os

import pytest

from pyspec_spark import registry
from pyspec_spark.tables import TABLES, table

SF = "/root/testdata/sf0.001"

registry.load_all()


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Zero-row copies of every table, exact same schemas."""
    base = str(tmp_path_factory.mktemp("empty_sf"))
    for name in TABLES:
        df = table(spark, SF, name).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, f"{name}.parquet")
        )
    return base


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_survives_empty_input(spark, empty_sf, name):
    builder = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
    rows = builder(spark, empty_sf).collect()
    assert isinstance(rows, list)  # no exception, sane (possibly empty) result


def test_non_registry_operators_survive_empty(spark, empty_sf):
    """Operators outside the registry (model trainers, codec-free
    helpers) must fail cleanly or return empty — never die in a
    reducer."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyspec_spark.operators.bpe import bpe_encode, train_bpe, word_counts
    from pyspec_spark.operators.pca import covariance_matrix
    from pyspec_spark.operators.text import (
        cms_estimate,
        compression_ratio,
        count_min_sketch,
    )

    docs = spark.read.parquet(os.path.join(empty_sf, "documents.parquet"))
    # BPE: empty corpus -> zero merges; encode with zero merges works
    wc = word_counts(docs)
    assert train_bpe(wc, n_merges=5) == []
    assert bpe_encode(docs, []).collect() == []
    # sketches: empty in -> empty out, estimate joins to nothing
    occ = docs.select(F.explode(F.split("text", " ")).alias("term"))
    sk = count_min_sketch(occ)
    assert sk.collect() == []
    probes = occ.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    assert cms_estimate(sk, probes).collect() == []
    # compression ratio: empty in -> empty out
    assert compression_ratio(docs).collect() == []
    # covariance: empty input is a clean error, not a reducer crash
    emb = spark.read.parquet(os.path.join(empty_sf, "embeddings.parquet"))
    with _pytest.raises(ValueError, match="empty"):
        covariance_matrix(emb)
