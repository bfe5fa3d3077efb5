"""L48 — delete propagation across maintained artifacts (the
right-to-be-forgotten coordinator, operators/forget.py).

The contract under test: ONE forget_documents call makes a doc-id set
unreachable from the CURRENT read path of every maintained artifact —
corpus lake (CoW), term index (tombstones), PQ vector lake (CoW pair)
— and surviving_references is an INDEPENDENT auditor that re-reads
each artifact through its own read face (decode + tombstone anti-join
for the index, lake_read for the lakes) rather than trusting the
deleter's report.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF

_FORGET = [3, 10, 17]
_SHARD = 64


def _corpus_lake(spark, tmp_path) -> str:
    from pyspec_spark.lake import lake_append
    from pyspec_spark.tables import table

    root = str(tmp_path / "corpus")
    docs = table(spark, SF, "documents").select(
        "doc_id", "source", "text", "lang", "n_chars"
    )
    lake_append(spark, root, docs, partition_col="source")
    return root


def _term_index(spark, tmp_path) -> str:
    from pyspec_spark.operators.text import build_maintained_index
    from pyspec_spark.tables import table

    root = str(tmp_path / "tindex")
    docs = table(spark, SF, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    build_maintained_index(spark, tf, dl, root, _SHARD)
    return root


def _pq_lake(spark, tmp_path) -> str:
    from pyspec_spark.operators.similarity import pq_codebooks_firstk_df
    from pyspec_spark.streaming.vectors import build_pq_lake
    from pyspec_spark.tables import table

    root = str(tmp_path / "veclake")
    e = table(spark, SF, "embeddings").select("vec_id", "embedding")
    cb_rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < 8).collect()
    )
    pq = pq_codebooks_firstk_df(e, m=4, subd=16, k=16).collect()[0]
    cb = [pq[f"cb{mi}"] for mi in range(4)]
    build_pq_lake(spark, root, e, cb_rows, cb, m=4, subd=16)
    return root


def test_forget_propagates_to_every_artifact(spark, tmp_path):
    from pyspec_spark.operators.forget import (
        forget_documents,
        surviving_references,
    )

    corpus = _corpus_lake(spark, tmp_path)
    tindex = _term_index(spark, tmp_path)
    veclake = _pq_lake(spark, tmp_path)
    ids = spark.createDataFrame([(i,) for i in _FORGET], "doc_id BIGINT")
    kw = dict(
        corpus_root=corpus,
        term_index_path=tindex,
        term_index_shard_size=_SHARD,
        vector_root=veclake,
        vector_pq=True,
    )

    before = surviving_references(spark, ids, **kw)
    assert before["corpus"] == len(_FORGET)
    assert before["term_index"] == len(_FORGET)
    assert before["vector_lake"] == 2 * len(_FORGET)  # codes + vecs

    report = forget_documents(
        spark,
        ids,
        corpus_root=corpus,
        term_index_path=tindex,
        vector_root=veclake,
        vector_pq=True,
    )
    assert report["n_doc_ids"] == len(_FORGET)
    assert report["corpus"]["action"] == "cow_delete"
    assert report["term_index"]["action"] == "tombstoned"
    assert report["vector_lake"]["action"] == "cow_delete_pq"

    after = surviving_references(spark, ids, **kw)
    assert after == {"corpus": 0, "term_index": 0, "vector_lake": 0}

    # everyone ELSE is untouched: corpus row count dropped by exactly
    # the forget set
    from pyspec_spark.lake import lake_read
    from pyspec_spark.tables import table

    n_docs = table(spark, SF, "documents").count()
    assert lake_read(spark, corpus).count() == n_docs - len(_FORGET)


def test_forget_is_idempotent(spark, tmp_path):
    from pyspec_spark.operators.forget import (
        forget_documents,
        surviving_references,
    )

    corpus = _corpus_lake(spark, tmp_path)
    tindex = _term_index(spark, tmp_path)
    ids = spark.createDataFrame([(i,) for i in _FORGET], "doc_id BIGINT")
    kw = dict(
        corpus_root=corpus,
        term_index_path=tindex,
        term_index_shard_size=_SHARD,
    )
    forget_documents(
        spark, ids, corpus_root=corpus, term_index_path=tindex
    )
    forget_documents(
        spark, ids, corpus_root=corpus, term_index_path=tindex
    )
    after = surviving_references(spark, ids, **kw)
    assert after == {"corpus": 0, "term_index": 0}


def test_forget_reports_skipped_artifacts(spark, tmp_path):
    from pyspec_spark.operators.forget import forget_documents

    corpus = _corpus_lake(spark, tmp_path)
    ids = spark.createDataFrame([(i,) for i in _FORGET], "doc_id BIGINT")
    report = forget_documents(spark, ids, corpus_root=corpus)
    assert report["term_index"]["action"] == "skipped"
    assert report["vector_lake"]["action"] == "skipped"
    assert report["corpus"]["action"] == "cow_delete"


def test_forget_with_vec_id_map(spark, tmp_path):
    """doc_id -> vec_id indirection: only mapped vectors leave."""
    from pyspec_spark.operators.forget import (
        forget_documents,
        surviving_references,
    )

    veclake = _pq_lake(spark, tmp_path)
    ids = spark.createDataFrame([(1000,), (1001,)], "doc_id BIGINT")
    vmap = spark.createDataFrame(
        [(1000, 5), (1001, 9)], "doc_id BIGINT, vec_id BIGINT"
    )
    kw = dict(vector_root=veclake, vector_pq=True, vec_id_map=vmap)
    assert surviving_references(spark, ids, **kw)["vector_lake"] == 4
    forget_documents(
        spark, ids, vector_root=veclake, vector_pq=True, vec_id_map=vmap
    )
    assert surviving_references(spark, ids, **kw)["vector_lake"] == 0
