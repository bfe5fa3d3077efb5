"""L5h — the maintained RAG index over the document lake
(operators/rag.py): build / CDC-driven extend / delete propagation /
the consistency auditor, composed from verified pieces (S6b/S6c lake,
L13b chunking, L6+ hash embeddings, L5e PQ lake)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF


def _corpus(spark, tmp_path, n=20):
    from pyspec_spark.lake import lake_append
    from pyspec_spark.tables import table

    root = str(tmp_path / "corpus")
    docs = (
        table(spark, SF, "documents")
        .select("doc_id", "source", "text")
        .where(F.col("doc_id") < n)
    )
    lake_append(spark, root, docs, partition_col="source")
    return root


def _delta_docs(spark, lo, hi, words=40):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.lit("srcX").alias("source"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(words - 1)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), j), F.lit(23)),
                ),
            ),
        ).alias("text"),
    )


def test_build_serve_and_audit(spark, tmp_path):
    from pyspec_spark.operators.rag import (
        _CHUNK_BITS,
        build_rag_index,
        rag_index_consistent,
        read_rag_marker,
    )
    from pyspec_spark.streaming.vectors import pq_lookup

    corpus = _corpus(spark, tmp_path)
    idx = str(tmp_path / "ragidx")
    rep = build_rag_index(spark, corpus, idx)
    assert rep["n_vectors"] > 0
    audit = rag_index_consistent(spark, corpus, idx)
    assert audit["consistent"], audit
    assert read_rag_marker(idx)["version"] == 1
    # serve: query with the embedding of the first chunk; results are
    # decodable chunk keys
    from pyspec_spark.lake import lake_read

    qv = (
        lake_read(spark, f"{idx}/vecs")
        .orderBy("vec_id")
        .limit(1)
        .collect()[0]["embedding"]
    )
    hits = pq_lookup(spark, idx, list(qv), k=5, nprobe=2, shortlist=16)
    rows = hits.collect()
    assert len(rows) == 5
    for r in rows:
        doc_id, chunk_id = (
            r["vec_id"] >> _CHUNK_BITS,
            r["vec_id"] % (1 << _CHUNK_BITS),
        )
        assert 0 <= doc_id < 20 and chunk_id >= 0
    # a second build refuses
    with pytest.raises(ValueError, match="already holds"):
        build_rag_index(spark, corpus, idx)


def test_extend_equals_frozen_model_rebuild(spark, tmp_path):
    """The incremental contract: after an insert delta, the extended
    index's CURRENT tables equal a from-scratch build at the new
    version under the ORIGINAL (frozen) models."""
    from pyspec_spark.lake import lake_append, lake_read
    from pyspec_spark.operators.rag import (
        _chunk_vectors,
        build_rag_index,
        extend_rag_index,
        rag_index_consistent,
        read_rag_marker,
    )
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        load_centroids,
        load_pq_codebooks,
    )

    corpus = _corpus(spark, tmp_path)
    idx = str(tmp_path / "ragidx")
    build_rag_index(spark, corpus, idx)
    lake_append(spark, corpus, _delta_docs(spark, 1000, 1008), "source")
    rep = extend_rag_index(spark, corpus, idx)
    assert rep["inserted"] > 0 and rep["deleted"] == 0
    audit = rag_index_consistent(spark, corpus, idx)
    assert audit["consistent"], audit

    # from-scratch twin under the frozen models
    mk = read_rag_marker(idx)
    cids, mat = load_centroids(idx)
    cb_rows = [(int(c), [float(x) for x in mat[i]]) for i, c in enumerate(cids)]
    m, subd, cb = load_pq_codebooks(idx)
    twin = str(tmp_path / "twin")
    vecs = _chunk_vectors(
        lake_read(spark, corpus), mk["dim"], mk["chunk"], mk["stride"]
    )
    build_pq_lake(spark, twin, vecs, cb_rows, cb, m=m, subd=subd)

    def codes_rows(root):
        df = lake_read(spark, f"{root}/codes")
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    assert codes_rows(idx) == codes_rows(twin)
    vecs_ids = lambda root: sorted(  # noqa: E731
        (r["vec_id"], r["cid"])
        for r in lake_read(spark, f"{root}/vecs").collect()
    )
    assert vecs_ids(idx) == vecs_ids(twin)


def test_delete_and_update_propagate(spark, tmp_path):
    from pyspec_spark.lake import lake_delete, lake_read, lake_upsert
    from pyspec_spark.operators.rag import (
        _CHUNK_BITS,
        build_rag_index,
        extend_rag_index,
        rag_index_consistent,
    )

    corpus = _corpus(spark, tmp_path)
    idx = str(tmp_path / "ragidx")
    build_rag_index(spark, corpus, idx)

    # delete two docs + rewrite one (update -> delete+insert)
    lake_delete(
        spark,
        corpus,
        spark.createDataFrame([(2,), (5,)], "doc_id BIGINT"),
        key="doc_id",
        partition_col="source",
    )
    upd = lake_read(spark, corpus).where(F.col("doc_id") == 7).select(
        "doc_id", "source", F.concat(F.lit("changed "), "text").alias("text")
    )
    lake_upsert(spark, corpus, upd, "doc_id", "source")

    rep = extend_rag_index(spark, corpus, idx)
    assert rep["deleted"] > 0 and rep["inserted"] > 0
    audit = rag_index_consistent(spark, corpus, idx)
    assert audit["consistent"], audit
    # no chunk of doc 2 or 5 survives in either table
    for sub in ("codes", "vecs"):
        surv = (
            lake_read(spark, f"{idx}/{sub}")
            .where(
                (F.col("vec_id") >= 2 * (1 << _CHUNK_BITS))
                & (F.col("vec_id") < 3 * (1 << _CHUNK_BITS))
                | (F.col("vec_id") >= 5 * (1 << _CHUNK_BITS))
                & (F.col("vec_id") < 6 * (1 << _CHUNK_BITS))
            )
            .count()
        )
        assert surv == 0, sub


def test_extend_without_marker_refuses(spark, tmp_path):
    from pyspec_spark.operators.rag import extend_rag_index

    with pytest.raises(ValueError, match="no RAG marker"):
        extend_rag_index(
            spark, str(tmp_path / "c"), str(tmp_path / "nothing")
        )
