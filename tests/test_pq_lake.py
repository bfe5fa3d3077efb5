"""L5e — PQ-coded maintained vector lake (r13).

The production IVFADC layout over the snapshot lake: codes table (hot)
+ raw-vector table (cold, fetch-bucketed), serve = probe -> ADC over
code files -> shortlist -> bloom-pruned raw fetch -> exact re-rank.
Pins here: the numpy ground-truth replay (unfiltered, filtered, and
post-delete), the inputFiles/bytes gates (ADC never opens a vector
file; the raw fetch is bounded by the shortlist's bloom matches, not
the probed cells), the stream==batch twin, and the frozen-codebook
write-once contract.  The oracle-gated face is q_ann_lake_pq
(queries/lake_queries.py).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF

_M, _SUBD, _K = 4, 16, 16
_IVF_K = 8


def _emb_rows(spark):
    from pyspec_spark.tables import table

    e = table(spark, SF, "embeddings").select("vec_id", "embedding", "label")
    rows = sorted(e.collect(), key=lambda r: int(r["vec_id"]))
    ids = np.array([int(r["vec_id"]) for r in rows])
    X = np.array(
        [[float(v) for v in r["embedding"]] for r in rows], dtype=np.float64
    )
    labels = np.array([int(r["label"]) for r in rows])
    return e, ids, X, labels


def _models(spark, e):
    from pyspec_spark.operators.similarity import pq_codebooks_firstk_df

    cb_rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.where(F.col("vec_id") < _IVF_K)
        .select("vec_id", "embedding")
        .collect()
    )
    pq = pq_codebooks_firstk_df(e, m=_M, subd=_SUBD, k=_K).collect()[0]
    cb = [pq[f"cb{mi}"] for mi in range(_M)]
    return cb_rows, cb


def _replay(root, ids, X, labels, qv, k, nprobe, shortlist, cb_rows, cb,
            deleted_mask=None, label_eq=None):
    """Driver-side ground truth of the full IVFADC serve."""
    from pyspec_spark.streaming.vectors import probe_cells

    C = np.array([v for _, v in cb_rows])
    cid = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    probed = probe_cells(root, qv, nprobe)
    cand = np.isin(cid, probed)
    if deleted_mask is not None:
        cand &= ~deleted_mask
    if label_eq is not None:
        cand &= labels == label_eq
    codes = np.zeros((len(X), _M), dtype=int)
    lut = np.zeros((_M, len(cb[0])))
    q = np.asarray(qv)
    for mi in range(_M):
        CB = np.array(cb[mi])
        sub = X[:, mi * _SUBD : (mi + 1) * _SUBD]
        codes[:, mi] = ((sub[:, None, :] - CB[None, :, :]) ** 2).sum(-1).argmin(1)
        lut[mi] = ((q[mi * _SUBD : (mi + 1) * _SUBD][None, :] - CB) ** 2).sum(-1)
    adc = np.array(
        [
            round(sum(lut[mi][codes[i, mi]] for mi in range(_M)), 6)
            for i in range(len(X))
        ]
    )
    order = sorted(np.where(cand)[0], key=lambda i: (adc[i], ids[i]))
    short = order[:shortlist]

    def micro_dot(v):
        tot = 0
        for t in np.asarray(v) * q:
            t6 = t * 1e6
            tot += int(t6 + 0.5) if t6 >= 0 else -int(0.5 - t6)
        return tot

    rer = sorted(
        ((micro_dot(X[i]), int(ids[i]), int(cid[i])) for i in short),
        key=lambda t: (-t[0], t[1]),
    )[:k]
    n_cand = int(cand.sum())
    return [(i, c, d, n_cand) for d, i, c in rer]


def test_pq_lookup_matches_replay_with_deletes(spark, tmp_path):
    """Unfiltered serve over the pair AFTER the ST11c delete equals the
    ground-truth replay exactly — assignment, encode, ADC rounding,
    shortlist boundary, micro-unit re-rank, and the n_cand witness."""
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        delete_vectors_pq,
        pq_lookup,
    )

    e, ids, X, labels = _emb_rows(spark)
    cb_rows, cb = _models(spark, e)
    root = str(tmp_path / "pq_del")
    build_pq_lake(
        spark, root, e.select("vec_id", "embedding"), cb_rows, cb,
        m=_M, subd=_SUBD,
    )
    delete_vectors_pq(
        spark, root, e.where(F.col("vec_id") % 7 == 3).select("vec_id")
    )
    qv = cb_rows[0][1]
    got = [
        (int(r["vec_id"]), int(r["cid"]), int(r["dot_micro"]), int(r["n_cand"]))
        for r in pq_lookup(
            spark, root, qv, k=10, nprobe=2, shortlist=32
        ).collect()
    ]
    want = _replay(
        root, ids, X, labels, qv, 10, 2, 32, cb_rows, cb,
        deleted_mask=(ids % 7 == 3),
    )
    assert got == want and len(got) == 10
    assert all(i % 7 != 3 for i, *_ in got)


def test_pq_filtered_lookup_cluster_col_composes(spark, tmp_path):
    """S6e composition: codes built with cluster_col='label' serve a
    label-filtered lookup with PRE-filtering semantics (n_cand shrinks
    to the label's share, results equal the filtered replay), and the
    label predicate prunes code FILES inside each probed cell."""
    from pyspec_spark.lake import lake_scan_file_counts
    from pyspec_spark.streaming.vectors import build_pq_lake, pq_lookup

    e, ids, X, labels = _emb_rows(spark)
    cb_rows, cb = _models(spark, e)
    root = str(tmp_path / "pq_lbl")
    build_pq_lake(
        spark, root, e, cb_rows, cb, m=_M, subd=_SUBD, cluster_col="label"
    )
    qv = cb_rows[0][1]
    target = int(labels[0])
    got = [
        (int(r["vec_id"]), int(r["cid"]), int(r["dot_micro"]), int(r["n_cand"]))
        for r in pq_lookup(
            spark, root, qv, k=10, nprobe=2, shortlist=32,
            where=[("label", "=", target)],
        ).collect()
    ]
    want = _replay(
        root, ids, X, labels, qv, 10, 2, 32, cb_rows, cb, label_eq=target
    )
    assert got == want and len(got) > 0

    # clustered code files: the label predicate drops files exactly
    kept, total = lake_scan_file_counts(
        os.path.join(root, "codes"), [("label", "=", target)]
    )
    n_labels = len(set(labels.tolist()))
    assert total > kept and kept <= total // max(2, n_labels - 1)


def test_pq_serve_bytes_bounded_by_codes_and_shortlist(spark, tmp_path):
    """THE r13 scale gate (VERDICT #1): (a) the serve plan's vector-
    table reads are bounded by the SHORTLIST's bloom matches — fewer
    files than the probed cells hold, every one inside the probed
    cells; (b) the ADC scan opens code files only, and the codes table
    is structurally smaller than the vector table (>=4x here); (c) no
    vector file outside the allowed fetch set appears in the final
    plan's inputFiles."""
    from pyspec_spark.lake import lake_scan_in, latest_version, lake_scan
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        pq_lookup,
        probe_cells,
    )

    e, ids, X, labels = _emb_rows(spark)
    cb_rows, cb = _models(spark, e)
    root = str(tmp_path / "pq_bytes")
    # 16 fetch buckets + a tiny shortlist so bloom pruning is visible
    build_pq_lake(
        spark, root, e.select("vec_id", "embedding"), cb_rows, cb,
        m=_M, subd=_SUBD, fetch_buckets=16,
    )
    qv = cb_rows[0][1]
    out = pq_lookup(spark, root, qv, k=5, nprobe=2, shortlist=8)
    got = out.collect()
    assert len(got) == 5
    opened = {os.path.realpath(p.replace("file:", "")) for p in out.inputFiles()}

    probe = probe_cells(root, qv, 2)
    codes_root, vecs_root = os.path.join(root, "codes"), os.path.join(root, "vecs")
    codes_files = set()
    for cid in probe:
        for p in lake_scan(spark, codes_root, [("cid", "=", cid)]).inputFiles():
            codes_files.add(os.path.realpath(p.replace("file:", "")))
    cell_vec_files = set()
    for cid in probe:
        for p in lake_scan(spark, vecs_root, [("cid", "=", cid)]).inputFiles():
            cell_vec_files.add(os.path.realpath(p.replace("file:", "")))
    short_ids = sorted(
        i for i, *_ in _replay(root, ids, X, labels, qv, 8, 2, 8, cb_rows, cb)
    )
    fetch_files = {
        os.path.realpath(p.replace("file:", ""))
        for p in lake_scan_in(
            spark, vecs_root, [("vec_id", short_ids), ("cid", probe)]
        ).inputFiles()
    }

    vec_opened = opened & cell_vec_files
    # (a) shortlist-bounded: the raw fetch opened strictly fewer files
    # than the probed cells hold, all within them, all bloom-matched
    assert vec_opened == fetch_files
    assert len(fetch_files) < len(cell_vec_files)
    assert len(fetch_files) <= len(short_ids)
    # (c) nothing outside codes ∪ allowed fetch set
    assert opened <= (codes_files | fetch_files)

    # (b) structural at-rest shrink: codes bytes << vector bytes
    def _bytes(files):
        return sum(os.path.getsize(p) for p in files)

    assert latest_version(codes_root) == 1
    assert _bytes(codes_files) * 4 < _bytes(cell_vec_files)


def test_pq_stream_equals_batch(spark, tmp_path):
    """index_to_lake_pq over a 4-micro-batch availableNow stream serves
    IDENTICALLY to build_pq_lake over the same corpus, and both tables
    carry every vector exactly once (exactly-once watermark)."""
    from pyspec_spark.lake import lake_read
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        index_to_lake_pq,
        pq_lookup,
    )

    e, ids, X, labels = _emb_rows(spark)
    cb_rows, cb = _models(spark, e)

    src = str(tmp_path / "pq_src")
    e.select("vec_id", "embedding").repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sroot = str(tmp_path / "pq_stream")
    index_to_lake_pq(
        stream, spark, sroot, cb_rows, cb, m=_M, subd=_SUBD,
        checkpoint=str(tmp_path / "chk"),
    )
    broot = str(tmp_path / "pq_batch")
    build_pq_lake(
        spark, broot, e.select("vec_id", "embedding"), cb_rows, cb,
        m=_M, subd=_SUBD,
    )
    for sub in ("codes", "vecs"):
        sn = lake_read(spark, os.path.join(sroot, sub)).count()
        bn = lake_read(spark, os.path.join(broot, sub)).count()
        assert sn == bn == len(ids)

    qv = cb_rows[0][1]

    def serve(root):
        return [
            tuple(r)
            for r in pq_lookup(
                spark, root, qv, k=10, nprobe=2, shortlist=32
            ).collect()
        ]

    got, want = serve(sroot), serve(broot)
    assert got == want and len(got) == 10


def test_pq_codebooks_write_once(spark, tmp_path):
    """Frozen-codebook contract on the PQ side: re-saving the SAME
    codebooks is a no-op; different codebooks for the same root raise
    (codes at rest are only decodable against their codebooks)."""
    from pyspec_spark.streaming.vectors import (
        load_pq_codebooks,
        save_pq_codebooks,
    )

    root = str(tmp_path / "pq_once")
    cb = [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]
    save_pq_codebooks(root, 2, 2, cb)
    save_pq_codebooks(root, 2, 2, cb)  # idempotent
    assert load_pq_codebooks(root) == (2, 2, cb)
    with pytest.raises(ValueError, match="different PQ codebooks"):
        save_pq_codebooks(root, 2, 2, [[[9.0, 9.0], [3.0, 4.0]], cb[1]])


def test_pq_root_composes_with_publish_lifecycle(spark, tmp_path):
    """The PQ pair root is a first-class index root: publish_index /
    current_index / index_history / vacuum_indexes treat it exactly
    like a raw IVF root (it carries the centroids file the lifecycle
    keys on), so re-training a PQ index is the same build-new-root +
    atomic-swap + GC story as ST11."""
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        current_index,
        index_history,
        pq_lookup,
        publish_index,
        vacuum_indexes,
    )

    e, ids, X, labels = _emb_rows(spark)
    cb_rows, cb = _models(spark, e)
    base = str(tmp_path / "pq_base")
    r1 = os.path.join(base, "gen1")
    r2 = os.path.join(base, "gen2")
    for r in (r1, r2):
        build_pq_lake(
            spark, r, e.select("vec_id", "embedding"), cb_rows, cb,
            m=_M, subd=_SUBD,
        )
    publish_index(base, r1)
    assert os.path.realpath(current_index(base)) == os.path.realpath(r1)
    publish_index(base, r2)
    assert os.path.realpath(current_index(base)) == os.path.realpath(r2)
    assert [os.path.basename(p) for p in index_history(base)] == [
        "gen1", "gen2",
    ]

    # GC the superseded generation; the current root keeps serving
    removed = vacuum_indexes(base, keep=1, retention_seconds=0.0)
    assert [os.path.basename(p) for p in removed] == ["gen1"]
    assert not os.path.exists(r1)
    qv = cb_rows[0][1]
    got = pq_lookup(
        spark, current_index(base), qv, k=5, nprobe=2, shortlist=16
    ).collect()
    assert len(got) == 5


def test_reindex_pq_under_new_codebook_equals_scratch(spark, tmp_path):
    """Retrain symmetry with the raw index (reindex): re-encoding the
    stored vectors under NEW frozen models into a fresh root serves
    exactly like a from-scratch build over the same corpus — codes are
    derived data, only raw vectors are read for the retrain."""
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        pq_lookup,
        reindex_pq,
    )

    e, ids, X, labels = _emb_rows(spark)
    cb_rows, cb = _models(spark, e)
    old = str(tmp_path / "pq_old")
    build_pq_lake(
        spark, old, e.select("vec_id", "embedding"), cb_rows, cb,
        m=_M, subd=_SUBD,
    )

    # new models: centroids from vec_ids 8..15, codebooks from a
    # shifted first-K window — both differ from the originals
    from pyspec_spark.operators.similarity import pq_codebooks_firstk_df

    cents2 = sorted(
        (int(r["vec_id"]) - 8, [float(x) for x in r["embedding"]])
        for r in e.where((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
        .select("vec_id", "embedding")
        .collect()
    )
    pq2 = pq_codebooks_firstk_df(
        e.where(F.col("vec_id") >= 4), m=_M, subd=_SUBD, k=_K + 4
    ).collect()[0]
    cb2 = [pq2[f"cb{mi}"] for mi in range(_M)]

    new = str(tmp_path / "pq_new")
    reindex_pq(spark, old, new, cents2, cb2, m=_M, subd=_SUBD)
    scratch = str(tmp_path / "pq_scratch")
    build_pq_lake(
        spark, scratch, e.select("vec_id", "embedding"), cents2, cb2,
        m=_M, subd=_SUBD,
    )
    qv = cb_rows[0][1]

    def serve(root):
        return [
            tuple(r)
            for r in pq_lookup(
                spark, root, qv, k=10, nprobe=2, shortlist=32
            ).collect()
        ]

    got, want = serve(new), serve(scratch)
    assert got == want and len(got) == 10


def test_pq_batch_lookup_equals_per_query_serves(spark, tmp_path):
    """L5f: the batch serve must return, per qid, EXACTLY what the
    single-query serve returns for that vector — same shortlist
    boundary, same micro-unit ranking, same n_cand witness — while
    scanning the union of probed cells once.  Plan gates: the only
    windows are qid-partitioned (no global funnel), no cartesian."""
    from pyspec_spark.plans import physical_plan
    from pyspec_spark.streaming.vectors import (
        build_pq_lake,
        delete_vectors_pq,
        pq_batch_lookup,
        pq_lookup,
    )

    e, ids, X, labels = _emb_rows(spark)
    cb_rows, cb = _models(spark, e)
    root = str(tmp_path / "pq_batch")
    build_pq_lake(
        spark, root, e.select("vec_id", "embedding"), cb_rows, cb,
        m=_M, subd=_SUBD,
    )
    delete_vectors_pq(
        spark, root, e.where(F.col("vec_id") % 7 == 3).select("vec_id")
    )
    qs = [(int(i), [float(v) for v in X[list(ids).index(i)]]) for i in (0, 1, 5)]

    batch = pq_batch_lookup(spark, root, qs, k=7, nprobe=2, shortlist=16)
    got = {}
    for r in batch.collect():
        got.setdefault(int(r["qid"]), []).append(
            (int(r["vec_id"]), int(r["cid"]), int(r["dot_micro"]),
             int(r["n_cand"]))
        )
    for qid, vec in qs:
        want = [
            (int(r["vec_id"]), int(r["cid"]), int(r["dot_micro"]),
             int(r["n_cand"]))
            for r in pq_lookup(
                spark, root, vec, k=7, nprobe=2, shortlist=16
            ).collect()
        ]
        assert got[qid] == want and len(want) == 7, qid

    p = physical_plan(batch)
    assert "CartesianProduct" not in p
    lines = p.splitlines()
    for i, ln in enumerate(lines):
        if "SinglePartition" in ln:
            ctx = "\n".join(lines[max(0, i - 8) : i + 1])
            assert "Keys: []" in ctx, ctx
