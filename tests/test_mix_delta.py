"""L46d — versioned/incremental training mix (r13) + the epoch and
resume consumption faces.

Pins: extending a materialized mix with a corpus delta leaves every
already-written file BYTE-IDENTICAL (consumed-prefix invariance), the
extension fills the boundary shard then new shards (cross-version
shard-layout gate), resume-from-(shard, pos) returns exactly the
unconsumed suffix, epoch-0 equals the declared mix exactly, and later
epochs are distinct permutations of the SAME multiset.  The
oracle-gated faces are q_train_mix_delta / q_mix_alloc_drift
(queries/curation.py).
"""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF

_SHARD = 256


def _splits(spark):
    from pyspec_spark.queries.curation import _toks
    from pyspec_spark.tables import table

    d = table(spark, SF, "documents").select(
        "doc_id", "source", F.size(_toks()).alias("n_tokens")
    )
    split = F.pmod("doc_id", F.lit(4))
    return d, d.where(split != 3), d.where(split == 3)


def _file_md5s(path):
    out = {}
    for p in sorted(glob.glob(f"{path}/**/*.parquet", recursive=True)):
        with open(p, "rb") as f:
            out[os.path.relpath(p, path)] = hashlib.md5(f.read()).hexdigest()
    return out


def test_mix_delta_extends_without_touching_history(spark, tmp_path):
    """The version contract end-to-end: materialize v1, extend with
    q_train_mix_delta's rows — v1's files stay byte-identical, the
    combined read is v1's order followed by the extension (contiguous
    pos), every shard except the last holds exactly _SHARD rows, a
    consumed prefix reads identically before and after, and resume
    returns exactly the unconsumed suffix."""
    from pyspec_spark.operators.ordering import (
        extend_train_shards,
        read_train_shards,
        resume_train_shards,
        write_train_shards,
    )
    from pyspec_spark.queries.curation import (
        _alloc_micro_over,
        _replicate_order_shard,
        q_train_mix_delta,
    )

    d, base, delta = _splits(spark)
    v1 = _replicate_order_shard(
        base, _alloc_micro_over(base), "#epoch", "r13mixd#v1"
    )
    path = str(tmp_path / "mix_versions")
    write_train_shards(v1.drop("shard", "pos_in_shard"), path, _SHARD)
    before = _file_md5s(path)
    n_v1 = v1.count()
    prefix_shards = [0, 1]
    assert n_v1 > 2 * _SHARD, "fixture too small for a prefix pin"
    consumed_before = [
        (r["doc_id"], r["replica"], r["pos_in_shard"])
        for r in read_train_shards(spark, path, shards=prefix_shards).collect()
    ]

    ext = q_train_mix_delta.__wrapped__(spark, SF)
    ext_rows = ext.collect()
    # the extension starts exactly at |v1| and is contiguous
    assert [r["pos"] for r in ext_rows] == list(
        range(n_v1, n_v1 + len(ext_rows))
    )
    extend_train_shards(ext, path, _SHARD)

    # consumed-prefix invariance: nothing history-side changed
    after = _file_md5s(path)
    assert set(before) <= set(after)
    assert all(after[p] == h for p, h in before.items())
    assert len(after) > len(before)
    consumed_after = [
        (r["doc_id"], r["replica"], r["pos_in_shard"])
        for r in read_train_shards(spark, path, shards=prefix_shards).collect()
    ]
    assert consumed_after == consumed_before

    # cross-version shard layout: all full shards except the last
    sizes = {
        r["shard"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = n_v1 + len(ext_rows)
    assert sorted(sizes) == list(range((total + _SHARD - 1) // _SHARD))
    for sh, n in sizes.items():
        want = _SHARD if sh < total // _SHARD else total % _SHARD or _SHARD
        assert n == want, (sh, n, want)

    # the combined read replays v1's order then the extension
    combined = read_train_shards(spark, path)
    got = [(r["doc_id"], r["replica"]) for r in combined.collect()]
    want = [
        (r["doc_id"], r["replica"])
        for r in v1.orderBy("pos").collect()
    ] + [(r["doc_id"], r["replica"]) for r in ext_rows]
    assert got == want

    # resume-from-(shard, pos): exactly the unconsumed suffix
    cut = n_v1 + len(ext_rows) // 2
    sh, pis = cut // _SHARD, cut % _SHARD
    resumed = [
        (r["doc_id"], r["replica"])
        for r in resume_train_shards(spark, path, sh, pis).collect()
    ]
    assert resumed == want[cut + 1 :]


def test_mix_epoch_zero_equals_declared_and_epochs_permute(spark):
    """train_mix_epoch: epoch 0 IS q_train_mix (exact row set including
    positions); epoch 1 is a DIFFERENT permutation of the SAME
    (doc_id, replica) multiset with the same shard-size layout — the
    replication is never re-drawn, only the order seed moves."""
    from pyspec_spark.queries.curation import (
        _TMIX_SEED,
        _alloc_micro_over,
        q_epoch_alloc,
        q_train_mix,
        train_mix_epoch,
    )
    from pyspec_spark.tables import table

    d, _base, _delta = _splits(spark)
    docs = d.select("doc_id", "source")
    alloc = q_epoch_alloc.__wrapped__(spark, SF).select(
        "source",
        F.round(F.col("epochs") * 1_000_000, 0).cast("bigint").alias("_em"),
    )

    def rows(df):
        return sorted(
            (r["doc_id"], r["replica"], r["pos"]) for r in df.collect()
        )

    e0 = rows(train_mix_epoch(docs, alloc, "#epoch", _TMIX_SEED, 0))
    mix = rows(q_train_mix.__wrapped__(spark, SF))
    assert e0 == mix and len(e0) > 0

    e1 = rows(train_mix_epoch(docs, alloc, "#epoch", _TMIX_SEED, 1))
    assert e1 != e0  # a different permutation...
    assert sorted((i, r) for i, r, _ in e1) == sorted(
        (i, r) for i, r, _ in e0
    )  # ...of the SAME multiset
    assert sorted(p for *_, p in e1) == sorted(p for *_, p in e0)

    # and the alloc path used by the epochs equals the declared one
    own = {
        (r["source"], r["_em"])
        for r in _alloc_micro_over(d).collect()
    }
    declared = {(r["source"], r["_em"]) for r in alloc.collect()}
    assert own == declared


def test_mix_from_lake_cdc_lifecycle(spark, tmp_path):
    """The production L46d composition: the corpus lives in the
    snapshot lake, the delta is whatever COMMITS landed (lake CDC, not
    a modulo split).  Pins: materialize records the covered lake
    version; extend appends exactly the inserted docs' replicated
    order (offset = the marker's consumed count — no base recompute),
    leaves history files byte-identical, advances the marker, and is a
    no-op at the same version; an UPDATE commit refuses loudly; a
    second materialize into the same path refuses."""
    import pytest as _pytest

    import pyspec_spark.lake as lk
    from pyspec_spark.operators.ordering import read_train_shards
    from pyspec_spark.queries.curation import (
        _read_mix_marker,
        extend_mix_from_lake,
        materialize_mix_from_lake,
    )
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents").select("doc_id", "source", "text")
    split = F.pmod("doc_id", F.lit(4))
    root = str(tmp_path / "corpus_lake")
    v1 = lk.lake_append(
        spark, root, docs.where(split != 3), partition_col="source"
    )

    path = str(tmp_path / "lake_mix")
    n1 = materialize_mix_from_lake(spark, root, path, version=v1)
    assert _read_mix_marker(path)["lake_version"] == v1
    assert n1 > 0
    with _pytest.raises(ValueError, match="already holds"):
        materialize_mix_from_lake(spark, root, path, version=v1)
    assert extend_mix_from_lake(spark, root, path) == 0  # lake unmoved

    before = _file_md5s(path)
    lk.lake_append(
        spark, root, docs.where(split == 3), partition_col="source"
    )
    n_ext = extend_mix_from_lake(spark, root, path)
    assert n_ext > 0
    m = _read_mix_marker(path)
    assert m["lake_version"] == lk.latest_version(root)
    assert m["rows"] == n1 + n_ext

    # history untouched; combined order is contiguous and complete
    after = _file_md5s(path)
    assert all(after[p] == h for p, h in before.items())
    got = read_train_shards(spark, path)
    total = got.count()
    assert total == n1 + n_ext
    poss = [r["shard"] * 256 + r["pos_in_shard"] for r in got.collect()]
    assert poss == list(range(total))
    # the extension rows are exactly the delta docs' replicas
    ext_docs = {
        r["doc_id"]
        for r in spark.read.parquet(path).where(F.col("pos") >= n1).collect()
    }
    want_docs = {
        r["doc_id"] for r in docs.where(split == 3).select("doc_id").collect()
    }
    assert ext_docs <= want_docs and len(ext_docs) > 0

    # a mutated history doc refuses: upsert changes one doc's text
    one = docs.where(split != 3).limit(1).select(
        "doc_id", "source", F.lit("REWRITTEN").alias("text")
    )
    lk.lake_upsert(spark, root, one, key="doc_id", partition_col="source")
    with _pytest.raises(ValueError, match="non-insert"):
        extend_mix_from_lake(spark, root, path)


def test_mix_extend_version_lock(spark, tmp_path):
    """The L46d concurrency seam: two extenders racing to the same
    target version would BOTH append the delta's rows — the loser must
    refuse BEFORE writing (os.link CAS, the index/lake maintenance
    discipline).  A held lock (a mid-flight or crashed extender)
    blocks loudly; a failed/refused extension releases it."""
    import os

    import pytest as _pytest

    import pyspec_spark.lake as lk
    from pyspec_spark.queries.curation import (
        _read_mix_marker,
        extend_mix_from_lake,
        materialize_mix_from_lake,
    )
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents").select("doc_id", "source", "text")
    split = F.pmod("doc_id", F.lit(4))
    root = str(tmp_path / "lock_lake")
    v1 = lk.lake_append(
        spark, root, docs.where(split != 3), partition_col="source"
    )
    path = str(tmp_path / "lock_mix")
    n1 = materialize_mix_from_lake(spark, root, path, version=v1)
    lk.lake_append(
        spark, root, docs.where(split == 3), partition_col="source"
    )
    v2 = lk.latest_version(root)

    # simulate the mid-flight extender: lock held, marker not advanced
    lock = os.path.join(path, f".mix-txn-v{v2}.lock")
    with open(lock, "w") as f:
        f.write("held")
    before = _file_md5s(path)
    with _pytest.raises(ValueError, match="owned by another extender"):
        extend_mix_from_lake(spark, root, path)
    assert _file_md5s(path) == before  # loser wrote NOTHING
    assert _read_mix_marker(path)["rows"] == n1

    # the crashed extender is repaired (lock removed) -> extend lands
    os.unlink(lock)
    assert extend_mix_from_lake(spark, root, path) > 0
    assert not os.path.exists(lock)  # released on publish


def test_mix_drift_from_lake_matches_declared_shape(spark, tmp_path):
    """mix_drift_from_lake over the real artifact agrees with the
    declared q_mix_alloc_drift arithmetic computed on the same two
    corpora — one definition of the allocation, two faces."""
    import pyspec_spark.lake as lk
    from pyspec_spark.queries.curation import (
        _alloc_micro_over,
        _toks,
        materialize_mix_from_lake,
        mix_drift_from_lake,
    )
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents").select("doc_id", "source", "text")
    split = F.pmod("doc_id", F.lit(4))
    root = str(tmp_path / "drift_lake")
    v1 = lk.lake_append(
        spark, root, docs.where(split != 3), partition_col="source"
    )
    path = str(tmp_path / "drift_mix")
    materialize_mix_from_lake(spark, root, path, version=v1)
    lk.lake_append(
        spark, root, docs.where(split == 3), partition_col="source"
    )

    got = {
        r["source"]: (r["em_base"], r["em_full"], r["drift_micro"],
                      r["is_new"])
        for r in mix_drift_from_lake(spark, root, path).collect()
    }
    tok = docs.select("doc_id", "source", F.size(_toks()).alias("n_tokens"))
    a1 = {
        r["source"]: r["_em"]
        for r in _alloc_micro_over(tok.where(split != 3)).collect()
    }
    a2 = {r["source"]: r["_em"] for r in _alloc_micro_over(tok).collect()}
    want = {
        s: (a1.get(s, 0), a2.get(s, 0), a2.get(s, 0) - a1.get(s, 0),
            s not in a1)
        for s in set(a1) | set(a2)
    }
    assert got == want and len(got) > 0
