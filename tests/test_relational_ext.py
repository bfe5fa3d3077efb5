"""Invariant tests for the round-2 relational completions
(`pyspec_spark/queries/relational_ext.py`): pivot/unpivot consistency,
ordered string agg, exact correlation bounds, deterministic sampling,
range frames, and discrete percentiles."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from pyspec_spark import registry
from pyspec_spark.tables import table

SF = "/root/testdata/sf0.001"

registry.load_all()


def _run(spark, name, sf=SF):
    builder = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
    return builder(spark, sf)


def test_pivot_marginals_match_flat_groupby(spark):
    rows = {r["l_returnflag"]: r for r in _run(spark, "q_pivot").collect()}
    flat = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in table(spark, SF, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for flag, r in rows.items():
        assert r["n_F"] == (flat[(flag, "F")]["n"] if (flag, "F") in flat else 0)
        assert r["n_O"] == (flat[(flag, "O")]["n"] if (flag, "O") in flat else 0)


def test_unpivot_is_melt_of_wide(spark):
    long = _run(spark, "q_unpivot").collect()
    assert {r["metric"] for r in long} == {"sum_qty", "sum_price"}
    # one row per (flag, metric)
    keys = [(r["l_returnflag"], r["metric"]) for r in long]
    assert len(keys) == len(set(keys))


def test_listagg_is_sorted_and_complete(spark):
    for r in _run(spark, "q_listagg").collect():
        names = r["nations_csv"].split(",")
        assert names == sorted(names)
        assert len(names) == r["n_nations"]


def test_corr_bounds_and_pandas_parity(spark):
    rows = _run(spark, "q_corr").collect()
    pdf = (
        table(spark, SF, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount")
        .toPandas()
    )
    for r in rows:
        assert -1.0 <= r["corr_qty_disc"] <= 1.0
        g = pdf[pdf["l_returnflag"] == r["l_returnflag"]]
        ref = g["l_quantity"].corr(g["l_discount"])
        assert math.isclose(r["corr_qty_disc"], ref, abs_tol=1e-4)


def test_grouping_sets_contains_rollup_levels(spark):
    rows = _run(spark, "q_grouping_sets").collect()
    grand = [r for r in rows if r["r_name"] is None and r["n_name"] is None]
    per_nation = [r for r in rows if r["r_name"] is None and r["n_name"] is not None]
    assert len(grand) == 1
    assert grand[0]["n_cust"] == table(spark, SF, "customer").count()
    assert sum(r["n_cust"] for r in per_nation) == grand[0]["n_cust"]


def test_window_range_matches_pandas_one_group(spark):
    out = (
        _run(spark, "q_window_range")
        .where(F.col("l_suppkey") == 1)
        .collect()
    )
    src = (
        table(spark, SF, "lineitem")
        .where(F.col("l_suppkey") == 1)
        .select(
            F.col("l_quantity").cast("bigint").alias("qty_i"), "l_extendedprice"
        )
        .toPandas()
    )
    for r in out:
        frame = src[(src["qty_i"] >= r["qty_i"] - 5) & (src["qty_i"] <= r["qty_i"])]
        assert r["range_n"] == len(frame)
        ref = float((frame["l_extendedprice"] * 1e6).round().sum() / 1e6)
        assert math.isclose(r["range_price"], ref, abs_tol=1e-6)


def test_hash_sample_fraction_and_determinism(spark):
    total = table(spark, SF, "lineitem").count()
    a = sorted(map(tuple, _run(spark, "q_hash_sample").collect()))
    b = sorted(map(tuple, _run(spark, "q_hash_sample").collect()))
    assert a == b  # same sample on every run
    n = sum(r[1] for r in a)
    # band '00'..'19' of 256 = 10.2 % expected; generous tolerance at sf0.001
    assert 0.04 < n / total < 0.18


def test_stratified_sample_k_per_stratum(spark):
    pdf = pd.DataFrame(
        [r.asDict() for r in _run(spark, "q_sample_stratified").collect()]
    )
    sizes = pdf.groupby("l_returnflag").size()
    assert (sizes <= 5).all() and (sizes >= 1).all()
    # picked rows are the k smallest content hashes per stratum
    li = table(spark, SF, "lineitem")
    pick = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        )
    )
    for flag, g in pdf.groupby("l_returnflag"):
        lows = (
            li.where(F.col("l_returnflag") == flag)
            .select(pick.alias("pick"))
            .orderBy("pick")
            .limit(len(g))
            .collect()
        )
        assert sorted(g["pick"]) == [r["pick"] for r in lows]


def test_percentile_disc_ordering_and_membership(spark):
    qty = {
        float(r["l_quantity"])
        for r in table(spark, SF, "lineitem").select("l_quantity").collect()
    }
    for r in _run(spark, "q_percentile_disc").collect():
        assert r["p25"] <= r["p50"] <= r["p75"]
        for p in ("p25", "p50", "p75"):
            assert float(r[p]) in qty  # discrete: values present in the data


def test_term_stats_df_bounded_and_idf_monotone(spark):
    rows = _run(spark, "q_term_stats").collect()
    n_docs = table(spark, SF, "documents").count()
    by_df = sorted(rows, key=lambda r: r["df"])
    for r in rows:
        assert 1 <= r["df"] <= n_docs
        assert r["total_tf"] >= r["df"]  # a doc counted in df has tf >= 1
    # idf strictly decreases as df increases
    for a, b in zip(by_df, by_df[1:]):
        if a["df"] < b["df"]:
            assert a["idf"] > b["idf"]


def test_tfidf_topk_is_3_per_doc_and_ordered(spark):
    pdf = pd.DataFrame(r.asDict() for r in _run(spark, "q_tfidf_topk").collect())
    sizes = pdf.groupby("doc_id").size()
    assert (sizes <= 3).all()
    n_docs = table(spark, SF, "documents").count()
    assert len(sizes) == n_docs  # every doc has at least one term
    for _, g in pdf.groupby("doc_id"):
        vals = list(g.sort_values(["tfidf", "term"], ascending=[False, True])["tfidf"])
        assert vals == sorted(vals, reverse=True)


def test_embed_cov_matches_numpy(spark):
    import numpy as np

    rows = _run(spark, "q_embed_cov").collect()
    emb = np.array(
        [
            r["embedding"][:16]
            for r in table(spark, SF, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    ref = np.cov(emb, rowvar=False)  # sample covariance (ddof=1)
    assert len(rows) == 16 * 17 // 2
    n = emb.shape[0]
    for r in rows:
        assert r["n"] == n
        assert r["cov_den"] == n * (n - 1)
        # r8 integer contract: num == n*m2*1e6 - s_i*s_j exactly
        assert r["cov_num"] == n * r["m2"] * 10**6 - r["s_i"] * r["s_j"]
        cov = r["cov_num"] / r["cov_den"] / 1e12
        # exact-sum path quantizes products to 1e-6: tolerance ~1e-4
        assert abs(cov - ref[r["i"] - 1, r["j"] - 1]) < 1e-4
        # raw integer moments sit near their float counterparts
        assert abs(r["s_i"] / 1e6 - emb[:, r["i"] - 1].sum()) < 1e-3
    # diagonal entries are variances: non-negative
    assert all(r["cov_num"] >= 0 for r in rows if r["i"] == r["j"])


def test_embed_cov_oracle_basis_is_bigint_micro_units():
    """Regression pin for the r6/r7 driver hash-flakes: the covariance
    oracle must never route a declared value through a DECIMAL/HUGEINT
    accumulator's ->DOUBLE conversion (off by an ulp on some DuckDB
    builds) NOR through a multi-op float chain feeding a terminal round.
    r8 contract: the declared covariance is a pure-integer pair
    (cov_num, cov_den) — integer columns hash identically on any build —
    and every SUM is re-cast to BIGINT before any further arithmetic,
    with products widened through HUGEINT (exact integer math).  The
    reused PCA oracle re-derives its double cov ONLY via the
    correctly-rounded BIGINT->DOUBLE path with a scale-0 terminal
    round."""
    from pyspec_spark.queries.arrays import _EMBED_COV_ORACLE
    from pyspec_spark.queries.ml import _pca_oracle

    for sql in (_EMBED_COV_ORACLE, _pca_oracle()):
        assert "DECIMAL" not in sql.upper()
    # no float column in the covariance result: every declared column is
    # an integer, and the sums are BIGINT-re-cast before arithmetic
    assert "AS DOUBLE) / 1e6" not in _EMBED_COV_ORACLE
    assert "AS BIGINT) AS s" in _EMBED_COV_ORACLE
    assert "AS BIGINT) AS m2" in _EMBED_COV_ORACLE
    assert "AS HUGEINT" in _EMBED_COV_ORACLE
    assert "AS cov_num" in _EMBED_COV_ORACLE
    assert "AS cov_den" in _EMBED_COV_ORACLE
    # PCA re-derivation: BIGINT->DOUBLE (int64, not hugeint) + scale-0 round
    assert "CAST(cov_num AS DOUBLE) / CAST(cov_den AS DOUBLE) / 1e6" in _pca_oracle()
    assert "* 1e6) / 1e6 AS pc1" in _pca_oracle()


def test_kmeans2_matches_numpy_lloyd(spark):
    import numpy as np

    rows = _run(spark, "q_kmeans2").collect()
    emb = np.array(
        sorted(
            (
                (r["vec_id"], r["embedding"][:8])
                for r in table(spark, SF, "embeddings")
                .select("vec_id", "embedding")
                .collect()
            )
        ),
        dtype=object,
    )
    X = np.array([e for _, e in emb], dtype=np.float64)
    ids = np.array([i for i, _ in emb])
    C = X[ids < 4].copy()
    for _ in range(2):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        asg = d.argmin(axis=1)  # ties -> lowest cid, same as struct-min
        C = np.array([X[asg == k].mean(axis=0) for k in range(4)])
    sizes = {k: int((asg == k).sum()) for k in range(4)}
    got_sizes = {r["cid"]: r["n_members"] for r in rows}
    for k in range(4):
        assert got_sizes.get(k, 0) == sizes[k]
    for r in rows:
        # engine means are micro-quantized per channel per iteration
        assert abs(r["centroid_v"] - C[r["cid"], r["channel"] - 1]) < 1e-3


def test_approx_quantile_rank_error_bound(spark):
    """The sketch's contract: each reported quantile's RANK in the
    exact sorted data is within n/accuracy of the target rank."""
    from pyspec_spark.queries.relational_ext import (
        _AQ_ACCURACY,
        q_approx_quantile,
    )
    from pyspec_spark.tables import table

    got = {r["l_returnflag"]: r for r in
           q_approx_quantile.__wrapped__(spark, SF).collect()}
    li = table(spark, SF, "lineitem").select("l_returnflag", "l_extendedprice")
    by_flag: dict[str, list[float]] = {}
    for r in li.collect():
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    import bisect

    for flag, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        assert got[flag]["n_rows"] == n
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            v = got[flag][col]
            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target = q * n
            tol = max(n / _AQ_ACCURACY, 1.0)
            assert lo - tol <= target <= hi + tol, (flag, q, v, lo, hi, n)


def test_weighted_sample_bias_and_layout_independence(spark):
    """Efraimidis–Spirakis sampling: (a) selection is biased toward
    heavier docs (sampled mean n_chars > corpus mean), (b) the sample
    is a pure function of content — a repartitioned input yields the
    identical sample."""
    from pyspec_spark.queries.relational_ext import q_weighted_sample
    from pyspec_spark.tables import table

    rows = q_weighted_sample.__wrapped__(spark, SF).collect()
    assert len(rows) == 25
    sampled_mean = sum(r["n_chars"] for r in rows) / len(rows)
    docs = table(spark, SF, "documents").select("doc_id", "n_chars")
    corpus_mean = (
        docs.agg({"n_chars": "avg"}).collect()[0][0]
    )
    assert sampled_mean > corpus_mean, (sampled_mean, corpus_mean)

    # layout independence: same keys/sample from a repartitioned input
    import pyspec_spark.queries.relational_ext as rx

    orig_table = rx.table
    try:
        rx.table = lambda s, d, n: orig_table(s, d, n).repartition(7)
        rows2 = q_weighted_sample.__wrapped__(spark, SF).collect()
    finally:
        rx.table = orig_table
    assert [(r["doc_id"], r["es_key"]) for r in rows] == [
        (r["doc_id"], r["es_key"]) for r in rows2
    ]


def test_inverted_index_postings_decode_to_exact_doc_lists(spark):
    """Delta-decoding every posting list reproduces the exact sorted
    doc_id list per term, tf entries match a direct recount, and df/cf
    are consistent with the decoded lists."""
    from collections import defaultdict

    from pyspec_spark.tables import table

    rows = _run(spark, "q_inverted_index").collect()
    truth: dict[str, dict[int, int]] = defaultdict(dict)
    for r in table(spark, SF, "documents").select("doc_id", "text").collect():
        for t in r["text"].split(" "):
            truth[t][r["doc_id"]] = truth[t].get(r["doc_id"], 0) + 1
    assert {r["term"] for r in rows} == set(truth)
    for r in rows:
        doc_ids, tfs, acc = [], [], 0
        for entry in r["postings"].split(","):
            gap, tf = entry.split(":")
            acc += int(gap)
            doc_ids.append(acc)
            tfs.append(int(tf))
        want = sorted(truth[r["term"]])
        assert doc_ids == want
        assert tfs == [truth[r["term"]][d] for d in want]
        assert r["df"] == len(want)
        assert r["cf"] == sum(tfs)


def test_index_lookup_round_trips_through_postings(spark):
    """The decode path reproduces exactly the docs containing each
    looked-up term, with the correct per-doc tf — i.e. the index format
    round-trips inside the engine."""
    from pyspec_spark.queries.text_ranking import _LOOKUP_TERMS

    from pyspec_spark.tables import table

    rows = _run(spark, "q_index_lookup").collect()
    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    for t in _LOOKUP_TERMS:
        want = {
            d["doc_id"]: d["text"].split(" ").count(t)
            for d in docs
            if t in d["text"].split(" ")
        }
        got = {r["doc_id"]: r["tf"] for r in rows if r["term"] == t}
        assert got == want
