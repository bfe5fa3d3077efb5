"""Property-based tests (SURVEY.md §5.2 layer 3, Hypothesis):

- SPEC parser round-trip: emit random scan blocks -> parse -> equality
- grid invariants: voxel occupancy sums to row count; 2-D cut of the 3-D
  grid equals the direct 2-D aggregation
- exact-dedup idempotence
- bucketed range join == naive theta join for arbitrary intervals/widths
- as-of join == pandas merge_asof ground truth

Spark examples are bounded (max_examples small, deadline off) — each
example runs distributed jobs."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# SPEC parser round-trip (pure Python — generous example budget)
# ---------------------------------------------------------------------------

_names = st.lists(
    st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8),
    min_size=1,
    max_size=6,
    unique=True,
)
_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
).map(lambda v: float(f"{v:.6g}"))  # SPEC text carries %.6g precision


@given(
    scan_no=st.integers(min_value=1, max_value=9999),
    cols=_names,
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_spec_block_roundtrip(scan_no, cols, data):
    from pyspec_spark.sources.spec_format import parse_scan_block

    n_rows = data.draw(st.integers(min_value=0, max_value=12))
    rows = [
        [data.draw(_floats) for _ in cols] for _ in range(n_rows)
    ]
    block_lines = [f"#S {scan_no} ascan th 0 1 {max(n_rows - 1, 1)} 1"]
    block_lines.append("#T 1 (Seconds)")
    block_lines.append("#N %d" % len(cols))
    block_lines.append("#L " + "  ".join(cols))
    for r in rows:
        block_lines.append(" ".join(f"{v:.6g}" for v in r))
    scan = parse_scan_block("\n".join(block_lines) + "\n", [])
    assert scan.scan_number == scan_no
    assert scan.columns == list(cols)
    assert len(scan.data) == n_rows
    for got, want in zip(scan.data, rows):
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-5, abs=1e-12)


# ---------------------------------------------------------------------------
# SPEC parser quirk corners (SURVEY §7 risk 2): duplicate scan numbers,
# aborted scans (#C), and @A continuation wrapping across lines — the
# generator emits files exercising all three, round-tripped through
# index_scans + parse_scan_block.
# ---------------------------------------------------------------------------

_mca_floats = st.floats(
    min_value=0, max_value=1e5, allow_nan=False, allow_infinity=False
).map(lambda v: float(f"{v:.6g}"))


@given(data=st.data())
@settings(max_examples=150, deadline=None)
def test_spec_quirks_roundtrip(data):
    from pyspec_spark.sources.spec_format import index_scans, parse_scan_block

    n_scans = data.draw(st.integers(min_value=1, max_value=4))
    # duplicate scan numbers: drawn from a 2-value pool, so collisions
    # are common; each block must still index + parse independently
    scan_numbers = [
        data.draw(st.sampled_from([1, 2])) for _ in range(n_scans)
    ]
    cols = ["Theta", "Detector", "Monitor"]
    emitted = []
    text = "#F quirks.dat\n#E 1000\n#O0 m1  m2\n\n"
    for sn in scan_numbers:
        n_rows = data.draw(st.integers(min_value=0, max_value=6))
        rows = [[data.draw(_floats) for _ in cols] for _ in range(n_rows)]
        abort_after = (
            data.draw(st.integers(min_value=0, max_value=n_rows))
            if data.draw(st.booleans())
            else None
        )
        # per-row MCA arrays, wrapped across continuation lines at a
        # random chunk width (the @A ... \\ quirk)
        mcas = []
        for _ in range(n_rows):
            if data.draw(st.booleans()):
                vals = [
                    data.draw(_mca_floats)
                    for _ in range(data.draw(st.integers(1, 12)))
                ]
                mcas.append(vals)
            else:
                mcas.append(None)
        block = [f"#S {sn} ascan th 0 1 {max(n_rows - 1, 1)} 1"]
        block.append("#D Thu Feb 24 14:05:35 2011")
        block.append("#T 1 (Seconds)")
        block.append("#N %d" % len(cols))
        block.append("#L " + "  ".join(cols))
        emitted_abort = False
        for i, r in enumerate(rows):
            if abort_after == i:
                block.append(f"#C Scan aborted after {i} points.")
                emitted_abort = True
            block.append(" ".join(f"{v:.6g}" for v in r))
            if mcas[i] is not None:
                chunk = data.draw(st.integers(min_value=1, max_value=4))
                vals = [f"{v:.6g}" for v in mcas[i]]
                pieces = [
                    " ".join(vals[j : j + chunk])
                    for j in range(0, len(vals), chunk)
                ]
                block.append("@A " + " \\\n ".join(pieces))
        if abort_after == n_rows:  # abort marker after the last point
            block.append(f"#C Scan aborted after {n_rows} points.")
            emitted_abort = True
        text += "\n".join(block) + "\n"
        emitted.append((sn, rows, mcas, emitted_abort))

    idx = index_scans(text)
    # every emitted block is indexed, in file order, duplicates kept
    assert [sn for sn, _, _ in idx] == scan_numbers
    for (sn, start, end), (want_sn, want_rows, want_mcas, want_aborted) in zip(
        idx, emitted
    ):
        scan = parse_scan_block(text[start:end], ["m1", "m2"])
        assert scan.scan_number == want_sn
        assert scan.columns == cols
        assert len(scan.data) == len(want_rows)
        for got, want in zip(scan.data, want_rows):
            for g, w in zip(got, want):
                assert g == pytest.approx(w, rel=1e-5, abs=1e-12)
        # aborted flag from #C; data before/after the abort still parses
        assert scan.aborted == want_aborted
        # MCA alignment: each point's array reassembled across wraps
        assert len(scan.mca) == len(want_rows)
        for got_mca, want_mca in zip(scan.mca, want_mcas):
            if want_mca is None:
                assert got_mca is None
            else:
                assert got_mca == pytest.approx(want_mca, rel=1e-5)


# ---------------------------------------------------------------------------
# Spark-backed properties: few examples, shared session
# ---------------------------------------------------------------------------

_small_floats = st.floats(min_value=-100, max_value=100, allow_nan=False,
                          allow_infinity=False)


@given(data=st.data())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_grid_invariants(spark, data):
    """Sum of voxel occupancy == input rows; 2-D cut == direct 2-D agg."""
    n = data.draw(st.integers(min_value=1, max_value=200))
    pts = [
        (data.draw(_small_floats), data.draw(_small_floats),
         data.draw(_small_floats), abs(data.draw(_small_floats)) + 0.1)
        for _ in range(n)
    ]
    df = spark.createDataFrame(pts, "qx double, qy double, qz double, i double")
    dq = data.draw(st.sampled_from([1.0, 5.0, 25.0]))
    g = df.select(
        F.floor(F.col("qx") / dq).alias("gx"),
        F.floor(F.col("qy") / dq).alias("gy"),
        F.floor(F.col("qz") / dq).alias("gz"),
        "i",
    )
    grid3 = g.groupBy("gx", "gy", "gz").agg(
        F.count("*").alias("n"), F.sum("i").alias("si")
    )
    assert grid3.agg(F.sum("n")).collect()[0][0] == n
    # cut: re-aggregate the 3-D grid over gz vs aggregate the points directly
    cut = grid3.groupBy("gx", "gy").agg(
        F.sum("n").alias("n"), F.sum("si").alias("si")
    )
    direct = g.groupBy("gx", "gy").agg(
        F.count("*").alias("n"), F.sum("i").alias("si")
    )
    got = {(r["gx"], r["gy"]): (r["n"], r["si"]) for r in cut.collect()}
    want = {(r["gx"], r["gy"]): (r["n"], r["si"]) for r in direct.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_dedup_idempotent(spark, data):
    n = data.draw(st.integers(min_value=1, max_value=50))
    texts = [
        data.draw(st.sampled_from(["aaa", "bbb", "ccc", "ddd", "eee"]))
        for _ in range(n)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def dedup(d):
        return (
            d.groupBy("text")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "text")
        )

    once = dedup(df)
    twice = dedup(once)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert len(a) == len(set(texts))


@given(data=st.data())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_range_join_bucketed_property(spark, data):
    from pyspec_spark.operators.joins import range_join_bucketed

    n_facts = data.draw(st.integers(min_value=1, max_value=60))
    n_ranges = data.draw(st.integers(min_value=1, max_value=8))
    facts = [(i, data.draw(_small_floats)) for i in range(n_facts)]
    ranges = []
    for j in range(n_ranges):
        lo = data.draw(_small_floats)
        width = abs(data.draw(_small_floats)) + 1e-6
        ranges.append((j, lo, lo + width))
    width_b = data.draw(st.sampled_from([0.5, 3.0, 50.0, 1000.0]))
    fdf = spark.createDataFrame(facts, "fid long, v double")
    rdf = spark.createDataFrame(ranges, "rid long, lo double, hi double")
    got = sorted(
        (r["fid"], r["rid"])
        for r in range_join_bucketed(fdf, rdf, "v", bucket_width=width_b).collect()
    )
    want = sorted(
        (fid, rid)
        for fid, v in facts
        for rid, lo, hi in ranges
        if lo <= v < hi
    )
    assert got == want


@given(data=st.data())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_matches_pandas(spark, data):
    from pyspec_spark.operators.joins import asof_join

    n_l = data.draw(st.integers(min_value=0, max_value=30))
    n_r = data.draw(st.integers(min_value=1, max_value=30))
    keys = [0, 1, 2]
    # unique (key, ts) on the left — the operator's documented contract
    lpairs = data.draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 100)),
            min_size=n_l, max_size=n_l, unique=True,
        )
    )
    left = [(k, t, float(100 * k + t)) for k, t in lpairs]
    right = [
        (i, data.draw(st.sampled_from(keys)), data.draw(st.integers(0, 100)))
        for i in range(n_r)
    ]
    ldf = spark.createDataFrame(left or [], "k int, t int, px double") if left else \
        spark.createDataFrame([], "k int, t int, px double")
    rdf = spark.createDataFrame(right, "rid long, k int, t int")
    got = {
        r["rid"]: r["px"]
        for r in asof_join(
            ldf, rdf, key="k", left_ts="t", right_ts="t",
            payload=["px"], right_id="rid",
        ).collect()
    }
    lp = pd.DataFrame(left, columns=["k", "t", "px"]).sort_values("t")
    rp = pd.DataFrame(right, columns=["rid", "k", "t"]).sort_values("t")
    if len(lp):
        m = pd.merge_asof(rp, lp, on="t", by="k", direction="backward")
        want = {
            int(r.rid): (None if math.isnan(r.px) else r.px)
            for r in m.itertuples()
        }
    else:
        want = {int(r.rid): None for r in rp.itertuples()}
    assert got == want


@given(
    st.lists(
        st.one_of(
            st.floats(
                min_value=-9e5, max_value=9e5, allow_nan=False, allow_infinity=False
            ),
            # adversarial: values straddling .5 micro-unit boundaries
            st.integers(min_value=-10**12, max_value=10**12).map(lambda n: n / 2e6),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fixed6_matches_bigdecimal_round(spark, data):
    """The arithmetic HALF_UP form in _fixed6 (sign-split floor) must be
    row-identical to Spark's BigDecimal F.round — the invariant the fast
    aggregation path rests on (functions/determinism.py)."""
    from pyspark.sql import functions as F

    from pyspec_spark.functions.determinism import _fixed6

    df = spark.createDataFrame([(float(x),) for x in data], "x double")
    slow = F.round(F.col("x") * 1e6).cast("bigint")
    mismatches = df.select(
        F.sum((_fixed6(F.col("x")) != slow).cast("int")).alias("bad")
    ).collect()[0]["bad"]
    assert mismatches == 0


@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_winnowing_shared_run_guarantee(spark, data):
    """Winnowing (SWA) guarantee: two documents sharing a run of
    >= window + k - 1 consecutive tokens (here 8 + 4 - 1 = 11) share at
    least one selected fingerprint, regardless of what surrounds the
    run.  Also: a doc's fingerprint set is a subset of its gram hashes
    (selection never invents values)."""
    from pyspec_spark.operators.text import fingerprint

    vocab = [f"t{i}" for i in range(30)]
    tok = st.sampled_from(vocab)
    run_len = data.draw(st.integers(min_value=11, max_value=25))
    run = [data.draw(tok) for _ in range(run_len)]
    pre_a = [data.draw(tok) for _ in range(data.draw(st.integers(0, 15)))]
    post_a = [data.draw(tok) for _ in range(data.draw(st.integers(0, 15)))]
    pre_b = [data.draw(tok) for _ in range(data.draw(st.integers(0, 15)))]
    post_b = [data.draw(tok) for _ in range(data.draw(st.integers(0, 15)))]
    doc_a = " ".join(pre_a + run + post_a)
    doc_b = " ".join(pre_b + run + post_b)
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)], "doc_id long, text string"
    )
    rows = fingerprint(df).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1], (
        f"no shared fingerprint for shared {run_len}-token run"
    )


@given(data=st.data())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicated_span_stats_matches_brute_force(spark, data):
    """Random tiny corpora over a 4-token vocabulary (dense repeats):
    the distributed gram-shuffle + interval-fold answer equals a
    brute-force local reference for every doc."""
    from pyspec_spark.operators.text import duplicated_span_stats

    n_docs = data.draw(st.integers(min_value=2, max_value=6))
    vocab = ["a", "b", "c", "d"]
    texts = [
        " ".join(
            data.draw(st.sampled_from(vocab))
            for _ in range(data.draw(st.integers(min_value=1, max_value=12)))
        )
        for _ in range(n_docs)
    ]
    n = data.draw(st.sampled_from([2, 3]))

    # brute force: every n-gram -> docs containing it; coverage by mask
    grams: dict[str, set[int]] = {}
    toks = [t.split(" ") for t in texts]
    for d, tk in enumerate(toks):
        for i in range(len(tk) - n + 1):
            grams.setdefault(" ".join(tk[i : i + n]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    want = {}
    for d, tk in enumerate(toks):
        mask = [False] * len(tk)
        k = 0
        for i in range(len(tk) - n + 1):
            if " ".join(tk[i : i + n]) in dup:
                k += 1
                for j in range(i, i + n):
                    mask[j] = True
        want[d] = (len(tk), k, sum(mask), round(sum(mask) / len(tk), 6))

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_ngrams"], r["dup_cover"], r["dup_frac"])
        for r in duplicated_span_stats(df, n=n).collect()
    }
    assert got == want


@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pq_encode_adc_matches_numpy(spark, data):
    """PQ encode codes and ADC distances equal a local numpy reference
    (first-K codebooks, argmin with lowest-code tiebreak, LUT sums)."""
    import numpy as np

    from pyspec_spark.operators.similarity import (
        pq_adc_topk_df,
        pq_codebooks_firstk_df,
        pq_encode_df,
    )

    m, subd, kcb = 2, 4, 4
    dim = m * subd
    n = data.draw(st.integers(min_value=kcb + 1, max_value=12))
    X = np.array(
        [
            [data.draw(st.integers(min_value=-8, max_value=8)) for _ in range(dim)]
            for _ in range(n)
        ],
        dtype=np.float64,
    )
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb_df = pq_codebooks_firstk_df(emb, m=m, subd=subd, k=kcb)
    codes = {
        r["vec_id"]: [r[f"code{mi}"] for mi in range(m)]
        for r in pq_encode_df(emb, cb_df, m=m, subd=subd).collect()
    }
    # numpy reference
    CB = [X[:kcb, mi * subd : (mi + 1) * subd] for mi in range(m)]
    for i in range(n):
        for mi in range(m):
            d2 = ((CB[mi] - X[i, mi * subd : (mi + 1) * subd]) ** 2).sum(1)
            want = int(np.flatnonzero(d2 == d2.min())[0])  # lowest-code tie
            assert codes[i][mi] == want, (i, mi, codes[i][mi], want)
    # ADC distances for query = row 0
    qdf = emb.where("vec_id = 0").select("embedding")
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_topk_df(codes_df=pq_encode_df(emb, cb_df, m=m, subd=subd),
                                cb_df=cb_df, query_df=qdf, m=m, subd=subd,
                                k=n).collect()
    }
    for i in range(n):
        want = sum(
            ((CB[mi][codes[i][mi]] - X[0, mi * subd : (mi + 1) * subd]) ** 2).sum()
            for mi in range(m)
        )
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)


@given(data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_feature_hash_embed_matches_local_reference(spark, data):
    """The distributed hashing-trick embedding equals a local md5
    reference (buckets, signs, exact integer norms) on random corpora."""
    import hashlib

    from pyspec_spark.operators.text import feature_hash_embed

    dim = 8
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    n_docs = data.draw(st.integers(min_value=1, max_value=5))
    texts = [
        " ".join(
            data.draw(st.sampled_from(vocab))
            for _ in range(data.draw(st.integers(min_value=1, max_value=10)))
        )
        for _ in range(n_docs)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in feature_hash_embed(df, dim=dim).collect():
        got.setdefault(r["doc_id"], {})[r["dim"]] = r["fh_val"]
    for d, text in enumerate(texts):
        raw = [0] * dim
        for t in text.split(" "):
            b = int(hashlib.md5((t + "#fh").encode()).hexdigest()[:8], 16) % dim
            s = 1 if int(hashlib.md5((t + "#sg").encode()).hexdigest()[:8], 16) % 2 == 0 else -1
            raw[b] += s
        n2 = sum(v * v for v in raw) ** 0.5
        for k in range(dim):
            want = round(raw[k] / n2, 6) if n2 > 0 else 0.0
            assert got[d][k] == want, (d, k, got[d][k], want)


# ---------------------------------------------------------------------------
# Manifest Bloom filters (pure Python — generous example budget): the
# structural guarantee skipping correctness rests on is NO FALSE
# NEGATIVES — a file is never pruned while containing the value.  FP
# behavior only costs an extra read and is sanity-bounded, not pinned.
# ---------------------------------------------------------------------------
_bloom_vals = st.lists(
    st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.text(min_size=0, max_size=24),
    ),
    min_size=1,
    max_size=300,
)


@given(vals=_bloom_vals, probes=_bloom_vals)
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative(tmp_path_factory, vals, probes):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspec_spark.lake import _bloom_may_contain, _file_blooms

    base = tmp_path_factory.mktemp("bloomprop")
    ints = [v for v in vals if isinstance(v, int)] or [0]
    strs = [v for v in vals if isinstance(v, str)] or ["x"]
    blooms = {}
    for col, arr in (
        ("i", pa.array(ints, type=pa.int64())),
        ("s", pa.array(strs, type=pa.string())),
    ):
        p = str(base / f"{col}.parquet")
        pq.write_table(pa.table({col: arr}), p)
        blooms.update(_file_blooms(p, [col]))
    for col, inserted in (("i", ints), ("s", strs)):
        assert col in blooms
        for v in inserted:
            assert _bloom_may_contain(blooms[col], v)  # never a false negative
    # sanity: values far outside the inserted set mostly answer "no"
    misses = sum(
        not _bloom_may_contain(blooms["i"], 10**15 + k) for k in range(50)
    )
    assert misses >= 25  # FP rate far below coin-flip


# ---------------------------------------------------------------------------
# Interval join (Spark examples — bounded budget): the view x purchase
# pairing over arbitrary event sets equals a brute-force pandas
# recompute, including window-boundary events (p_ts == v_ts and
# p_ts == v_ts + 1h are both inclusive).
# ---------------------------------------------------------------------------
@given(data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_join_matches_brute_force(spark, data):
    import datetime

    from pyspec_spark.queries.events import q_view_purchase_join
    from pyspec_spark.tables import table as _table

    base = datetime.datetime(2024, 1, 1)
    n = data.draw(st.integers(min_value=2, max_value=40))
    rows = []
    for i in range(n):
        user = data.draw(st.integers(min_value=1, max_value=3))
        kind = data.draw(st.sampled_from(["view", "purchase"]))
        # offsets in whole seconds, including exact 0 and 3600 gaps
        off = data.draw(st.integers(min_value=0, max_value=3 * 3600))
        rows.append(
            (i, base + datetime.timedelta(seconds=off), user, kind, 0.0, "{}")
        )
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING"
    )

    import pyspec_spark.queries.events as ev

    orig = ev.table
    try:
        ev.table = lambda s, d, name: df
        got = sorted(
            (r["view_id"], r["purchase_id"], r["gap_s"])
            for r in q_view_purchase_join.__wrapped__(spark, "ignored").collect()
        )
    finally:
        ev.table = orig

    want = sorted(
        (v[0], p[0], int((p[1] - v[1]).total_seconds()))
        for v in rows
        if v[3] == "view"
        for p in rows
        if p[3] == "purchase"
        and p[2] == v[2]
        and v[1] <= p[1] <= v[1] + datetime.timedelta(hours=1)
    )
    assert got == want


# ---------------------------------------------------------------------------
# Triangle counting (Spark examples — bounded budget): the id-oriented
# two-join equals an adjacency-set recount on arbitrary graphs (stars,
# cliques, isolated edges, multi-component), and total incidences are
# exactly 3x the triangle count.
# ---------------------------------------------------------------------------
@given(data=st.data())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangles_match_recount_on_random_graphs(spark, data):
    from collections import defaultdict

    import pyspec_spark.queries.llm as llm
    from pyspec_spark.queries.graph import q_triangles

    n_nodes = data.draw(st.integers(min_value=3, max_value=14))
    possible = [(a, b) for a in range(n_nodes) for b in range(a + 1, n_nodes)]
    edges = data.draw(
        st.lists(st.sampled_from(possible), min_size=1, max_size=30, unique=True)
    )
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "doc_a LONG, doc_b LONG, jaccard DOUBLE"
    )
    orig = llm.jaccard_pairs
    try:
        llm.jaccard_pairs = lambda s, d, max_doc_id=None: df
        got = {
            r["doc_id"]: r["n_triangles"]
            for r in q_triangles.__wrapped__(spark, "ignored").collect()
        }
    finally:
        llm.jaccard_pairs = orig

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = defaultdict(int)
    n_tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if b < c:
                n_tri += 1
                for v in (a, b, c):
                    want[v] += 1
    assert got == dict(want)
    assert sum(got.values()) == 3 * n_tri


@given(data=st.data())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_degree_orientation_counts_equal_id_orientation(spark, data):
    """orient='degree' (the skew mitigation) must count EXACTLY the
    same per-node triangle memberships as orient='id' on arbitrary
    graphs — orientation changes the wedge distribution, never the
    triangle set."""
    from collections import defaultdict

    from pyspec_spark.queries.graph import triangle_memberships

    n_nodes = data.draw(st.integers(min_value=3, max_value=14))
    possible = [(a, b) for a in range(n_nodes) for b in range(a + 1, n_nodes)]
    edges = data.draw(
        st.lists(st.sampled_from(possible), min_size=1, max_size=30, unique=True)
    )
    df = spark.createDataFrame(edges, "a LONG, b LONG")

    def counts(orient):
        tri = triangle_memberships(df, orient=orient).collect()
        got = defaultdict(int)
        for r in tri:
            for v in (r["i"], r["j"], r["k"]):
                got[v] += 1
        return dict(got)

    assert counts("degree") == counts("id")


def test_degree_orientation_bounds_planted_hub_wedges(spark):
    """The wedge is the path i->j->k, so the skewed quantity is
    in-deg(j) * out-deg(j) at the MIDDLE node.  A planted hub with a
    middle id (25 of 0..50) centers 25*25 wedges under id orientation;
    under degree orientation every star edge points INTO the hub
    (highest degree), its out-degree drops to zero, and the whole
    wedge set collapses to the few chord->hub chains."""
    from pyspec_spark.queries.graph import oriented_wedges

    hub = 25
    star = [(i, hub) for i in range(hub)] + [
        (hub, j) for j in range(hub + 1, 2 * hub + 1)
    ]
    chords = [(1, 2), (3, 4), (5, 6)]  # a few leaf-leaf edges
    df = spark.createDataFrame(star + chords, "a LONG, b LONG")

    id_wedges = oriented_wedges(df, orient="id")
    deg_wedges = oriented_wedges(df, orient="degree")
    # id orientation: 25 in-edges x 25 out-edges centered at the hub
    assert id_wedges.where(f"j = {hub}").count() == hub * hub
    assert id_wedges.count() >= hub * hub
    # degree orientation: the hub centers NOTHING (out-degree 0), and
    # only one chord->hub chain per chord survives
    assert deg_wedges.where(f"j = {hub}").count() == 0
    assert deg_wedges.count() <= 2 * len(chords)


@given(
    n=st.integers(min_value=0, max_value=4000),
    k=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=150, deadline=None)
def test_ntile_closed_form_matches_reference(n, k):
    """ntile_from_pos's remainder distribution vs a pure-Python
    reference of SQL NTILE semantics, exhaustively over random (n, k):
    with q, r = divmod(n, k) the first r buckets hold q+1 rows, the
    rest q — checked WITHOUT Spark by evaluating the same arithmetic
    the Column expression encodes."""

    def ref(pos):
        q, r = divmod(n, k)
        cut = r * (q + 1)
        if pos < cut:
            return pos // (q + 1) + 1
        return r + (pos - cut) // q + 1  # q>0 whenever pos >= cut < n

    def closed(pos):
        # mirror of the Column arithmetic (idiv via subtract-mod)
        q, r = divmod(n, k)
        cut = r * (q + 1)
        if pos < cut:
            return (pos - pos % (q + 1)) // (q + 1) + 1
        return r + ((pos - cut) - (pos - cut) % q) // q + 1

    # and a straight SQL-semantics oracle: bucket sizes
    sizes = [(n // k) + (1 if i < n % k else 0) for i in range(k)]
    bucket_of = []
    for b, sz in enumerate(sizes, start=1):
        bucket_of += [b] * sz
    for pos in range(n):
        assert ref(pos) == closed(pos) == bucket_of[pos], (n, k, pos)


def test_global_rank_index_is_exact_permutation(spark):
    """global_rank_index: pos must be exactly 0..n-1 under an arbitrary
    composite asc/desc order, equal to the single-window row_number on
    the same order — including duplicate leading keys straddling range
    buckets (unique tiebreak carries exactness)."""
    from pyspark.sql import Window

    from pyspec_spark.operators.ordering import global_rank_index

    df = spark.range(5000).select(
        F.col("id"),
        (F.col("id") % 7).alias("dup_key"),  # heavy ties on the leader
    )
    ranked = global_rank_index(
        df, [F.desc("dup_key"), F.col("id")], n_buckets=16
    )
    w = Window.orderBy(F.desc("dup_key"), "id")
    want = {
        r["id"]: r["pos"]
        for r in df.select(
            "id", (F.row_number().over(w) - 1).alias("pos")
        ).collect()
    }
    got = {r["id"]: r["pos"] for r in ranked.collect()}
    assert got == want


def test_ntile_exact_stacked_passes_match_window_truth(spark):
    """Three stacked ntile_exact passes must equal the single-window
    NTILE chain at a bucket count small enough that RangePartitioner's
    per-partition reservoir sample cannot cover whole partitions (the
    r13 q_rfm regression: without the in-operator localCheckpoint, the
    offsets and output subtrees re-evaluated the range exchange, whose
    order-dependent sampling could draw different boundaries per
    evaluation and desynchronize bucket ids from offsets)."""
    from pyspark.sql import Window

    from pyspec_spark.operators.ordering import ntile_exact

    df = (
        spark.range(20000)
        .repartition(8)
        .select(
            "id",
            (F.col("id") % 97).alias("a"),
            ((F.col("id") * 31) % 89).alias("b"),
            ((F.col("id") * 17) % 83).alias("c"),
        )
    )
    orders = (
        ("na", [F.col("a"), F.col("id")]),
        ("nb", [F.desc("b"), F.col("id")]),
        ("nc", [F.desc("c"), F.col("id")]),
    )
    got = df
    for out, order in orders:
        got = ntile_exact(got, order, 5, out, n_buckets=4)
    want = df
    for out, order in orders:
        want = want.withColumn(out, F.ntile(5).over(Window.orderBy(*order)))
    g = {
        r["id"]: (r["na"], r["nb"], r["nc"])
        for r in got.select("id", "na", "nb", "nc").collect()
    }
    w = {
        r["id"]: (r["na"], r["nb"], r["nc"])
        for r in want.select("id", "na", "nb", "nc").collect()
    }
    assert g == w
