"""q_semdedup (cluster-scoped semantic dedup) and q_bigram_backoff
(stupid-backoff bigram LM) — semantic guarantees beyond the oracle
sweep: the cluster scan never invents pairs and its recall loss vs the
exact all-pairs scan is measured; the backoff path demonstrably fires
and a pure-python replication pins one document's cross-entropy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def test_semdedup_subset_of_exact_all_pairs(spark):
    """Cluster-scoping can only MISS cross-cluster pairs, never invent
    one: every q_semdedup pair must appear in the exact all-pairs scan
    at the same threshold, with the same rounded cosine."""
    from pyspec_spark.queries.ml import _SEMDEDUP_TAU, q_semdedup
    from pyspec_spark.tables import table

    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in q_semdedup.__wrapped__(spark, SF_SMALL).collect()
    }
    assert got, "no semantic near-dups at sf0.001 — fixture drift"
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in table(spark, SF_SMALL, "embeddings").collect()
    }
    ids = sorted(emb)
    exact = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = round(_cos(emb[a], emb[b]), 6)
            if c >= _SEMDEDUP_TAU:
                exact[(a, b)] = c
    for pair, c in got.items():
        assert pair in exact
        assert abs(exact[pair] - c) <= 2e-6  # rounding seam only
    # measured recall of the cluster-scoped scan vs exact all-pairs —
    # the documented SemDeDup trade; k=4 clusters on random embeddings
    # should still catch a substantial fraction
    recall = len(got) / len(exact)
    assert 0.15 <= recall <= 1.0


def test_semdedup_k_parameter_bounds_scope(spark):
    """The operator form's cluster-count knob behaves as the method
    promises: k=1 degenerates to the EXACT all-pairs scan (one cluster
    holds everything), and growing k can only narrow the pair set —
    never invent — which is why k grows with n at scale."""
    from pyspec_spark.queries.ml import semdedup_pairs
    from pyspec_spark.tables import table

    emb = table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    p1 = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in semdedup_pairs(emb, k=1).collect()
    }
    p8 = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in semdedup_pairs(emb, k=8).collect()
    }
    assert p1 and set(p8) <= set(p1)
    # k=1 == brute force at the same (rounded) threshold
    rows = emb.collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    ids = sorted(vecs)
    from pyspec_spark.queries.ml import _SEMDEDUP_TAU

    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if round(_cos(vecs[a], vecs[b]), 6) >= _SEMDEDUP_TAU:
                exact.add((a, b))
    assert set(p1) == exact


def test_bigram_backoff_paths_fire_and_replicate(spark):
    """The held-out split contains bigrams unseen in training (backoff
    fires), and one document's xent replicates in pure python from the
    collected count tables (micro-unit rounding included)."""
    from pyspec_spark.queries.curation import _hash_mod100
    from pyspec_spark.queries.quality import (
        _BB_TRAIN_PCT,
        q_bigram_backoff,
    )
    from pyspec_spark.tables import table

    d = table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", _hash_mod100(F.col("doc_id"), "#nb").alias("bkt")
    )
    rows = d.collect()
    train_texts = [r["text"] for r in rows if r["bkt"] < _BB_TRAIN_PCT]
    test_rows = [r for r in rows if r["bkt"] >= _BB_TRAIN_PCT]
    assert train_texts and test_rows

    bc: dict[str, int] = {}
    uni: dict[str, int] = {}
    for t in train_texts:
        toks = t.split(" ")
        for tok in toks:
            uni[tok] = uni.get(tok, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bg = f"{a} {b}"
            bc[bg] = bc.get(bg, 0) + 1
    n = sum(uni.values())
    v = len(uni)

    def lp_micro(a, b):
        bg = f"{a} {b}"
        if bg in bc:
            x = math.log(bc[bg] / uni[a])
        elif b in uni:
            x = math.log(0.4 * uni[b] / n)
        else:
            x = math.log(0.16 / v)
        s = x * 1e6
        return math.floor(s + 0.5) if s >= 0 else -math.floor(0.5 - s)

    # at least one held-out bigram must be unseen (backoff fires)
    unseen = 0
    for r in test_rows:
        toks = r["text"].split(" ")
        unseen += sum(1 for a, b in zip(toks, toks[1:]) if f"{a} {b}" not in bc)
    assert unseen > 0

    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in q_bigram_backoff.__wrapped__(spark, SF_SMALL).collect()
    }
    checked = 0
    for r in test_rows[:5]:
        toks = r["text"].split(" ")
        if len(toks) < 2:
            continue
        lps = [lp_micro(a, b) for a, b in zip(toks, toks[1:])]
        want_xent = round(-sum(lps) / len(lps) / 1e6, 6)
        assert got[r["doc_id"]] == (len(lps), want_xent)
        checked += 1
    assert checked > 0


def test_ppl_gate_terciles_are_balanced_and_ordered(spark):
    """CCNet semantics: per language, exactly 3 buckets whose sizes are
    NTILE-balanced (max-min <= 1), bucket means are nondecreasing from
    head (1) to tail (3), and the bucket populations add back up to the
    held-out per-lang document counts from the LM scorer."""
    from collections import defaultdict

    from pyspec_spark.queries.quality import _bigram_xent, q_ppl_gate
    from pyspec_spark.tables import table

    rows = q_ppl_gate.__wrapped__(spark, SF_SMALL).collect()
    by_lang = defaultdict(dict)
    for r in rows:
        by_lang[r["lang"]][r["bucket"]] = r

    xent = _bigram_xent(spark, SF_SMALL).select("doc_id")
    langs = table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    want_counts = {
        r["lang"]: r["n"]
        for r in xent.join(langs, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    assert set(by_lang) == set(want_counts)
    for lang, buckets in by_lang.items():
        assert sorted(buckets) == [1, 2, 3], (lang, sorted(buckets))
        sizes = [buckets[b]["n_docs"] for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert sum(sizes) == want_counts[lang]
        means = [buckets[b]["avg_xent"] for b in (1, 2, 3)]
        assert means == sorted(means), (lang, means)
        # per-bucket extrema bracket the mean and chain across buckets
        for b in (1, 2, 3):
            r = buckets[b]
            assert r["min_xent"] <= r["avg_xent"] <= r["max_xent"]
        assert buckets[1]["max_xent"] <= buckets[2]["min_xent"] + 1e-9
        assert buckets[2]["max_xent"] <= buckets[3]["min_xent"] + 1e-9


def test_proto_prune_flags_top_fraction_closest_to_centroid(spark):
    """Per cluster: exactly ceil(20%·n) members pruned, and they are
    the rank-ordered MOST prototypical (highest cosine-to-centroid);
    ranks are dense 1..n within each cluster."""
    import math
    from collections import defaultdict

    from pyspec_spark.queries.ml import _PROTO_FRAC, q_proto_prune

    rows = q_proto_prune.__wrapped__(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    by_c = defaultdict(list)
    for r in rows:
        by_c[r["cid"]].append(r)
    for cid, rs in by_c.items():
        rs.sort(key=lambda r: r["rk"])
        n = len(rs)
        assert all(r["n_cluster"] == n for r in rs)
        assert [r["rk"] for r in rs] == list(range(1, n + 1))
        cos = [r["proto_cos"] for r in rs]
        assert cos == sorted(cos, reverse=True)
        want_pruned = math.ceil(_PROTO_FRAC * n)
        assert sum(r["pruned"] for r in rs) == want_pruned
        assert all(r["pruned"] for r in rs[:want_pruned])
