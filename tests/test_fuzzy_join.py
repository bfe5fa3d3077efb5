"""L2g — exact fuzzy (edit-distance) token join: SymSpell
deletion-neighborhood banding (operators/dedup.py) and the
q_typo_canon pipeline.

The exactness contract is checked against a brute-force Python
levenshtein over planted vocabularies (both tau=1 and tau=2): the
banded join must return EXACTLY the brute-force pair set — recall is
the banding theorem, precision is the built-in levenshtein verify.
The plan gate pins the no-all-pairs posture (the candidate join is an
equi-join on the variant string, never a cartesian / nested-loop
product).
"""

from __future__ import annotations

import pytest

from pyspec_spark.operators.dedup import (
    deletion_neighborhood,
    fuzzy_token_matches,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute_pairs(left, right, tau):
    return {
        (a, b)
        for a in left
        for b in right
        if _lev(a, b) <= tau
    }


_VOCAB = [
    "spark",
    "spork",
    "sprk",
    "sparks",
    "shuffle",
    "shufle",
    "scuffle",
    "table",
    "cable",
    "tble",
    "tables",
    "stable",
    "partition",
    "partitton",
    "petition",
    "window",
    "widow",
    "winnow",
]


def test_tau1_matches_brute_force(spark):
    df = spark.createDataFrame([(w,) for w in _VOCAB], ["token"])
    got = {
        (r.tok_a, r.tok_b)
        for r in fuzzy_token_matches(df, df, tau=1).collect()
    }
    assert got == _brute_pairs(_VOCAB, _VOCAB, 1)


def test_tau2_matches_brute_force(spark):
    df = spark.createDataFrame([(w,) for w in _VOCAB], ["token"])
    got = {
        (r.tok_a, r.tok_b)
        for r in fuzzy_token_matches(df, df, tau=2).collect()
    }
    want = _brute_pairs(_VOCAB, _VOCAB, 2)
    # recall: nothing missed; precision: nothing extra
    assert got == want
    # sanity: tau=2 genuinely finds cross-edit pairs tau=1 cannot
    assert ("sprk", "sparks") in got  # distance 2: insert a + insert s


def test_dist_column_is_exact_levenshtein(spark):
    df = spark.createDataFrame([(w,) for w in _VOCAB], ["token"])
    for r in fuzzy_token_matches(df, df, tau=2).collect():
        assert r.dist == _lev(r.tok_a, r.tok_b)


def test_neighborhood_contains_identity_and_deletes(spark):
    df = spark.createDataFrame([("abc",)], ["token"])
    got = {
        (r.variant, r.token)
        for r in deletion_neighborhood(df, max_deletes=1).collect()
    }
    assert got == {("abc", "abc"), ("bc", "abc"), ("ac", "abc"), ("ab", "abc")}


def test_neighborhood_tau2_includes_double_deletes(spark):
    df = spark.createDataFrame([("abcd",)], ["token"])
    variants = {
        r.variant
        for r in deletion_neighborhood(df, max_deletes=2).collect()
    }
    # all C(4,2)=6 double-deletions present
    assert {"ab", "ac", "ad", "bc", "bd", "cd"} <= variants


def test_neighborhood_rejects_bad_tau(spark):
    df = spark.createDataFrame([("abc",)], ["token"])
    with pytest.raises(ValueError):
        deletion_neighborhood(df, max_deletes=3)


def test_typo_canon_plan_no_cartesian(spark, sf_dir):
    """The candidate join is an inverted-index equi-join on the variant
    string — no all-pairs product at any vocabulary size."""
    from pyspec_spark.registry import QUERIES, load_all

    load_all()
    p = QUERIES["q_typo_canon"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_typo_canon_every_planted_noisy_recovered(spark, sf_dir):
    """The banding recall guarantee, pinned end-to-end: every planted
    corruption (which is by construction within edit distance 1 of its
    source word) appears in the output, and its source word is within
    distance 1 of the chosen canonical form's distance class."""
    from pyspec_spark.queries.llm_advanced import _typo_noisy_vocab
    from pyspec_spark.registry import QUERIES, load_all
    from pyspec_spark.tables import table

    load_all()
    import pyspark.sql.functions as F

    docs = table(spark, sf_dir, "documents")
    clean_df = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w").rlike("^[a-z]{3,20}$"))
        .distinct()
    )
    clean = {r.w for r in clean_df.collect()}
    noisy = {r.noisy for r in _typo_noisy_vocab(clean_df).collect()}
    out = {r.noisy: r for r in QUERIES["q_typo_canon"](spark, sf_dir).collect()}
    # every planted noisy token is canonicalized (recall guarantee)
    assert set(out) == noisy
    for n, r in out.items():
        assert r.canon in clean
        assert _lev(n, r.canon) == 1  # noisy is never a vocab word
        assert r.n_cands >= 1


# --- L13b chunking boundary pins (colocated: small text-ops tests) ----
def test_doc_chunks_cover_every_token_exactly(spark, sf_dir):
    """Every token index of every doc lands in >= 1 chunk; consecutive
    chunks overlap by exactly CHUNK-STRIDE except the (allowed-short)
    last; short docs produce exactly one chunk."""
    from pyspec_spark.queries.llm import _CHUNK, _STRIDE, q_doc_chunks
    from pyspec_spark.tables import table
    import pyspark.sql.functions as F

    rows = q_doc_chunks.__wrapped__(spark, sf_dir).collect()
    n_by_doc = {
        r.doc_id: r.n
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_by_doc)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = n_by_doc[doc_id]
        covered = set()
        for r in chunks:
            assert r.chunk_start == r.chunk_id * _STRIDE
            assert 1 <= r.n_tokens <= _CHUNK
            assert len(r.chunk_text.split(" ")) == r.n_tokens
            covered |= set(range(r.chunk_start, r.chunk_start + r.n_tokens))
        assert covered == set(range(n)), doc_id
        # the last chunk reaches the end of the doc
        last = chunks[-1]
        assert last.chunk_start + last.n_tokens == n
        if n <= _CHUNK:
            assert len(chunks) == 1
