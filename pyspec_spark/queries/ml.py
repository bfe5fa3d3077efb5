"""Iterative ML on the engine — k-means (Lloyd) with deterministic
semantics, oracle-checked.

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — north-star ML-adjacent operator; the same assign/update loop
trains the IVF coarse quantizer (`operators/similarity.py`), declared
here in a fully deterministic, cross-engine-checkable form.

Determinism contract (what makes k-means oracle-checkable at all):
- init: centroids := the vectors with vec_id 0..k-1 (no RNG);
- distance: EXPLICIT per-channel expression in a fixed textual order —
  (e1-c1)^2 + ... + (e8-c8)^2 — identical IEEE double evaluation in
  both engines (a sum-over-unnest would add in engine-defined order);
- assignment: argmin with centroid-id tiebreak via MIN(struct(dist,cid))
  — min_by semantics, shuffle-free per vector;
- update: exact fixed-point channel means (micro-unit bigint sums, one
  deterministic IEEE division + round, the q_embed_centroid idiom);
- two iterations, unrolled — the fixpoint count is part of the query.

Scale notes (100 TB posture): per iteration the plan is
broadcast(k x d centroids) -> map-side distance + per-row argmin (NO
shuffle for assignment) -> one groupBy(cid, channel) with map-side
partial aggregation.  Iterations multiply jobs, not shuffle width; at
cluster scale the loop runs the same plan with the centroid table
re-broadcast each round (k*d doubles — trivially broadcastable for any
practical k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import _fixed6
from pyspec_spark.registry import query
from pyspec_spark.tables import table

_K = 4
_D = 8


def _dist_sql(e: str, c: str) -> str:
    terms = " + ".join(
        f"(CAST({e}.embedding[{d}] AS DOUBLE) - {c}.c[{d}]) "
        f"* (CAST({e}.embedding[{d}] AS DOUBLE) - {c}.c[{d}])"
        for d in range(1, _D + 1)
    )
    return f"({terms})"


def _kmeans_cte_prefix() -> str:
    """The WITH chain through two unrolled Lloyd rounds: emb, c0 (first
    _K vectors), asg1/c1, asg2/c2.  Shared by the k-means oracle and the
    deterministic-IVF oracle (same trained coarse quantizer)."""

    def assign(src_c: str, out: str) -> str:
        return f"""
{out}_a AS (
  SELECT e.vec_id,
         MIN(struct_pack(d := {_dist_sql('e', 'c')}, cid := c.cid)) AS best
  FROM emb e, {src_c} c
  GROUP BY e.vec_id
),
{out} AS (
  SELECT a.vec_id, (a.best).cid AS cid FROM {out}_a a
)"""

    def update(asg: str, out: str) -> str:
        return f"""
{out}_ch AS (
  SELECT s.cid, ch.channel, ch.v
  FROM {asg} s JOIN (
    SELECT vec_id, generate_subscripts(embedding, 1) AS channel,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM emb
  ) ch ON ch.vec_id = s.vec_id
  WHERE ch.channel <= {_D}
),
{out} AS (
  SELECT cid,
         LIST(ROUND(CAST(s_micro AS DOUBLE) / n) / 1e6 ORDER BY channel) AS c
  FROM (
    SELECT cid, channel,
           SUM(CAST(ROUND(v * 1e6) AS BIGINT)) AS s_micro, COUNT(*) AS n
    FROM {out}_ch
    GROUP BY cid, channel
  )
  GROUP BY cid
)"""

    return f"""
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid,
         LIST(CAST(x AS DOUBLE) ORDER BY ord) AS c
  FROM (
    SELECT vec_id, unnest(embedding[1:{_D}]) AS x,
           generate_subscripts(embedding[1:{_D}], 1) AS ord
    FROM emb WHERE vec_id < {_K}
  )
  GROUP BY vec_id
),{assign('c0', 'asg1')},{update('asg1', 'c1')},{assign('c1', 'asg2')},{update('asg2', 'c2')}"""


def _kmeans_oracle() -> str:
    return _kmeans_cte_prefix() + f""",
sizes AS (
  SELECT cid, COUNT(*) AS n_members FROM asg2 GROUP BY cid
)
SELECT s.cid, s.n_members, ch.channel, ROUND(c2.c[ch.channel], 6) AS centroid_v
FROM sizes s
JOIN c2 ON c2.cid = s.cid
CROSS JOIN (SELECT unnest(range(1, {_D} + 1)) AS channel) ch
"""


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Map-side argmin assignment: broadcast centroids, explicit
    fixed-order distance, MIN(struct(dist, cid)) per vector.

    r13: the per-dimension distance chain is emitted as one parsed-SQL
    expression (the queries/curation._replicate_copies
    plan-construction note) — same operators, left-associated sum in
    the same fixed order, same values."""
    t = (
        "(CAST(element_at(embedding, {d}) AS DOUBLE) - element_at(c, {d}))"
        " * (CAST(element_at(embedding, {d}) AS DOUBLE)"
        " - element_at(c, {d}))"
    )
    dist = " + ".join(t.format(d=d) for d in range(1, _D + 1))
    return (
        emb.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(F.expr(f"min(struct(({dist}) AS dist, cid AS cid)) AS best"))
        .selectExpr("vec_id", "best.cid AS cid")
    )


def _update(emb: DataFrame, asg: DataFrame) -> DataFrame:
    """Exact fixed-point channel means -> centroid arrays."""
    from pyspec_spark.functions.determinism import _fixed6_sql

    ch = (
        emb.join(asg, "vec_id")
        .selectExpr(
            "cid",
            f"posexplode(slice(embedding, 1, {_D})) AS (channel0, raw)",
        )
        .selectExpr(
            "cid", "(channel0 + 1) AS channel", "CAST(raw AS DOUBLE) AS v"
        )
    )
    per_ch = ch.groupBy("cid", "channel").agg(
        F.expr(
            f"(round(CAST(SUM({_fixed6_sql('v')}) AS DOUBLE)"
            " / COUNT(*)) / 1E6) AS cv"
        )
    )
    return per_ch.groupBy("cid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(channel, cv))),"
            " s -> s.cv) AS c"
        )
    )


@query("q_kmeans2", oracle=_kmeans_oracle())
def q_kmeans2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c0 = emb.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.transform(
            F.slice("embedding", 1, _D), lambda x: x.cast("double")
        ).alias("c"),
    )
    asg1 = _assign(emb, c0)
    c1 = _update(emb, asg1)
    asg2 = _assign(emb, c1)
    c2 = _update(emb, asg2)
    sizes = asg2.groupBy("cid").agg(F.count("*").alias("n_members"))
    return (
        sizes.join(c2, "cid")
        .select(
            "cid",
            "n_members",
            F.posexplode("c").alias("channel0", "cv"),
        )
        .select(
            "cid",
            "n_members",
            (F.col("channel0") + 1).alias("channel"),
            F.round("cv", 6).alias("centroid_v"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic IVF ANN top-k, ORACLE-CHECKED end to end: the coarse
# quantizer is the q_kmeans2 trained centroid set (2 unrolled Lloyd
# rounds, exact fixed-point means — the DuckDB oracle replays training
# via the shared CTE prefix), cell assignment and probe selection use
# the same explicit fixed-order distance, and the exact cosine re-rank
# inside the 2 probed cells reuses the verified q_cosine_topk parity
# (rounded `list_cosine_similarity`).  This is the IVF index working
# deterministically; the numpy-sample-trained `q_ann_ivf_topk` stays
# rows-only as the production-flavored variant.
#
# Scale posture: identical to q_kmeans2 per round (broadcast centroids,
# map-side argmin, one keyed groupBy); the probe prunes the re-rank to
# n_probe/n_cells of the corpus, and at rest `cid` is the partition key.
# ---------------------------------------------------------------------------
def _ivf_oracle(label: int | None = None) -> str:
    lbl = (
        f"JOIN embeddings lb ON lb.vec_id = e.vec_id AND lb.label = {label}"
        if label is not None
        else ""
    )
    return _kmeans_cte_prefix() + f""",
qv AS (
  SELECT embedding FROM emb WHERE vec_id = 0
),
probe AS (
  SELECT c.cid FROM qv q, c2 c
  ORDER BY {_dist_sql('q', 'c')}, c.cid
  LIMIT 2
),
cand AS (
  SELECT a.vec_id FROM asg2 a JOIN probe p ON a.cid = p.cid
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 6) AS score
FROM emb e
JOIN cand USING (vec_id)
{lbl}
CROSS JOIN qv q
ORDER BY score DESC, e.vec_id
LIMIT 10
"""


@query("q_ann_ivf_det", oracle=_ivf_oracle())
def q_ann_ivf_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk_df(spark, sf_dir)


# ---------------------------------------------------------------------------
# L5c scale path (r11) — FILTERED IVF ANN: the metadata predicate
# composed with the cell-probed index, not just the brute-force
# baseline (q_ann_filtered).  Semantics: cells are probed on the
# UNFILTERED quantizer (the index is built once, filters vary per
# query — rebuilding per filter is the anti-pattern), and the
# predicate restricts the RE-RANK candidate set inside the probed
# cells — exact pre-filtering within the index's candidate recall,
# the standard filtered-HNSW/IVF design (public vector-db
# literature).  At rest the cells are partition dirs and the label
# can ride as a second partition key, turning the filter into pure
# file pruning.  Deterministic end-to-end (the q_ann_ivf_det trained
# quantizer), so oracle-checked — the production numpy-trained
# variants stay rows-only.
# ---------------------------------------------------------------------------
_FIVF_LABEL = 7


@query("q_ann_ivf_filtered", oracle=_ivf_oracle(label=_FIVF_LABEL))
def q_ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk_df(spark, sf_dir, label=_FIVF_LABEL)


def _ivf_topk_df(
    spark: SparkSession, sf_dir: str, label: int | None = None
) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c0 = emb.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.transform(
            F.slice("embedding", 1, _D), lambda x: x.cast("double")
        ).alias("c"),
    )
    asg1 = _assign(emb, c0)
    c1 = _update(emb, asg1)
    asg2 = _assign(emb, c1)
    c2 = _update(emb, asg2)

    q = emb.where(F.col("vec_id") == 0)
    q8 = q.select(
        F.transform(F.slice("embedding", 1, _D), lambda x: x.cast("double")).alias(
            "qe"
        )
    )
    dist: Column = None
    for d in range(1, _D + 1):
        t = (F.element_at(F.col("qe"), d) - F.element_at(F.col("c"), d)) * (
            F.element_at(F.col("qe"), d) - F.element_at(F.col("c"), d)
        )
        dist = t if dist is None else dist + t
    probe = (
        c2.crossJoin(F.broadcast(q8))
        .select("cid", dist.alias("dist"))
        .orderBy("dist", "cid")
        .limit(2)
        .select("cid")
    )
    cand = asg2.join(F.broadcast(probe), "cid").select("vec_id")
    if label is not None:
        lbl = table(spark, sf_dir, "embeddings").where(
            F.col("label") == label
        ).select("vec_id")
        cand = cand.join(lbl, "vec_id", "left_semi")

    qv = q.select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with(
            "embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(col):
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda a: a.cast("double") * a.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    return (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                dot / (norm(F.col("embedding")) * norm(F.col("qv"))), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# PCA top component by unrolled power iteration (r4) — ORACLE-CHECKED
# and fully IN-PLAN: the covariance matrix is q_embed_cov's declared
# aggregate (its oracle SQL reused verbatim as a CTE prefix, the same
# composition trick as q_ann_ivf_det reusing q_kmeans2), and two
# power-iteration rounds v -> C v / ||C v|| run as join + micro-unit
# fixed-point aggregations.  Matrix-vector products sum 16 doubles —
# engine-defined order — so each product is quantized to micro-units
# before summing (exact, associative, order-independent); divisions and
# sqrt are single IEEE ops.  Start vector = uniform 1/8 (exactly
# representable).  The iteration count is part of the query, so both
# engines compute the identical intermediate vector, converged or not
# (pytest separately checks exact agreement with numpy's same iterate
# and the monotone Rayleigh improvement; the synthetic embeddings'
# near-degenerate spectrum makes eigenvector alignment a long-horizon
# property, not a 2-round one — at real-data spectra, raise
# _PCA_ROUNDS and regenerate the oracle CTE chain accordingly).
#
# 100 TB posture: the corpus-sized work is q_embed_cov's map-only pair
# expansion (136-key shuffle); the iteration itself runs on the 16x16
# matrix — negligible at any scale, and entirely lazy (zero jobs at
# build, gate-enforced).
# ---------------------------------------------------------------------------
_PCA_ROUNDS = 2


def _pca_oracle() -> str:
    from pyspec_spark.queries.arrays import _EMBED_COV_ORACLE

    # r8: _EMBED_COV_ORACLE now emits the covariance as an exact integer
    # pair (cov_num micro^2, cov_den) — zero float columns, build-proof.
    # The iteration needs a double matrix, so cov is re-derived here as
    # ROUND(fl(num)/fl(den)/1e6)/1e6: BIGINT->DOUBLE is correctly
    # rounded per IEEE on every build (int64, NOT the hugeint path),
    # the two divisions are single IEEE ops on bit-identical inputs,
    # and the terminal round is scale-0 — both engines see the same
    # bits.  Spark mirrors the exact same chain (q_pca_power below).
    sql = f"""
WITH tri AS ({_EMBED_COV_ORACLE}),
covf AS (
  SELECT i, j,
         ROUND(CAST(cov_num AS DOUBLE) / CAST(cov_den AS DOUBLE) / 1e6)
           / 1e6 AS cov
  FROM tri
  UNION ALL
  SELECT j AS i, i AS j,
         ROUND(CAST(cov_num AS DOUBLE) / CAST(cov_den AS DOUBLE) / 1e6)
           / 1e6 AS cov
  FROM tri WHERE i < j
),
x1 AS (
  SELECT i, CAST(SUM(CAST(ROUND(cov * 0.125 * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS x
  FROM covf GROUP BY i
),
n1 AS (SELECT SQRT(CAST(SUM(CAST(ROUND(x * x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
       AS nrm FROM x1),
v1 AS (SELECT i, x / nrm AS v FROM x1, n1),
x2 AS (
  SELECT covf.i, CAST(SUM(CAST(ROUND(cov * v1.v * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS x
  FROM covf JOIN v1 ON v1.i = covf.j
  GROUP BY covf.i
),
n2 AS (SELECT SQRT(CAST(SUM(CAST(ROUND(x * x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
       AS nrm FROM x2)
SELECT i, ROUND(x / nrm * 1e6) / 1e6 AS pc1 FROM x2, n2
"""
    return sql


@query("q_pca_power", oracle=_pca_oracle())
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.queries.arrays import q_embed_cov

    cov_builder = getattr(q_embed_cov, "__wrapped__", q_embed_cov)
    # same double re-derivation as the oracle's covf CTE (see _pca_oracle)
    cov_dbl = (
        F.round(
            F.col("cov_num").cast("double") / F.col("cov_den").cast("double") / 1e6
        )
        / 1e6
    ).alias("cov")
    tri = cov_builder(spark, sf_dir).select("i", "j", cov_dbl)
    covf = tri.unionByName(
        tri.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    )

    def mat_vec(vec: DataFrame) -> DataFrame:
        """x_i = sum_j C[i,j] * v_j, micro-unit-exact."""
        vj = vec.select(F.col("i").alias("j"), F.col("v").alias("vj"))
        return (
            covf.join(F.broadcast(vj), "j")
            .groupBy("i")
            .agg(
                (F.sum(_fixed6(F.col("cov") * F.col("vj"))).cast("double") / 1e6)
                .alias("x")
            )
        )

    def normalize(x: DataFrame) -> DataFrame:
        nrm = x.agg(
            F.sqrt(
                F.sum(_fixed6(F.col("x") * F.col("x"))).cast("double") / 1e6
            ).alias("nrm")
        )
        return x.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("x") / F.col("nrm")).alias("v"), "nrm"
        )

    # round 1 from the uniform start vector (v0 = 1/8 per coordinate)
    v = normalize(
        covf.groupBy("i").agg(
            (F.sum(_fixed6(F.col("cov") * F.lit(0.125))).cast("double") / 1e6)
            .alias("x")
        )
    )
    for _ in range(_PCA_ROUNDS - 1):
        v = normalize(mat_vec(v))
    return v.select("i", (F.round(F.col("v") * 1e6) / 1e6).alias("pc1"))


# ---------------------------------------------------------------------------
# Deterministic product-quantization ANN (Jégou et al. 2011),
# ORACLE-CHECKED end to end — the fourth ANN tier (brute -> LSH -> IVF
# -> PQ), proving the memory-bounded path: vectors are reduced to M=4
# codes against K=16 per-subspace codebooks and the query is answered
# by asymmetric distance computation (ADC) over a broadcast M x K LUT,
# never touching the original embeddings at scoring time.
#
# Determinism contract (same discipline as q_kmeans2 / q_ann_ivf_det):
# - codebooks: subvectors of the K lowest-id vectors (no RNG) — the
#   production Lloyd-trained variant is q_ann_pq_topk (rows-only);
# - subspace distances: explicit 16-term left-associated chains,
#   bit-identical IEEE evaluation in both engines;
# - encode argmin: MIN(struct(d, code)) / array_min(struct array) —
#   shared lexicographic struct ordering, lowest-code tiebreak;
# - ADC: lut0+lut1+lut2+lut3 in fixed textual order, ROUND(.,6), ranked
#   on the rounded value with the vec_id tiebreak.
#
# Scale posture (the point of PQ): encode is MAP-ONLY — broadcast 1-row
# codebook, per-row array_min argmin, NO shuffle (the SQL replay needs
# a groupBy per subspace; the Spark plan does not).  Scoring reads only
# the M-byte code columns (64 floats -> 4 codes, 64x at-rest shrink)
# plus a broadcast LUT, then TakeOrderedAndProject — at 100 TB the
# whole query is one pruned columnar scan of the codes table.
# ---------------------------------------------------------------------------
_PQ_M, _PQ_SUBD, _PQ_K = 4, 16, 16


def _pq_dist_sql(e: str, sub: str, lo: int) -> str:
    terms = " + ".join(
        f"(CAST({e}.embedding[{lo + d + 1}] AS DOUBLE) - {sub}[{d + 1}]) "
        f"* (CAST({e}.embedding[{lo + d + 1}] AS DOUBLE) - {sub}[{d + 1}])"
        for d in range(_PQ_SUBD)
    )
    return f"({terms})"


def _pq_oracle() -> str:
    ctes = ["emb AS (SELECT vec_id, embedding FROM embeddings)"]
    for mi in range(_PQ_M):
        lo = mi * _PQ_SUBD
        ctes.append(
            f"""cb{mi} AS (
  SELECT vec_id AS code,
         CAST(embedding[{lo + 1}:{lo + _PQ_SUBD}] AS DOUBLE[]) AS sub
  FROM emb WHERE vec_id < {_PQ_K}
)"""
        )
        ctes.append(
            f"""enc{mi} AS (
  SELECT e.vec_id,
         MIN(struct_pack(d := {_pq_dist_sql('e', 'c.sub', lo)},
                         code := c.code)) AS best
  FROM emb e, cb{mi} c
  GROUP BY e.vec_id
)"""
        )
    ctes.append("qv AS (SELECT embedding FROM emb WHERE vec_id = 0)")
    for mi in range(_PQ_M):
        lo = mi * _PQ_SUBD
        ctes.append(
            f"""lut{mi} AS (
  SELECT c.code, {_pq_dist_sql('q', 'c.sub', lo)} AS ld
  FROM cb{mi} c, qv q
)"""
        )
    adc = " + ".join(f"l{mi}.ld" for mi in range(_PQ_M))
    joins = "\n".join(
        f"JOIN enc{mi} e{mi} ON e{mi}.vec_id = e.vec_id\n"
        f"JOIN lut{mi} l{mi} ON l{mi}.code = (e{mi}.best).code"
        for mi in range(_PQ_M)
    )
    return f"""
WITH {','.join(ctes)}
SELECT e.vec_id, ROUND({adc}, 6) AS adc_dist
FROM emb e
{joins}
ORDER BY adc_dist, e.vec_id
LIMIT 10
"""


@query("q_ann_pq_det", oracle=_pq_oracle())
def q_ann_pq_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import (
        pq_adc_topk_df,
        pq_codebooks_firstk_df,
        pq_encode_df,
    )

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_codebooks_firstk_df(emb, m=_PQ_M, subd=_PQ_SUBD, k=_PQ_K)
    codes = pq_encode_df(emb, cb, m=_PQ_M, subd=_PQ_SUBD)
    qdf = emb.where(F.col("vec_id") == 0).select("embedding")
    return pq_adc_topk_df(
        codes, cb, qdf, m=_PQ_M, subd=_PQ_SUBD, k=10, round_digits=6
    )


# ---------------------------------------------------------------------------
# SemDeDup (r5b, Abbas et al. 2023 "SemDeDup: Data-efficient learning
# at web-scale through semantic deduplication"): cluster the embedding
# space with the deterministic k-means quantizer, then find
# near-identical pairs ONLY within each cluster — the published trick
# that turns the O(n²) all-pairs cosine scan (q_embed_neardup, the
# exact baseline) into k independent cluster-local scans of ~ (n/k)²,
# with more clusters buying more reduction.  Composition: the SAME
# asg2 assignment q_kmeans2/q_ann_ivf_det train (shared CTE prefix),
# the SAME fold-ordered cosine the ANN family uses.  Pair threshold is
# applied to the ROUNDED cosine in both engines (boundary-safe).
#
# Scale posture: one cid-keyed self-join — the quadratic blowup is
# bounded per cluster, which is exactly the knob SemDeDup prescribes
# (raise k until clusters fit); no global all-pairs path exists here.
# ---------------------------------------------------------------------------
_SEMDEDUP_TAU = 0.35


def _semdedup_oracle() -> str:
    return _kmeans_cte_prefix() + f""",
m AS (
  SELECT a.vec_id, a.cid, e.embedding
  FROM asg2 a JOIN emb e USING (vec_id)
)
SELECT x.cid, x.vec_id AS id_a, y.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                    CAST(y.embedding AS DOUBLE[])), 6)
         AS cos_sim
FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                   CAST(y.embedding AS DOUBLE[])), 6)
      >= {_SEMDEDUP_TAU}
"""


def semdedup_pairs(
    emb: DataFrame, k: int = _K, tau: float = _SEMDEDUP_TAU
) -> DataFrame:
    """Operator form of q_semdedup with a PARAMETERIZED cluster count:
    SemDeDup's cost is sum over clusters of (cluster size)², so k must
    grow with the corpus — a fixed k scales quadratically (measured in
    SCALING.md).  ``emb`` needs (vec_id, embedding); init = the first
    k ids, two Lloyd rounds, then the cluster-scoped pair scan."""
    c0 = emb.where(f"vec_id < {k}").selectExpr(
        "vec_id AS cid",
        f"transform(slice(embedding, 1, {_D}),"
        " x -> CAST(x AS DOUBLE)) AS c",
    )
    asg2 = _assign(emb, _update(emb, _assign(emb, c0)))

    # Tracked persist (r14 — formerly a bare .cache()), REPARTITIONED
    # BY cid: the member table (cluster, id, embedding) is the single
    # input of the pair scan; persisting it already hash-partitioned
    # on cid lets the groupBy below reuse the cached partitioning
    # (EnsureRequirements adds no exchange), so the kmeans training
    # chain executes exactly once per run.  release_persisted drains.
    from pyspec_spark.registry import PERSIST_SEQ, track_persist

    m = track_persist(
        emb.sparkSession,
        f"semdedup_pairs#members#{next(PERSIST_SEQ)}",
        emb.join(asg2, "vec_id")
        .select("cid", "vec_id", "embedding")
        .repartition(F.col("cid")),
    )

    # r13 optimization (guide §4.1/§2.3): the previous shape was a
    # broadcast pair JOIN followed by a pandas-UDF cosine — every PAIR
    # shipped both 64-dim vectors across the Arrow boundary (~500 k
    # pairs x 128 doubles ~ 0.5 GB at sf0.1), and the optimizer's
    # filter pushdown duplicated the UDF into TWO ArrowEvalPython
    # nodes (the guide §4.4 trap), doubling that.  This form ships
    # each MEMBER once (n x 64 floats) into one applyInPandas per
    # cluster and builds the pair scan inside numpy: measured 830 ms
    # -> 213 ms warm at sf0.1, plan 2 ArrowEvalPython -> 1
    # FlatMapGroupsInPandas.  Exactness is preserved in two steps: a
    # BLAS Gram shortlist whose reordered sum differs from the exact
    # sequential fold by <= (d-1)*eps (~1.4e-14 after normalization,
    # dwarfed by the 1e-9 margin on top of the 1e-6 rounding guard),
    # then the authoritative cosine recomputed ONLY for shortlisted
    # pairs with LEFT-TO-RIGHT float64 dimension accumulation — the
    # same addition order as the sequential fold and DuckDB's
    # list_cosine_similarity — with Spark's round/threshold applied
    # last, unchanged.  Scale posture unchanged: SemDeDup's published
    # knob is that k grows with the corpus so a cluster fits one task
    # (the n^2 shortlist matrix here is the same quadratic the pair
    # join materialized as rows, minus the per-pair vector payload).
    guard = tau - 1e-6  # rounding to 6 dp moves a double by <= 5e-7

    def _cluster_pairs(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "cid": pd.Series([], dtype="int64"),
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "cos_raw": pd.Series([], dtype="float64"),
                }
            )
        pdf = pdf.sort_values("vec_id")  # triu => id_a < id_b
        ids = pdf["vec_id"].to_numpy()
        G = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        n, d = G.shape
        # exact left-to-right norms (the sequential fold's order)
        nrm = G[:, 0] * G[:, 0]
        for i in range(1, d):
            nrm += G[:, i] * G[:, i]
        rt = np.sqrt(nrm)
        fast = (G @ G.T) / np.outer(rt, rt)  # shortlist only
        iu, ju = np.triu_indices(n, 1)
        cand = fast[iu, ju] >= guard - 1e-9
        ia, jb = iu[cand], ju[cand]
        A, B = G[ia], G[jb]
        dot = A[:, 0] * B[:, 0]  # exact fold over the shortlist
        for i in range(1, d):
            dot += A[:, i] * B[:, i]
        c = dot / (rt[ia] * rt[jb])
        keep = c >= guard
        cid = np.int64(pdf["cid"].iloc[0])
        return pd.DataFrame(
            {
                "cid": np.full(int(keep.sum()), cid, dtype="int64"),
                "id_a": ids[ia[keep]],
                "id_b": ids[jb[keep]],
                "cos_raw": c[keep],
            }
        )

    pairs = m.groupBy("cid").applyInPandas(
        _cluster_pairs, "cid long, id_a long, id_b long, cos_raw double"
    )
    return (
        pairs.selectExpr("*", "round(cos_raw, 6) AS cos_sim")
        .where(f"cos_sim >= {tau!r}D")
        .select("cid", "id_a", "id_b", "cos_sim")
    )


@query("q_semdedup", oracle=_semdedup_oracle())
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semdedup_pairs(emb)


# ---------------------------------------------------------------------------
# L41 linear probe via sufficient statistics (r7) — "training" a ridge
# regression as ONE aggregation: the Gram matrix of [1, x, y] over the
# corpus is a set of exact bigint sums, and the d x d solve happens on
# the driver against 15 numbers (operators/fitting.solve_linear_probe).
# The probe here is the cheap token-cost estimator every budgeting
# pipeline wants: predict the subword count (the q_token_fertility
# basis, i.e. what tokenization WILL cost) from byte statistics that
# cost nothing to compute (bytes, spaces, digits).  This is the
# standard scale pattern for any linear/GLS model: sufficient
# statistics shrink the learning problem from |corpus| rows to
# d(d+1)/2 numbers, so "fit" costs exactly one partial-aggregated
# map-reduce and re-fitting with a different ridge is free.
#
# Determinism: features and target are exact integer counts on proven
# cross-engine bases (octet_length/strlen, space stripping, the
# fertility regex); every output is a bigint SUM — no floats anywhere.
#
# 100 TB posture: map-only feature extraction, one global aggregate
# (partial/final — the exchange carries ONE row per map partition).
# Overflow guard: SUM(n_bytes^2) at 100 TB of ~2 KB docs is ~2e17,
# inside int64; byte-huge documents would route through DECIMAL(38,0).
# ---------------------------------------------------------------------------
_PROBE_FEATS = """
  SELECT strlen(text) AS b,
         strlen(text) - strlen(replace(text, ' ', '')) AS sp,
         len(regexp_extract_all(text, '[0-9]')) AS dg,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS y
  FROM documents
"""

_LINREG_ORACLE = f"""
WITH f AS ({_PROBE_FEATS})
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b) AS BIGINT) AS s_b,
       CAST(SUM(sp) AS BIGINT) AS s_sp,
       CAST(SUM(dg) AS BIGINT) AS s_dg,
       CAST(SUM(y) AS BIGINT) AS s_y,
       CAST(SUM(b * b) AS BIGINT) AS ss_b_b,
       CAST(SUM(b * sp) AS BIGINT) AS ss_b_sp,
       CAST(SUM(b * dg) AS BIGINT) AS ss_b_dg,
       CAST(SUM(b * y) AS BIGINT) AS ss_b_y,
       CAST(SUM(sp * sp) AS BIGINT) AS ss_sp_sp,
       CAST(SUM(sp * dg) AS BIGINT) AS ss_sp_dg,
       CAST(SUM(sp * y) AS BIGINT) AS ss_sp_y,
       CAST(SUM(dg * dg) AS BIGINT) AS ss_dg_dg,
       CAST(SUM(dg * y) AS BIGINT) AS ss_dg_y,
       CAST(SUM(y * y) AS BIGINT) AS ss_y_y
FROM f
"""


def _probe_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = table(spark, sf_dir, "documents")
    # r13: one parsed-SQL projection (1:1 transliteration of the former
    # Column chain; see curation._replicate_copies' plan-construction
    # note).  2-arg F.replace == replace(..., '').
    return t.selectExpr(
        "octet_length(text) AS b",
        "(octet_length(text) - octet_length(replace(text, ' ', ''))) AS sp",
        "size(regexp_extract_all(text, '[0-9]', 0)) AS dg",
        "size(regexp_extract_all(text,"
        " '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0)) AS y",
    )


@query("q_linreg_stats", oracle=_LINREG_ORACLE)
def q_linreg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _probe_features(spark, sf_dir)
    pairs = [
        ("b", "b"), ("b", "sp"), ("b", "dg"), ("b", "y"),
        ("sp", "sp"), ("sp", "dg"), ("sp", "y"),
        ("dg", "dg"), ("dg", "y"), ("y", "y"),
    ]
    # r13: aggregates as parsed SQL (SUM coercions identical to the
    # former Column forms: int*int sums to BIGINT in both).
    aggs = [F.count("*").alias("n")]
    aggs += [F.expr(f"SUM({c})").alias(f"s_{c}") for c in ("b", "sp", "dg", "y")]
    aggs += [
        F.expr(f"SUM({a} * {bb})").alias(f"ss_{a}_{bb}") for a, bb in pairs
    ]
    return f.agg(*aggs)


# ---------------------------------------------------------------------------
# L43 — D4-style prototypicality pruning (r7): the second stage of D4
# (Tirumala et al. 2023) — after SemDeDup removes semantic duplicates,
# drop each cluster's MOST PROTOTYPICAL members (closest to the
# centroid): they carry the least marginal information, and pruning
# them measurably improves data efficiency.  Composes the q_kmeans2
# trained clustering (the shared CTE prefix, same determinism
# machinery: exact fixed-point centroid means) with a per-member
# cosine-to-centroid rank on the same _D-dim basis; the top ceil(20%)
# of every cluster is flagged pruned.  Output = the full per-member
# audit table (cos, rank, cluster size, pruned flag) — the drop list a
# curation run applies.
#
# 100 TB posture: inherits q_kmeans2's broadcast-centroid map-side
# assignment; the rank is one window over |cluster| keys; nothing
# corpus-quadratic anywhere (the SemDeDup intra-cluster pair scan is
# the preceding, separately-declared stage).
# ---------------------------------------------------------------------------
_PROTO_FRAC = 0.2


def _proto_prune_oracle() -> str:
    return _kmeans_cte_prefix() + f""",
m AS (
  SELECT a.vec_id, a.cid,
         ROUND(list_cosine_similarity(
             CAST(e.embedding[1:{_D}] AS DOUBLE[]), c.c), 6) AS proto_cos
  FROM asg2 a
  JOIN emb e ON e.vec_id = a.vec_id
  JOIN c2 c ON c.cid = a.cid
),
r AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY cid ORDER BY proto_cos DESC, vec_id) AS INT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS n_cluster
  FROM m
)
SELECT vec_id, cid, proto_cos, rk, n_cluster,
       rk <= CAST(CEIL({_PROTO_FRAC} * n_cluster) AS INT) AS pruned
FROM r
ORDER BY vec_id
"""


@query("q_proto_prune", oracle=_proto_prune_oracle())
def q_proto_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c0 = emb.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.transform(
            F.slice("embedding", 1, _D), lambda x: x.cast("double")
        ).alias("c"),
    )
    asg1 = _assign(emb, c0)
    c1 = _update(emb, asg1)
    asg2 = _assign(emb, c1)
    c2 = _update(emb, asg2)

    e8 = F.transform(F.slice("embedding", 1, _D), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(e8, F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(col):
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda a: a * a),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    m = (
        asg2.join(emb, "vec_id")
        .join(F.broadcast(c2), "cid")
        .select(
            "vec_id",
            "cid",
            F.round(dot / (norm(e8) * norm(F.col("c"))), 6).alias(
                "proto_cos"
            ),
        )
    )
    wr = Window.partitionBy("cid").orderBy(F.desc("proto_cos"), "vec_id")
    wc = Window.partitionBy("cid")
    r = m.withColumn("rk", F.row_number().over(wr).cast("int")).withColumn(
        "n_cluster", F.count("*").over(wc)
    )
    return r.select(
        "vec_id",
        "cid",
        "proto_cos",
        "rk",
        "n_cluster",
        (
            F.col("rk")
            <= F.ceil(F.lit(_PROTO_FRAC) * F.col("n_cluster")).cast("int")
        ).alias("pruned"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# L5g — ANN recall evaluation harness (r13), ORACLE-CHECKED end to end.
# The eval face every retrieval deployment runs before trusting an
# index: recall@k of the index against exact brute-force ground truth
# over a panel of probe queries.  Both sides are deterministic here —
# ground truth is the verified q_cosine_topk arithmetic per query, the
# index side is the q_ann_ivf_det trained coarse quantizer (shared
# q_kmeans2 CTE prefix in the oracle) probed per query — so recall@10
# per query is a REPLAYABLE number, not a rows-only claim.  A qid with
# zero hits survives via the left join (coalesce 0), though the
# assigned-cell argument guarantees >= 1 (the query vector's own cell
# IS its nearest centroid, so the query itself is always a candidate).
#
# Scale posture: ground truth is the deliberate brute-force arm — the
# offline eval cost, |Q| x N map-side scores (|Q| bounded, broadcast);
# every ranking window is qid-PARTITIONED (hash exchange, never a
# SinglePartition funnel — plan-gated); the index arm reuses the IVF
# probe pruning, so its cost is |Q| x (2/k of the corpus).
# ---------------------------------------------------------------------------
_NQ_EVAL = 8


_ANN_RECALL_ORACLE = _kmeans_cte_prefix() + f""",
qs AS (
  SELECT vec_id AS qid, embedding AS qemb FROM emb WHERE vec_id < {_NQ_EVAL}
),
gt AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY ROUND(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]),
                        CAST(q.qemb AS DOUBLE[])), 6) DESC, e.vec_id
           ) AS rk
    FROM emb e CROSS JOIN qs q
  ) WHERE rk <= 10
),
probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY {_dist_sql('q', 'c')}, c.cid
           ) AS rk
    FROM (SELECT qid, qemb AS embedding FROM qs) q CROSS JOIN c2 c
  ) WHERE rk <= 2
),
cand AS (
  SELECT p.qid, a.vec_id FROM asg2 a JOIN probe p ON a.cid = p.cid
),
ncand AS (
  SELECT qid, COUNT(*) AS n_cand FROM cand GROUP BY qid
),
ivf AS (
  SELECT qid, vec_id FROM (
    SELECT cd.qid, e.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY cd.qid
             ORDER BY ROUND(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]),
                        CAST(q.qemb AS DOUBLE[])), 6) DESC, e.vec_id
           ) AS rk
    FROM cand cd
    JOIN emb e USING (vec_id)
    JOIN qs q ON q.qid = cd.qid
  ) WHERE rk <= 10
),
hits AS (
  SELECT g.qid, COUNT(i.vec_id) AS n_match
  FROM gt g LEFT JOIN ivf i ON i.qid = g.qid AND i.vec_id = g.vec_id
  GROUP BY g.qid
)
SELECT h.qid,
       CAST(n.n_cand AS INT) AS n_cand,
       CAST(h.n_match AS INT) AS n_match,
       ROUND(CAST(h.n_match AS DOUBLE) / 10, 6) AS recall
FROM hits h JOIN ncand n USING (qid)
ORDER BY h.qid
"""


@query("q_ann_recall_eval", oracle=_ANN_RECALL_ORACLE)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c0 = emb.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.transform(
            F.slice("embedding", 1, _D), lambda x: x.cast("double")
        ).alias("c"),
    )
    asg1 = _assign(emb, c0)
    c1 = _update(emb, asg1)
    asg2 = _assign(emb, c1)
    c2 = _update(emb, asg2)

    qs = emb.where(F.col("vec_id") < _NQ_EVAL).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )

    def _cos(ecol: str, qcol: str) -> Column:
        dot = F.aggregate(
            F.zip_with(
                ecol, qcol, lambda a, b: a.cast("double") * b.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

        def norm(col):
            return F.sqrt(
                F.aggregate(
                    F.transform(
                        col, lambda a: a.cast("double") * a.cast("double")
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )

        return F.round(dot / (norm(F.col(ecol)) * norm(F.col(qcol))), 6)

    wq = Window.partitionBy("qid")

    gt = (
        emb.crossJoin(F.broadcast(qs))
        .select("qid", "vec_id", _cos("embedding", "qemb").alias("score"))
        .withColumn(
            "rk",
            F.row_number().over(wq.orderBy(F.desc("score"), "vec_id")),
        )
        .where(F.col("rk") <= 10)
        .select("qid", "vec_id")
    )

    q8 = qs.select(
        "qid",
        F.transform(F.slice("qemb", 1, _D), lambda x: x.cast("double")).alias(
            "qe"
        ),
    )
    dist: Column = None
    for d in range(1, _D + 1):
        t = (F.element_at(F.col("qe"), d) - F.element_at(F.col("c"), d)) * (
            F.element_at(F.col("qe"), d) - F.element_at(F.col("c"), d)
        )
        dist = t if dist is None else dist + t
    probe = (
        c2.crossJoin(F.broadcast(q8))
        .select("qid", "cid", dist.alias("dist"))
        .withColumn(
            "rk", F.row_number().over(wq.orderBy("dist", "cid"))
        )
        .where(F.col("rk") <= 2)
        .select("qid", "cid")
    )
    cand = asg2.join(F.broadcast(probe), "cid").select("qid", "vec_id")
    ncand = cand.groupBy("qid").agg(F.count("*").cast("int").alias("n_cand"))

    ivf = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(qs), "qid")
        .select("qid", "vec_id", _cos("embedding", "qemb").alias("score"))
        .withColumn(
            "rk",
            F.row_number().over(wq.orderBy(F.desc("score"), "vec_id")),
        )
        .where(F.col("rk") <= 10)
        .select("qid", F.col("vec_id").alias("ivf_vec_id"))
    )

    hits = (
        gt.join(
            ivf,
            (gt["qid"] == ivf["qid"]) & (gt["vec_id"] == ivf["ivf_vec_id"]),
            "left",
        )
        .groupBy(gt["qid"].alias("qid"))
        .agg(F.count("ivf_vec_id").cast("int").alias("n_match"))
    )

    return (
        hits.join(ncand, "qid")
        .select(
            "qid",
            "n_cand",
            "n_match",
            F.round(F.col("n_match").cast("double") / 10, 6).alias("recall"),
        )
        .orderBy("qid")
    )
