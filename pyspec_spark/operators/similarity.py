"""Similarity search over embedding columns — SURVEY.md §2.12 L5 and the
north-star ANN brief.

Four single-probe tiers, same answer shape (vec_id, score) — plus the
batch k-NN joins (`knn_join_exact` / `knn_join_lsh`, every query row
gets its top-k) and the IVFADC composite (`ivfpq_topk_df`) built from
the tiers below:
- `cosine_topk` — exact brute force: JVM-side zip_with/aggregate dot
  product against a broadcast query vector, TakeOrderedAndProject top-k.
  The correctness baseline and the right plan up to ~10^7 vectors/task.
- `lsh_topk` — random-hyperplane LSH: signatures computed JVM-side from
  a seeded driver-generated plane matrix (literal arrays), Hamming-band
  blocking, exact re-rank inside candidate buckets.  The 100 TB path:
  candidate generation is an equi-join on band values.
- `ivf_topk` — inverted-file: k-means-lite centroids (deterministic
  seeded sample + a few Lloyd iterations on a sample), assign each
  vector to its nearest centroid (map-only), probe the closest n_probe
  cells at query time.  Mirrors production IVF layouts where each cell
  is a partition/file — partition pruning for vectors.
- `pq_*` — product quantization (Jégou et al. 2011, "Product
  quantization for nearest neighbor search"): split each d-dim vector
  into M subspaces, vector-quantize each subvector against a K-entry
  per-subspace codebook, store only the M byte codes (d floats -> M
  bytes: 64x compression at d=64, M=4, K<=256), answer queries by
  asymmetric distance computation (ADC) — a broadcast M x K lookup
  table of query-to-codeword distances, scored per row as M array
  lookups + a fixed-order sum.  Encode and scoring are both MAP-ONLY
  (broadcast codebook / LUT, argmin via array_min over a struct array
  — no groupBy), so at 100 TB the scan of the code column is the whole
  cost; the codes table is ~d*4/M-fold smaller than the raw embeddings.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_expr(vec_col, qlit):
    """JVM dot product: sum over zip_with(vec, query, *)."""
    return F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_cols(a_col, b_col):
    """JVM dot product of two array columns (both cast to double)."""
    return F.aggregate(
        F.zip_with(a_col, b_col, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(vec_col):
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _dot_sql(a: str, b: str) -> str:
    """Parsed-SQL face of :func:`_dot_cols` — same expression tree, one
    py4j round trip however wide (r13 plan-construction note in
    queries/curation._replicate_copies)."""
    return (
        f"aggregate(zip_with({a}, {b},"
        " (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x)"
    )


def _norm_sql(v: str) -> str:
    """Parsed-SQL face of :func:`_norm_expr`."""
    return (
        f"sqrt(aggregate(transform({v},"
        " a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x))"
    )


def cosine_topk(
    emb: DataFrame,
    query: list[float] | np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector (brute force)."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qlit = F.array(*[F.lit(float(v)) for v in q])
    cos = _dot_expr(F.col(vec_col), qlit) / (_norm_expr(F.col(vec_col)) * qn)
    return (
        emb.select(F.col(id_col).alias("vec_id"), cos.alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _sig_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Hyperplane signature of an array column as a BIGINT expression
    (bit i = sign of dot with plane i).  Pure codegen, reusable for both
    the corpus and an in-plan query row."""
    n_planes = planes.shape[0]
    bits = []
    for i in range(n_planes):
        plit = F.array(*[F.lit(float(v)) for v in planes[i]])
        bit = (_dot_expr(vec_col, plit) > 0).cast("long")
        bits.append(F.shiftleft(bit, i))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane signature as a BIGINT (bit i = sign of dot with
    plane i).  Planes are literals — no join, pure codegen.  ``dim`` is
    a parameter (it must match the embedding width) so building the plan
    never runs a driver-side first() probe job."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = _sig_expr(F.col(vec_col), planes)
    return emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col), sig.alias("sig"))


def lsh_topk(
    emb: DataFrame,
    query: list[float] | np.ndarray,
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates = vectors whose signature is within
    `max_hamming` bits of the query's, exact cosine re-rank on those."""
    q = np.asarray(query, dtype=np.float64)
    dim = q.size
    planes = _hyperplanes(dim, n_planes, seed)
    q_sig = 0
    for i in range(n_planes):
        if float(planes[i] @ q) > 0:
            q_sig |= 1 << i
    sigs = lsh_signatures(emb, n_planes, seed, id_col, vec_col, dim=dim)
    cand = sigs.where(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(q_sig))) <= max_hamming
    )
    qn = float(np.linalg.norm(q))
    qlit = F.array(*[F.lit(float(v)) for v in q])
    cos = _dot_expr(F.col(vec_col), qlit) / (_norm_expr(F.col(vec_col)) * qn)
    return (
        cand.select("vec_id", cos.alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )


def lsh_topk_df(
    emb: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int | None = None,
) -> DataFrame:
    """ANN top-k with the probe vector IN-PLAN: ``query_df`` is a 1-row
    DataFrame whose ``vec_col`` is the query embedding.  Its signature
    is computed with the same plane-literal expression as the corpus
    signatures and broadcast in — building this plan runs zero Spark
    jobs, and at cluster scale the probe never transits the driver.
    ``round_digits`` rounds the score BEFORE the ordered limit (the
    oracle-determinism convention: rank on the rounded value with the
    id tiebreak, SURVEY §5.3)."""
    planes = _hyperplanes(dim, n_planes, seed)
    sigs = lsh_signatures(emb, n_planes, seed, id_col, vec_col, dim=dim)
    q = query_df.select(
        F.col(vec_col).alias("qv"),
        _sig_expr(F.col(vec_col), planes).alias("qsig"),
    )
    cand = sigs.crossJoin(F.broadcast(q)).where(
        F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= max_hamming
    )
    cos = _dot_cols(F.col(vec_col), F.col("qv")) / (
        _norm_expr(F.col(vec_col)) * _norm_expr(F.col("qv"))
    )
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        cand.select("vec_id", cos.alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )


def train_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    n_iter: int = 5,
    sample: int = 2000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (IVF training
    is always a sample-based step; the full data never leaves executors).
    Sampled orderBy(id).limit(sample) so the model depends on the data,
    not the partition layout (see train_centroids_df)."""
    rows = emb.orderBy(id_col).limit(sample).select(vec_col).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(0)
    return C


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only cell assignment: argmin distance over literal centroids.
    At rest this becomes the partition key (write .partitionBy('cell'))."""
    n_cells = centroids.shape[0]
    dists = []
    for c in range(n_cells):
        clit = F.array(*[F.lit(float(v)) for v in centroids[c]])
        d2 = F.aggregate(
            F.zip_with(F.col(vec_col), clit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(d2)
    arr = F.array(*dists)
    cell = F.expr(
        "array_position(" + "d_arr" + ", array_min(d_arr)) - 1"
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col), arr.alias("d_arr"))
        .withColumn("cell", cell.cast("int"))
        .drop("d_arr")
    )


def ivf_topk(
    emb_assigned: DataFrame,
    centroids: np.ndarray,
    query: list[float] | np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells, exact re-rank inside them."""
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(1))
    probe = [int(c) for c in order[:n_probe]]
    qn = float(np.linalg.norm(q))
    qlit = F.array(*[F.lit(float(v)) for v in q])
    cos = _dot_expr(F.col(vec_col), qlit) / (_norm_expr(F.col(vec_col)) * qn)
    return (
        emb_assigned.where(F.col("cell").isin(probe))
        .select("vec_id", cos.alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# In-plan IVF: training, assignment, and probe selection all live inside
# ONE DataFrame plan — building it runs zero Spark jobs, and neither the
# sample nor the probe vector ever transits the driver.  The trained
# model is a 1-row (cents ARRAY<ARRAY<DOUBLE>>) DataFrame produced
# executor-side by mapInPandas over a coalesced bounded sample; it
# broadcasts into assignment exactly like the literal-array variant.
# ---------------------------------------------------------------------------
def train_centroids_df(
    emb: DataFrame,
    n_cells: int = 16,
    n_iter: int = 5,
    sample: int = 2000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic k-means-lite trained INSIDE the plan: orderBy(id)
    .limit(sample) -> coalesce(1) -> numpy Lloyd in mapInPandas ->
    1-row centroid model.  Same algorithm as `train_centroids`, no
    driver collect.

    The sample is ordered by ``id_col`` before the limit (compiles to
    TakeOrderedAndProject — a bounded per-partition top-``sample``, not
    a full sort), so the trained centroids are a function of the DATA,
    not of partition layout: a repartitioned or re-written input trains
    the identical model (round-3 ADVICE; a bare limit() takes whichever
    rows arrive first)."""

    def fit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [
            np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            for pdf in batches
            if len(pdf)
        ]
        if not chunks:
            return
        X = np.vstack(chunks)
        k = min(n_cells, len(X))
        rng = np.random.default_rng(seed)
        C = X[rng.choice(len(X), size=k, replace=False)]
        for _ in range(n_iter):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(k):
                m = assign == c
                if m.any():
                    C[c] = X[m].mean(0)
        yield pd.DataFrame({"cents": [C.tolist()]})

    return (
        emb.orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .coalesce(1)
        .mapInPandas(fit, "cents array<array<double>>")
    )


def _cell_dists(vec_col: Column) -> Column:
    """ARRAY<DOUBLE> of squared distances from vec_col to each centroid
    in the broadcast `cents` column."""
    return F.transform(
        F.col("cents"),
        lambda c: F.aggregate(
            F.zip_with(
                vec_col,
                c,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def ivf_assign_df(
    emb: DataFrame,
    cents_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only cell assignment against the in-plan centroid model.
    At rest `cell` becomes the partition key (write .partitionBy)."""
    return (
        emb.crossJoin(F.broadcast(cents_df))
        .withColumn("_d2", _cell_dists(F.col(vec_col)))
        .withColumn(
            "cell", F.expr("array_position(_d2, array_min(_d2)) - 1").cast("int")
        )
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col), "cell")
    )


def ivf_topk_df(
    emb_assigned: DataFrame,
    cents_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe cells nearest the IN-PLAN query vector, exact
    cosine re-rank inside them.  ``query_df`` is a 1-row DataFrame with
    ``vec_col``; probe selection is an array-sort over the centroid
    distance vector with a cell-id tiebreak — no driver-side argsort."""
    probed = (
        query_df.select(F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cents_df))
        .select(
            "qv",
            F.transform(
                F.slice(
                    F.array_sort(
                        F.transform(
                            _cell_dists(F.col("qv")),
                            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                        )
                    ),
                    1,
                    n_probe,
                ),
                lambda s: s["i"],
            ).alias("probe_cells"),
        )
    )
    cos = _dot_cols(F.col(vec_col), F.col("qv")) / (
        _norm_expr(F.col(vec_col)) * _norm_expr(F.col("qv"))
    )
    return (
        emb_assigned.crossJoin(F.broadcast(probed))
        .where(F.array_contains("probe_cells", F.col("cell")))
        .select("vec_id", cos.alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the memory-bounded ANN
# tier: d floats/vector at rest become M small-int codes, and query
# scoring never touches the original embeddings.  Everything below is
# in-plan (zero Spark jobs at build): codebooks and LUTs are 1-row
# DataFrames broadcast into map-only selects.
# ---------------------------------------------------------------------------
def _pq_subdist(e_col: Column, c: Column, offset: int, subd: int) -> Column:
    """Fixed-order squared distance between e_col[offset+1..offset+subd]
    (any numeric array) and codeword c[1..subd] (double array): an
    explicit left-associated term chain, so both engines of an oracle
    pair evaluate bit-identical IEEE sums (the q_kmeans2 idiom)."""
    dist: Column | None = None
    for d in range(1, subd + 1):
        t = (F.element_at(e_col, offset + d).cast("double") - F.element_at(c, d)) * (
            F.element_at(e_col, offset + d).cast("double") - F.element_at(c, d)
        )
        dist = t if dist is None else dist + t
    return dist


def pq_codebooks_firstk_df(
    emb: DataFrame,
    m: int = 4,
    subd: int = 16,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebooks: for each subspace, the codewords are
    the subvectors of the k lowest-id vectors (no RNG, no iteration —
    the cross-engine-checkable init, mirroring q_kmeans2's c0).  Returns
    ONE row with columns cb0..cb{m-1}, each ARRAY<ARRAY<DOUBLE>> ordered
    by source id.  Production accuracy wants `pq_codebooks_trained_df`;
    this variant exists so the full encode/ADC pipeline can be replayed
    exactly in SQL."""
    base = emb.where(F.col(id_col) < k)
    aggs = []
    for mi in range(m):
        sub = F.transform(
            F.slice(vec_col, mi * subd + 1, subd), lambda x: x.cast("double")
        )
        aggs.append(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col).alias("id"), sub.alias("sub")))
                ),
                lambda s: s["sub"],
            ).alias(f"cb{mi}")
        )
    return base.groupBy().agg(*aggs)


def pq_codebooks_trained_df(
    emb: DataFrame,
    m: int = 4,
    subd: int = 16,
    k: int = 16,
    n_iter: int = 5,
    sample: int = 2000,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production PQ training: per-subspace k-means (Lloyd) on an
    ordered bounded sample, INSIDE the plan (mapInPandas over
    orderBy(id).limit(sample).coalesce(1) — the train_centroids_df
    recipe, run M times over subvector slices in one pass).  Returns the
    same 1-row cb0..cb{m-1} shape as the deterministic variant, so
    encode/ADC code paths are shared.

    Empty-input contract (deliberate, matching the engine-wide
    empty-partition rule test_empty_inputs.py enforces): an empty
    `emb` yields a ZERO-row codebook, and every downstream
    pq_encode_df/pq_adc_topk_df crossJoin then yields zero rows —
    empty-in, empty-out, never an executor-side exception."""

    def fit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [
            np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            for pdf in batches
            if len(pdf)
        ]
        if not chunks:
            return
        X = np.vstack(chunks)
        out = {}
        for mi in range(m):
            S = X[:, mi * subd : (mi + 1) * subd]
            kk = min(k, len(S))
            rng = np.random.default_rng(seed + mi)
            C = S[rng.choice(len(S), size=kk, replace=False)]
            for _ in range(n_iter):
                d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                assign = d2.argmin(1)
                for c in range(kk):
                    msk = assign == c
                    if msk.any():
                        C[c] = S[msk].mean(0)
            out[f"cb{mi}"] = [C.tolist()]
        yield pd.DataFrame(out)

    schema = ", ".join(f"cb{mi} array<array<double>>" for mi in range(m))
    return (
        emb.orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .coalesce(1)
        .mapInPandas(fit, schema)
    )


def pq_encode_df(
    emb: DataFrame,
    cb_df: DataFrame,
    m: int = 4,
    subd: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """MAP-ONLY PQ encoding: broadcast the 1-row codebook, per subspace
    take argmin over the codeword array via array_min of (dist, code)
    structs — per-row work, NO shuffle (the SQL-oracle equivalent needs
    a groupBy; array_min beats it).  Ties break to the lowest code, the
    struct-ordering semantics both engines share.  Output:
    (vec_id, code0..code{m-1}) — the at-rest representation, d*4/M
    times smaller than the embedding column."""
    enc = emb.crossJoin(F.broadcast(cb_df))
    cols = [F.col(id_col).alias("vec_id")] + [F.col(c) for c in keep_cols]

    def scorer(off):
        def fn(c, i):
            return F.struct(
                _pq_subdist(F.col(vec_col), c, off, subd).alias("d"),
                i.alias("code"),
            )

        return fn

    for mi in range(m):
        best = F.array_min(F.transform(F.col(f"cb{mi}"), scorer(mi * subd)))
        cols.append(best["code"].alias(f"code{mi}"))
    return enc.select(*cols)


def pq_adc_topk_df(
    codes_df: DataFrame,
    cb_df: DataFrame,
    query_df: DataFrame,
    m: int = 4,
    subd: int = 16,
    k: int = 10,
    round_digits: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric distance computation: build the M x K LUT of
    query-subvector-to-codeword distances as ONE broadcast row
    (query_df crossJoin codebook — still in-plan), then score each
    encoded vector as a fixed-order sum of M array lookups and take
    the global top-k (TakeOrderedAndProject).  The scan never reads
    the original embeddings — the 100 TB memory story."""
    def lut_fn(off):
        def fn(c):
            return _pq_subdist(F.col("qv"), c, off, subd)

        return fn

    luts = [F.col("qv")]
    for mi in range(m):
        luts.append(
            F.transform(F.col(f"cb{mi}"), lut_fn(mi * subd)).alias(f"lut{mi}")
        )
    lut_row = (
        query_df.select(F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cb_df))
        .select(*luts)
        .drop("qv")
    )
    adc: Column | None = None
    for mi in range(m):
        t = F.element_at(F.col(f"lut{mi}"), F.col(f"code{mi}") + 1)
        adc = t if adc is None else adc + t
    if round_digits is not None:
        adc = F.round(adc, round_digits)
    return (
        codes_df.crossJoin(F.broadcast(lut_row))
        .select("vec_id", adc.alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )


def pq_rerank_topk_df(
    emb: DataFrame,
    codes_df: DataFrame,
    cb_df: DataFrame,
    query_df: DataFrame,
    m: int = 8,
    subd: int = 8,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """The production PQ search shape (IVFADC+R in the PQ literature):
    ADC over the code columns produces a `shortlist`-sized candidate
    set (the cheap scan — codes only), then ONLY those rows' original
    embeddings are fetched for an exact cosine re-rank.  At 100 TB the
    re-rank join touches `shortlist` rows of the embedding table (a
    broadcast semi-join on ids), so the full-precision data is read
    back for a few hundred rows regardless of corpus size — the
    quantization error never decides the final ranking, only the
    candidate set."""
    short = pq_adc_topk_df(
        codes_df, cb_df, query_df, m=m, subd=subd, k=shortlist,
        vec_col=vec_col,
    ).select("vec_id")
    cos = _dot_cols(F.col(vec_col), F.col("qv")) / (
        _norm_expr(F.col(vec_col)) * _norm_expr(F.col("qv"))
    )
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        emb.join(F.broadcast(short), emb[id_col] == short["vec_id"], "leftsemi")
        .crossJoin(F.broadcast(query_df.select(F.col(vec_col).alias("qv"))))
        .select(F.col(id_col).alias("vec_id"), cos.alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(k)
    )


def ivfpq_topk_df(
    emb: DataFrame,
    cents_df: DataFrame,
    cb_df: DataFrame,
    query_df: DataFrame,
    m: int = 8,
    subd: int = 8,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §IV): the composite production index —
    IVF cell pruning picks WHICH partitions to scan, PQ codes decide
    WHAT to shortlist inside them, exact re-rank fixes the final order.
    All three models (centroids, codebooks, probe list) are broadcast
    1-row DataFrames; building the plan runs zero Spark jobs.

    100 TB shape: at rest the table is partitioned by `cell` and
    carries only (vec_id, cell, code0..code{m-1}) in the hot path —
    the probe prunes to n_probe/n_cells of the FILES (partition
    pruning), the ADC scan reads M small-int columns of those files,
    and the re-rank fetches `shortlist` full vectors.  Nothing else is
    touched."""
    assigned = ivf_assign_df(emb, cents_df, vec_col=vec_col)
    codes = pq_encode_df(
        assigned, cb_df, m=m, subd=subd, vec_col=vec_col, keep_cols=("cell",)
    )
    probed = (
        query_df.select(F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cents_df))
        .select(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.transform(
                            _cell_dists(F.col("qv")),
                            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                        )
                    ),
                    1,
                    n_probe,
                ),
                lambda s: s["i"],
            ).alias("probe_cells"),
        )
    )
    pruned = codes.crossJoin(F.broadcast(probed)).where(
        F.array_contains("probe_cells", F.col("cell"))
    )
    return pq_rerank_topk_df(
        emb,
        pruned,
        cb_df,
        query_df,
        m=m,
        subd=subd,
        k=k,
        shortlist=shortlist,
        vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# k-NN JOIN — every row of a query set finds its top-k neighbors in the
# corpus (the batch shape that powers near-dup clustering, kNN
# classification, and retrieval eval; the single-probe topk functions
# above are its 1-row special case).
# ---------------------------------------------------------------------------
def knn_join_exact(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Exact cosine k-NN join: broadcast the query set against the
    corpus scan, score every (query, vector) pair map-side, keep top-k
    per query with a qid-partitioned rank window (self-matches
    excluded).  Correct baseline; cost is O(|corpus| x |queries|)
    scored map-side — right up to a few thousand queries, after which
    `knn_join_lsh` prunes candidates first."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    cos = _dot_cols(F.col(vec_col), F.col("qv")) / (
        _norm_expr(F.col(vec_col)) * _norm_expr(F.col("qv"))
    )
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("qid"))
        .select("qid", F.col(id_col).alias("vec_id"), cos.alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "vec_id", "score", "rk")
    )


def knn_join_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 16,
    max_hamming: int = 2,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-pruned k-NN join — the corpus-scale path for NEAR-DUPLICATE
    neighbors: both sides get the same hyperplane signatures, candidate
    pairs come from an equi-join on each 8-bit signature band
    (pigeonhole: a pair within n_bands-1 Hamming bits is GUARANTEED to
    share a band; beyond that recall decays), verified by
    full-signature Hamming <= max_hamming, then exact cosine re-rank
    and a per-query top-k window.  The candidate generator is a band
    equi-join — never |corpus| x |queries| — so both sides scale
    independently; band buckets hold ~|side|/256 rows each.

    REGIME (measured, test_llm_ops.py): on near-duplicate neighbors
    (perturbed copies, the dedup/contamination use case) planted-NN
    recall is 18/20; on a near-RANDOM corpus whose true neighbors sit
    at wide angles (the sf0.001 synthetic embeddings) banded 16-bit
    signatures cannot see them — use `knn_join_exact` (small query
    sets) or the IVF/PQ tiers (corpus scale) for that geometry."""
    from pyspark.sql import Window

    n_bands = n_planes // 8
    sigs = lsh_signatures(emb, n_planes, seed, id_col, vec_col, dim=dim)
    qsigs = lsh_signatures(queries, n_planes, seed, id_col, vec_col, dim=dim)

    def banded(s, prefix):
        bands = F.array(
            *[
                F.shiftrightunsigned(F.col("sig"), 8 * b)
                .bitwiseAND(F.lit(255))
                .cast("int")
                for b in range(n_bands)
            ]
        )
        return s.select(
            F.col("vec_id").alias(f"{prefix}id"),
            F.col(vec_col).alias(f"{prefix}v"),
            F.col("sig").alias(f"{prefix}sig"),
            F.posexplode(bands).alias("b", f"{prefix}band"),
        )

    cand = (
        banded(sigs, "c")
        .join(
            banded(qsigs, "q").withColumnRenamed("qband", "cband"),
            ["b", "cband"],
        )
        .where(F.col("cid") != F.col("qid"))
        .where(
            F.bit_count(F.col("csig").bitwiseXOR(F.col("qsig"))) <= max_hamming
        )
        .select("qid", "cid", "cv", "qv")
        .dropDuplicates(["qid", "cid"])
    )
    cos = _dot_cols(F.col("cv"), F.col("qv")) / (
        _norm_expr(F.col("cv")) * _norm_expr(F.col("qv"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "vec_id")
    return (
        cand.select("qid", F.col("cid").alias("vec_id"), cos.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "vec_id", "score", "rk")
    )


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998): pick
# k results from a relevance shortlist, greedily trading relevance
# against redundancy:  argmax  lam*rel(c) - (1-lam)*max_{s in S} cos(c,s).
#
# Scale posture: the EXPENSIVE part is shortlist generation, which is
# whatever ANN/exact top-N the caller supplies (bounded N rows); the
# greedy itself is O(k*N*dim) over that bounded list and runs in ONE
# executor-side applyInPandas group — never on the driver, never over
# the corpus.  Determinism: all cosines snap to 6 places (half away
# from zero, the DuckDB/Spark ROUND rule) before comparison, with a
# vec_id tiebreak, so a DuckDB recursive CTE can replay the selection
# bit-for-bit.
# ---------------------------------------------------------------------------
def _round6(x: float) -> float:
    s = x * 1e6
    import math as _m

    return (_m.floor(s + 0.5) if s >= 0 else -_m.floor(0.5 - s)) / 1e6


def _seq_cos(a, b) -> float:
    """Sequential-sum cosine in float64 — mirrors the F.aggregate /
    list_cosine_similarity evaluation order so 6-place rounding is
    engine-stable (the q_cosine_topk proven parity idiom)."""
    import math as _m

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (_m.sqrt(na) * _m.sqrt(nb))


def mmr_rerank(
    shortlist: DataFrame,
    k: int = 8,
    lam: float = 0.7,
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "emb",
) -> DataFrame:
    """Greedy MMR over a bounded shortlist DataFrame with columns
    (id_col BIGINT, rel_col DOUBLE — 6-place-rounded relevance,
    vec_col ARRAY<DOUBLE>).  Returns (rank, vec_id, rel, mmr)."""

    def _select(pdf):
        import pandas as pd

        cands = [
            (int(r[id_col]), float(r[rel_col]), [float(x) for x in r[vec_col]])
            for _, r in pdf.iterrows()
        ]
        remaining = sorted(cands, key=lambda c: (-c[1], c[0]))
        out = []
        sel_vecs: list[list[float]] = []
        for rank in range(1, min(k, len(cands)) + 1):
            if rank == 1:
                best = remaining[0]
                best_score = best[1]
            else:
                best, best_score = None, None
                for c in remaining:
                    maxsim = max(
                        _round6(_seq_cos(c[2], s)) for s in sel_vecs
                    )
                    score = _round6(lam * c[1] - (1.0 - lam) * maxsim)
                    if (
                        best is None
                        or score > best_score
                        or (score == best_score and c[0] < best[0])
                    ):
                        best, best_score = c, score
            out.append((rank, best[0], best[1], best_score))
            sel_vecs.append(best[2])
            remaining = [c for c in remaining if c[0] != best[0]]
        return pd.DataFrame(out, columns=["rank", "vec_id", "rel", "mmr"])

    return (
        shortlist.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            _select, "rank INT, vec_id BIGINT, rel DOUBLE, mmr DOUBLE"
        )
        .orderBy("rank")
    )


def mmr_rerank_sql(
    shortlist: DataFrame,
    k: int = 8,
    lam: float = 0.7,
) -> DataFrame:
    """JVM-side twin of mmr_rerank: the greedy selection unrolled as k
    chained Catalyst expression steps over the collected shortlist
    array — zero Python workers.  Kept as a determinism CROSS-CHECK,
    not the production path: measured on a cached 20-row shortlist at
    sf0.1, the interpreted nested-HOF greedy costs ~0.37 s vs ~0.19 s
    for the Arrow round trip + numpy greedy — HigherOrderFunction
    lambdas are CodegenFallback, so each of the ~300 pair-cosines pays
    interpreted-expression overhead that dwarfs one pandas worker hop.
    The declared q_mmr_rerank therefore uses mmr_rerank (applyInPandas);
    the three-way agreement (this twin == pandas == DuckDB recursive
    CTE, bit-for-bit at sf0.001/0.01/0.1) is what this form buys.

    Numerics mirror mmr_rerank exactly: per-vector norms precomputed as
    sqrt(sum sq), pair cosine = seqdot/(nrm_a*nrm_b) rounded to 6, the
    same (score desc, vec_id asc) tiebreak — so the two forms and the
    DuckDB recursive-CTE oracle agree bit-for-bit."""
    lam_c, inv_c = F.lit(lam), F.lit(round(1.0 - lam, 6))

    def _nrm(vec):
        return F.sqrt(
            F.aggregate(
                F.transform(vec, lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )

    def _cos(c, s):
        dot = F.aggregate(
            F.zip_with(c["emb"], s["emb"], lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.round(dot / (c["nrm"] * s["nrm"]), 6)

    one = shortlist.select(
        F.struct(
            F.col("vec_id"),
            F.col("rel"),
            F.col("emb"),
            _nrm(F.col("emb")).alias("nrm"),
        ).alias("c")
    ).agg(F.collect_list("c").alias("cand"))

    # named_struct, not struct(...alias...): aliases inside a HOF
    # lambda do not survive analysis (fields come out col1/col2/...)
    by_rel = F.transform(
        F.sort_array(
            F.transform(
                F.col("cand"),
                lambda c: F.named_struct(
                    F.lit("k1"), -c["rel"],
                    F.lit("k2"), c["vec_id"],
                    F.lit("c"), c,
                ),
            )
        ),
        lambda s: s["c"],
    )
    first = F.get(by_rel, 0)
    sel0 = F.array(
        F.struct(
            first["vec_id"].alias("vec_id"),
            first["rel"].alias("rel"),
            first["rel"].alias("mmr"),
            first["emb"].alias("emb"),
            first["nrm"].alias("nrm"),
        )
    )
    df = one.select("cand", sel0.alias("sel1"))

    for step in range(2, k + 1):
        sel = F.col(f"sel{step - 1}")
        sel_ids = F.transform(sel, lambda s: s["vec_id"])

        def _score(c, _sel=sel):
            maxsim = F.array_max(
                F.transform(_sel, lambda s: _cos(c, s))
            )
            return F.round(lam_c * c["rel"] - inv_c * maxsim, 6)

        scored = F.transform(
            F.filter(
                F.col("cand"),
                lambda c: ~F.array_contains(sel_ids, c["vec_id"]),
            ),
            lambda c: F.named_struct(
                F.lit("k1"), -_score(c),
                F.lit("k2"), c["vec_id"],
                F.lit("mmr"), _score(c),
                F.lit("c"), c,
            ),
        )
        pick = F.get(F.sort_array(scored), 0)
        nxt = F.when(
            pick.isNotNull(),
            F.concat(
                sel,
                F.array(
                    F.struct(
                        pick["c"]["vec_id"].alias("vec_id"),
                        pick["c"]["rel"].alias("rel"),
                        pick["mmr"].alias("mmr"),
                        pick["c"]["emb"].alias("emb"),
                        pick["c"]["nrm"].alias("nrm"),
                    )
                ),
            ),
        ).otherwise(sel)
        # Generate is a projection barrier (the q_repetition lesson):
        # without it the optimizer inlines sel{step-1} into its ~19
        # uses here, and the expression tree grows ~19^k — measured as
        # a driver OOM at k=8.  explode of a 1-element array keeps
        # cardinality (the optimizer cannot remove a Generate), costs
        # nothing, and caps each step's tree at a constant size.
        df = df.select(
            "cand",
            nxt.alias(f"sel{step}"),
            F.explode(F.array(F.lit(step))).alias("_barrier"),
        )

    # posexplode_OUTER, deliberately: for plain posexplode the
    # InferFiltersFromGenerate rule synthesizes a `size(sel_k) > 0`
    # filter and pushes it below every barrier — one filter expression
    # containing the WHOLE unrolled recursion inlined (measured 75 s at
    # k=4 on a 5-row shortlist; exponential in k).  The outer variant
    # gets no inferred filter; the null guard lives ABOVE the Generate
    # where it references only generator output and cannot sink.
    return (
        df.select(
            F.posexplode_outer(F.col(f"sel{k}")).alias("pos", "s")
        )
        .where(F.col("s").isNotNull())
        .select(
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("s")["vec_id"].alias("vec_id"),
            F.col("s")["rel"].alias("rel"),
            F.col("s")["mmr"].alias("mmr"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Bitext ratio-margin scoring (Artetxe & Schwenk 2019) — the arithmetic
# shared by q_bitext_mine (exact, oracle-checked) and bitext_mine_lsh
# (the corpus x corpus scale path).  Operates on a scored candidate
# table; the margin only ever sees whatever shortlist it is given, so
# swapping the exact scan for an ANN shortlist changes candidates, not
# math — the CCMatrix construction (margins over FAISS shortlists).
# ---------------------------------------------------------------------------
def bitext_margin(pairs: DataFrame, k: int = 4) -> DataFrame:
    """pairs: (src_id, tgt_id, c) with c the micro-unit integer cosine
    (the `_fixed6` basis).  Returns the best-margin target per source:
    margin = 2k*c / (sum of src's top-k c + sum of tgt's top-k c) —
    both denominators are order-independent bigint sums, one double
    division under the terminal ROUND."""
    # r13: each window step as ONE parsed-SQL projection — the former
    # per-Column construction cost ~500 py4j round trips per build
    # (plan-construction note in queries/curation._replicate_copies).
    # Step order (src, src, tgt, tgt) is preserved exactly so the
    # executed exchange layout is unchanged; expressions are the 1:1
    # transliteration of the former Column chain.
    s = (
        pairs.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY src_id"
            " ORDER BY c DESC, tgt_id) AS rk_x",
        )
        .selectExpr(
            "*",
            f"SUM(CASE WHEN rk_x <= {k} THEN c ELSE 0 END)"
            " OVER (PARTITION BY src_id) AS den_x",
        )
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY tgt_id"
            " ORDER BY c DESC, src_id) AS rk_y",
        )
        .selectExpr(
            "*",
            f"SUM(CASE WHEN rk_y <= {k} THEN c ELSE 0 END)"
            " OVER (PARTITION BY tgt_id) AS den_y",
        )
    )
    m = s.selectExpr(
        "src_id",
        "tgt_id",
        "CAST(c AS DOUBLE) / 1E6 AS cos_sim",
        "CASE WHEN (den_x + den_y) > 0"
        f" THEN round(CAST({2 * k} * c AS DOUBLE)"
        " / CAST(den_x + den_y AS DOUBLE), 6)"
        " ELSE 0.0D END AS margin",
    )
    return (
        m.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY src_id"
            " ORDER BY margin DESC, tgt_id) AS rk",
        )
        .where("rk = 1")
        .select("src_id", "tgt_id", "cos_sim", "margin")
        .orderBy("src_id")
    )


def bitext_mine_lsh(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    n_planes: int = 16,
    max_hamming: int = 6,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Corpus x corpus bitext mining (r8) — the scale path the
    q_bitext_mine docstring prescribes: both sides get the same
    hyperplane signatures, the candidate pairs come from an 8-bit-band
    equi-join verified by full-signature Hamming (the knn_join_lsh
    generator — NEVER |src| x |tgt|), exact micro-unit cosines are
    computed on the shortlist only, and `bitext_margin` ranks it with
    arithmetic unchanged.  Ratio-margin denominators become k-NN sums
    WITHIN the shortlist — the standard ANN-mining approximation.

    src: (src_id, se); tgt: (tgt_id, te).  At 100 TB both sides scale
    independently: band buckets hold ~|side|/256 rows, the shortlist
    shuffles on (band, value) then on the two margin windows' bounded
    keys.  Same REGIME note as knn_join_lsh: banded signatures see
    near-duplicate geometry (true translation pairs in an aligned
    space); wide-angle neighbors need the IVF tier."""
    from pyspec_spark.functions.determinism import _fixed6

    n_bands = n_planes // 8
    ssigs = lsh_signatures(src, n_planes, seed, "src_id", "se", dim=dim)
    tsigs = lsh_signatures(tgt, n_planes, seed, "tgt_id", "te", dim=dim)

    def banded(s, idc, vc, prefix):
        bands = F.array(
            *[
                F.shiftrightunsigned(F.col("sig"), 8 * b)
                .bitwiseAND(F.lit(255))
                .cast("int")
                for b in range(n_bands)
            ]
        )
        return s.select(
            F.col("vec_id").alias(idc),
            F.col(vc),
            F.col("sig").alias(f"{prefix}sig"),
            F.posexplode(bands).alias("b", "band"),
        )

    cand = (
        banded(ssigs, "src_id", "se", "s")
        .join(banded(tsigs, "tgt_id", "te", "t"), ["b", "band"])
        .where(
            F.bit_count(F.col("ssig").bitwiseXOR(F.col("tsig")))
            <= max_hamming
        )
        .select("src_id", "tgt_id", "se", "te")
        .dropDuplicates(["src_id", "tgt_id"])
    )
    cos = _dot_cols(F.col("te"), F.col("se")) / (
        _norm_expr(F.col("te")) * _norm_expr(F.col("se"))
    )
    pairs = cand.select("src_id", "tgt_id", _fixed6(cos).alias("c"))
    return bitext_margin(pairs, k)
