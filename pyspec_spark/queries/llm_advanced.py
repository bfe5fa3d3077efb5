"""Declared queries over the advanced LLM-pipeline operators
(`operators/dedup.py`, `operators/similarity.py`, `operators/text.py`,
`operators/multimodal.py`) — SURVEY.md §2.12 L2/L5/L7 and the
training-data north-star brief.

Oracle policy:
- `q_cosine_topk` (exact similarity search) IS SQL-expressible: DuckDB
  `list_cosine_similarity` on double-cast lists gives the bit-identical
  sequential sum; rounded to 6 places with a vec_id tiebreak under LIMIT.
- `q_token_counts` uses `regexp_extract_all` — same RE2/Java-compatible
  pattern class both engines.
- MinHash-LSH, SimHash, and winnowing fingerprints are built on md5,
  which DuckDB computes bit-identically → the FULL pipelines (bands,
  candidate pairs, estimated Jaccard / hamming / selected hashes) are
  oracle-checked, not rows-only.
- Hyperplane-LSH / IVF ANN remain rows-only: their candidate sets are
  approximate by construction (recall is pytest-asserted instead).

Scale notes: every rows-only query here still follows the 100 TB plan —
candidate generation is an equi-join (bands/cells), verification runs on
signatures not raw text, and no driver-side materialization beyond the
tiny IVF centroid model (n_cells × dim floats).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.operators.dedup import (
    minhash_neardup,
    simhash_neardup,
    simhash_neardup64,
)
from pyspec_spark.operators.multimodal import extract_features
from pyspec_spark.operators.similarity import lsh_topk_df
from pyspec_spark.operators.text import BPE_ISH, fingerprint, token_counts
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# L5 — exact cosine top-k (the similarity-search correctness baseline).
# Query vector = the embedding of vec_id 0, expressed IN-PLAN as a
# broadcast cross join so no vector ever rides through the driver.
# ---------------------------------------------------------------------------
@query(
    "q_cosine_topk",
    oracle="""
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 6) AS score
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY score DESC, e.vec_id
LIMIT 10
""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / (norm(F.col("embedding")) * norm(F.col("qv"))), 6).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# L5c — FILTERED vector search (r11): exact top-k cosine among vectors
# passing a metadata predicate — the production pattern every RAG /
# retrieval deployment runs ("nearest neighbors WHERE tenant = X /
# lang = en / date > cutoff").  Semantics matter here: this is
# PRE-filtering (the predicate restricts the candidate set BEFORE the
# top-k), which is exact at any selectivity — the tempting alternative,
# post-filtering a top-k' of the unfiltered corpus, silently returns
# FEWER than k rows (or misses true neighbors entirely) whenever the
# filter is selective, the classic filtered-ANN wrong-answer class the
# vector-db literature warns about (e.g. the Qdrant/Weaviate filtered
# search docs; public knowledge).
#
# Plan shape / 100 TB posture: the label predicate PUSHES INTO the
# parquet scan (plan-gated: PushedFilters carries label), so the
# distance arithmetic runs over the filtered fraction only; the query
# vector broadcasts; top-k compiles to TakeOrdered (no global sort).
# At rest, partitioning the vector table by the filter key turns the
# scan into partition pruning — the same layout story as IVF cells.
# ---------------------------------------------------------------------------
_FANN_LABEL = 7
_FANN_PROBE = 3


@query(
    "q_ann_filtered",
    oracle=f"""
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 6) AS score
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_FANN_PROBE}) q
WHERE e.label = {_FANN_LABEL} AND e.vec_id <> {_FANN_PROBE}
ORDER BY score DESC, e.vec_id
LIMIT 10
""",
)
def q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == _FANN_PROBE).select(
        F.col("embedding").alias("qv")
    )
    cand = e.where(
        (F.col("label") == _FANN_LABEL) & (F.col("vec_id") != _FANN_PROBE)
    )
    dot = F.aggregate(
        F.zip_with(
            "embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        cand.crossJoin(F.broadcast(q))
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
# L5 scale path — random-hyperplane LSH ANN top-k (rows-only: candidate
# set is approximate by construction).  The probe vector is IN-PLAN
# (vec_id 0 broadcast with its signature computed by the same plane
# expression) — building the query runs zero Spark jobs.
# ---------------------------------------------------------------------------
@query("q_ann_lsh_topk")
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    qdf = e.where(F.col("vec_id") == 0).select("embedding")
    return lsh_topk_df(e, qdf, k=10, max_hamming=6, dim=64)


# ---------------------------------------------------------------------------
# L5 — deterministic hyperplane-LSH twin, ORACLE-CHECKED end to end:
# the seeded plane matrix is embedded as literal arrays in BOTH the
# Spark plan and the DuckDB oracle, so signature bits (sign of dot),
# the Hamming-band candidate set, and the rounded cosine re-rank are
# all replayed exactly.  Sign flips would need |dot| within an ulp of
# zero — continuous embeddings make that probability ~0, and the data
# is fixed, so the check is stable.  This proves the LSH pipeline the
# way q_ann_ivf_det proves IVF; q_ann_lsh_topk stays the rows-only
# production-flavored variant.
# ---------------------------------------------------------------------------
_LSH_DET_PLANES = 16
_LSH_DET_HAMMING = 6


def _lsh_det_oracle() -> str:
    from pyspec_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, _LSH_DET_PLANES, seed=42)
    bit_terms = []
    for i in range(_LSH_DET_PLANES):
        arr = ", ".join(repr(float(v)) for v in planes[i])
        bit_terms.append(
            f"CASE WHEN list_dot_product(e, [{arr}]) > 0 "
            f"THEN {1 << i} ELSE 0 END"
        )
    sig_expr = " + ".join(bit_terms)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
s AS (
  SELECT vec_id, e, CAST({sig_expr} AS BIGINT) AS sig FROM v
),
q AS (
  SELECT e AS qe, sig AS qsig FROM s WHERE vec_id = 0
)
SELECT s.vec_id,
       ROUND(list_cosine_similarity(s.e, q.qe), 6) AS score
FROM s, q
WHERE bit_count(xor(s.sig, q.qsig)) <= {_LSH_DET_HAMMING}
ORDER BY score DESC, s.vec_id
LIMIT 10
"""


@query("q_ann_lsh_det", oracle=_lsh_det_oracle())
def q_ann_lsh_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    qdf = e.where(F.col("vec_id") == 0).select("embedding")
    return lsh_topk_df(
        e,
        qdf,
        k=10,
        n_planes=_LSH_DET_PLANES,
        max_hamming=_LSH_DET_HAMMING,
        seed=42,
        dim=64,
        round_digits=6,
    )


# ---------------------------------------------------------------------------
# L2 — MinHash-LSH near-dup pairs, ORACLE-CHECKED end to end: the md5
# hash basis (operators/dedup.py) is bit-identical in DuckDB, so the
# oracle replays the exact pipeline — shingle -> 64 salted min-hashes ->
# 16 banded buckets (size cap 1000) -> candidate pairs -> signature-
# estimated Jaccard >= 0.8.  Estimates are exact multiples of 1/64
# (binary-representable), so the rounded values hash-match.
# ---------------------------------------------------------------------------
_MINHASH_ORACLE = """
WITH sh AS (
  -- sub-2-token docs have no bigram shingles (mirror of the Spark-side
  -- guard in operators/dedup.py shingles())
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 2
              THEN list_distinct(list_transform(
                  range(1, len(string_split(text, ' '))),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i + 1]))
              ELSE [] END AS shingles
  FROM documents
),
sigs AS (
  SELECT doc_id,
         list_transform(range(0, 64),
             i -> list_min(list_transform(shingles,
                      s -> md5(s || '#' || CAST(i AS VARCHAR))))) AS sig
  FROM sh
  WHERE len(shingles) > 0
),
banded AS (
  SELECT doc_id, b,
         md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 16)) AS b)
),
ok AS (
  SELECT b, band_hash FROM banded
  GROUP BY 1, 2 HAVING COUNT(*) > 1 AND COUNT(*) <= 1000
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
  FROM banded a
  JOIN ok USING (b, band_hash)
  JOIN banded bb ON a.b = bb.b AND a.band_hash = bb.band_hash
               AND a.doc_id < bb.doc_id
)
SELECT id_a, id_b,
       ROUND(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0,
             6) AS est_jaccard
FROM cand
JOIN sigs sa ON sa.doc_id = id_a
JOIN sigs sb ON sb.doc_id = id_b
WHERE ROUND(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0,
            6) >= 0.8
"""


# ---------------------------------------------------------------------------
# L2 streaming-face batch twin (r6) — the OWNER RULE the keyed-state
# streaming near-dup (streaming/corpus.py neardup_stream) implements
# incrementally: a doc is suppressed iff it shares a MinHash band
# bucket (16 hashes, 4 bands) with a smaller doc_id; its owner is the
# minimum owner over all such buckets.  This declared query computes
# the rule through the CODEGEN batch signature path
# (minhash_signatures); tests/test_streaming.py separately proves the
# stream operator's map-only band hashes are value-identical and its
# replay equals this rule — so the oracle here transitively checks the
# streaming operator's hash basis and semantics.  At 100 TB: one
# signature shuffle + one bucket groupBy; state in the streaming face
# is 8 bytes per bucket.
# ---------------------------------------------------------------------------
_NEARDUP_OWNER_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 2
              THEN list_distinct(list_transform(
                  range(1, len(string_split(text, ' '))),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i + 1]))
              ELSE [] END AS shingles
  FROM documents
),
sigs AS (
  SELECT doc_id,
         list_transform(range(0, 16),
             i -> list_min(list_transform(shingles,
                      s -> md5(s || '#' || CAST(i AS VARCHAR))))) AS sig
  FROM sh
  WHERE len(shingles) > 0
),
banded AS (
  SELECT doc_id, b,
         md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)
),
owners AS (
  SELECT b, band_hash, MIN(doc_id) AS owner
  FROM banded GROUP BY 1, 2
)
SELECT d.doc_id,
       CAST(MIN(o.owner) AS BIGINT) AS owner_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_buckets
FROM banded d
JOIN owners o ON d.b = o.b AND d.band_hash = o.band_hash
            AND d.doc_id > o.owner
GROUP BY d.doc_id
"""


@query("q_neardup_owner", oracle=_NEARDUP_OWNER_ORACLE)
def q_neardup_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.dedup import (
        band_hashes_from_sigs,
        minhash_signatures,
    )

    from pyspec_spark.registry import PERSIST_SEQ, track_persist

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sigs = minhash_signatures(d, n_hashes=16)
    # r13 (guide §5): `banded` feeds both the bucket-owner aggregation
    # and the join-back side; unpersisted, the 16-hash md5 signature
    # chain (the dominant stage) executed twice per cold run.  The
    # banded table is 4 rows x (band, hash, id) per doc — tiny next to
    # the compute it caps.
    banded = track_persist(
        spark,
        f"q_neardup_owner#banded#{next(PERSIST_SEQ)}",
        band_hashes_from_sigs(sigs, bands=4, n_hashes=16),
    )
    owners = banded.groupBy("band", "band_hash").agg(
        F.min("id").alias("owner")
    )
    hits = banded.join(owners, ["band", "band_hash"]).where(
        F.col("id") > F.col("owner")
    )
    return (
        hits.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.min("owner").cast("long").alias("owner_id"),
            F.count("*").cast("long").alias("n_shared_buckets"),
        )
        .orderBy("doc_id")
    )


@query("q_minhash_neardup", oracle=_MINHASH_ORACLE)
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    # pre_partition: the local test parquet is a single file (one scan
    # partition); spread the codegen md5 signature work across cores.
    return minhash_neardup(
        d, threshold=0.8, pre_partition=spark.sparkContext.defaultParallelism
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# L2 — SimHash near-dup pairs, ORACLE-CHECKED: 32-bit md5-based simhash
# (per-bit majority vote), 4×8-bit band blocking (pigeonhole recall
# guarantee to hamming 3) with a 1000-doc bucket cap (hot-key
# mitigation), exact bit_count(xor) verification.  The DuckDB oracle
# replays the identical signature arithmetic (all values < 2^32, so
# double intermediates are exact on both engines).
# ---------------------------------------------------------------------------
_SIMHASH_ORACLE = """
WITH th AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
             t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hashes
  FROM documents
),
sig AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32),
             b -> CASE WHEN 2 * len(list_filter(hashes,
                            h -> CAST(floor(h / (2::DOUBLE ** b)) AS BIGINT)
                                 % 2 = 1))
                       > len(hashes)
                  THEN 2::DOUBLE ** b ELSE 0 END)) AS BIGINT) AS simhash
  FROM th
),
banded AS (
  SELECT doc_id, b,
         CAST(floor(simhash / (256::DOUBLE ** b)) AS BIGINT) % 256 AS band_val
  FROM sig, (SELECT unnest(range(0, 4)) AS b)
),
ok AS (
  SELECT b, band_val FROM banded
  GROUP BY 1, 2 HAVING COUNT(*) > 1 AND COUNT(*) <= 1000
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
  FROM banded a
  JOIN ok USING (b, band_val)
  JOIN banded bb ON a.b = bb.b AND a.band_val = bb.band_val
               AND a.doc_id < bb.doc_id
)
SELECT id_a, id_b, bit_count(xor(sa.simhash, sb.simhash)) AS hamming
FROM cand
JOIN sig sa ON sa.doc_id = id_a
JOIN sig sb ON sb.doc_id = id_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
"""


@query("q_simhash_neardup", oracle=_SIMHASH_ORACLE)
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_neardup(
        d, max_hamming=3, pre_partition=spark.sparkContext.defaultParallelism
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# L2 — the CORPUS-SCALE SimHash variant, declared (rows-only: the
# xxhash64 basis is engine-specific, so no DuckDB replay; planted-dup
# recall is pytest-asserted like the ANN queries).  64-bit signature
# via vectorized pandas-UDF majority vote, 4 x 16-bit bands — 65 536
# values per band keep bucket occupancy O(corpus/65k) where the 32-bit
# oracle twin's 256-value bands saturate past ~10^5 docs (measured,
# SCALING.md).  This is the variant a 100 TB dedup pipeline runs; the
# 32-bit q_simhash_neardup exists to prove the pipeline exact.
# ---------------------------------------------------------------------------
@query("q_simhash_neardup64")
def q_simhash_neardup64(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_neardup64(
        d, max_hamming=3, pre_partition=spark.sparkContext.defaultParallelism
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex pretokenizer, both engines.
# ---------------------------------------------------------------------------
@query(
    "q_token_counts",
    oracle=rf"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS INT) AS n_bpe_tokens
FROM documents
""",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return token_counts(d).select("doc_id", "n_ws_tokens", "n_bpe_tokens")


# ---------------------------------------------------------------------------
# Document fingerprinting — winnowing (Schleimer–Wilkerson–Aiken / MOSS)
# over md5 token-4-gram hashes, window 8, ORACLE-CHECKED: the oracle
# replays the identical select-min-per-sliding-window computation.
# ---------------------------------------------------------------------------
_FINGERPRINT_ORACLE = """
WITH g AS (
  SELECT doc_id,
         list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 2, 1)),
             i -> md5(array_to_string(
                      list_slice(string_split(text, ' '), i, i + 3), ' '))) AS grams
  FROM documents
)
SELECT DISTINCT doc_id, fp FROM (
  SELECT doc_id,
         unnest(list_transform(range(8, len(grams) + 1),
                               j -> list_min(list_slice(grams, j - 7, j)))) AS fp
  FROM g
)
"""


@query("q_fingerprint", oracle=_FINGERPRINT_ORACLE)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return fingerprint(d).select("doc_id", "fp")


# ---------------------------------------------------------------------------
# L7 — multimodal feature extraction over mapInPandas (rows-only: DuckDB
# cannot decode PNG/PPM/JPEG).  The payloads are REAL encoded bytes —
# PNG images across all five scanline filters, concatenated-PPM
# "videos", and baseline JPEG in both 4:4:4 and 4:2:0 sampling with
# restart markers (operators/codecs.py, operators/jpeg.py); decode runs
# inside mapInPandas on executors and the means are golden-tested
# against closed-form / numpy-roundtrip values in tests/test_codecs.py.
# ---------------------------------------------------------------------------
@query("q_multimodal_features")
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import make_mixed_media

    media = make_mixed_media(spark, n=18, frames=4)
    return (
        extract_features(media, sample_every=2)
        .select(
            "media_id",
            "frame_id",
            F.round(F.element_at("features", 1), 6).alias("mean_r"),
        )
        .orderBy("media_id", "frame_id")
    )


# ---------------------------------------------------------------------------
# L7 video (r5) — MP4 container metadata WITHOUT a codec library: the
# Spark side synthesizes real ISO-BMFF bytes (operators/mp4.py, box
# layout per ISO 14496-12) whose metadata is a closed-form function of
# media_id, then PARSES them back inside mapInPandas on executors; the
# oracle replays the closed form directly.  Hash-equality therefore
# proves the parser exactly inverts the synthesizer through real bytes
# (the q_audio_features_arr proof pattern applied to the container
# parser).  Frame decode remains the documented NotImplementedError.
# At scale this is the pre-GPU curation filter: duration/resolution/
# codec-fourcc predicates evaluated on metadata, payloads untouched.
# ---------------------------------------------------------------------------
_VIDEO_META_N = 6

_VIDEO_META_ORACLE = f"""
SELECT CAST(range AS BIGINT) AS media_id,
       'mp4' AS codec,
       'isom' AS brand,
       ROUND(1.0 + 0.5 * range, 6) AS duration_s,
       (['avc1','hvc1','av01'])[(range % 3) + 1] AS track_codec,
       CAST(64 + 16 * range AS INT) AS track_w,
       CAST(48 + 12 * range AS INT) AS track_h,
       (['eng','und','fra'])[(range % 3) + 1] AS language,
       CAST(24 * (range + 1) AS INT) AS n_samples
FROM range({_VIDEO_META_N})
ORDER BY media_id
"""


@query("q_video_metadata", oracle=_VIDEO_META_ORACLE)
def q_video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        make_video_media,
        video_metadata,
    )

    media = make_video_media(spark, n=_VIDEO_META_N)
    return video_metadata(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# L7 codec parameters (r7) — H.264 SPS/avcC parse WITHOUT a codec
# library: the synthesizer embeds a real conformant SPS+PPS (exp-
# Golomb, emulation prevention, frame-crop offsets; operators/h264.py)
# into the avc1 sample entry, and the query parses profile/level and
# the TRUE cropped dimensions back out inside mapInPandas.  The crop
# arithmetic is load-bearing: SPS stores macroblock-rounded sizes, and
# the synthesized dims are deliberately non-16-multiples, so a parser
# that skips frame_cropping reports every width/height wrong (and the
# container's coded size disagrees with the truth, as in real files).
# Oracle replays the closed form.  Slice decode remains the documented
# NotImplementedError boundary.
# ---------------------------------------------------------------------------
_AVC_N = 8

_AVC_PARAMS_ORACLE = f"""
SELECT CAST(range AS BIGINT) AS media_id,
       CAST(CASE WHEN range % 2 = 0 THEN 66 ELSE 77 END AS INT)
         AS profile_idc,
       CAST(30 + range AS INT) AS level_idc,
       CAST(320 + 16 * range - 2 * (range % 4) AS INT) AS width,
       CAST(240 + 16 * range - 2 * (range % 3) AS INT) AS height
FROM range({_AVC_N})
ORDER BY media_id
"""


@query("q_avc_params", oracle=_AVC_PARAMS_ORACLE)
def q_avc_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        avc_track_params,
        make_avc_media,
    )

    media = make_avc_media(spark, n=_AVC_N)
    return avc_track_params(media).orderBy("media_id")


# hvc1 twin (operators/h265.py): HEVC conformance-window arithmetic —
# luma sizes round to the 8-px minimum CU, and the synthesized true
# dimensions are non-8-multiples, so skipping the window is wrong.
_HEVC_PARAMS_ORACLE = f"""
SELECT CAST(range AS BIGINT) AS media_id,
       CAST(CASE WHEN range % 2 = 0 THEN 1 ELSE 2 END AS INT)
         AS profile_idc,
       CAST(range % 2 AS INT) AS tier,
       CAST(90 + 3 * range AS INT) AS level_idc,
       CAST(426 + 8 * range - 2 * (range % 3) AS INT) AS width,
       CAST(238 + 8 * range - 2 * (range % 2) AS INT) AS height
FROM range({_AVC_N})
ORDER BY media_id
"""


@query("q_hevc_params", oracle=_HEVC_PARAMS_ORACLE)
def q_hevc_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        hevc_track_params,
        make_hevc_media,
    )

    media = make_hevc_media(spark, n=_AVC_N)
    return hevc_track_params(media).orderBy("media_id")


# av01 third of the trilogy (operators/av1.py): profile / level / tier
# / bit-depth live ONLY in the sequence-header OBU (no typed container
# slot), and AV1 has no RBSP escaping — the oracle pins leb128 + the
# unaligned bit layout instead.
_AV1_PARAMS_ORACLE = f"""
SELECT CAST(range AS BIGINT) AS media_id,
       CAST(range % 2 AS INT) AS seq_profile,
       CAST(8 + range AS INT) AS seq_level_idx,
       CAST(range % 2 AS INT) AS seq_tier,
       CAST(CASE WHEN (range // 2) % 2 = 1 THEN 10 ELSE 8 END AS INT)
         AS bit_depth,
       CAST(640 + 2 * range AS INT) AS width,
       CAST(360 + 2 * range AS INT) AS height
FROM range({_AVC_N})
ORDER BY media_id
"""


@query("q_av1_params", oracle=_AV1_PARAMS_ORACLE)
def q_av1_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        av1_track_params,
        make_av1_media,
    )

    media = make_av1_media(spark, n=_AVC_N)
    return av1_track_params(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# L7 video FRAMES (r6) — the mp4 frame-decode boundary closed for
# MJPEG: real MJPEG-in-MP4 movies (every sample a complete baseline
# JPEG behind real stsz/stsc/stco tables, operators/mp4.py
# make_mjpeg_mp4) are demuxed sample-by-sample and decoded by the
# in-repo T.81 decoder inside mapInPandas; per-frame mean/std channel
# features come out.  Oracle = committed golden parquet (the
# q_compress_ratio promotion pattern): hash-equality pins the ENTIRE
# demux+entropy-decode+IDCT pipeline to exact bytes — any drift in the
# Huffman tables, the sample-offset walk, or the upsampling math flips
# the hash.  Non-MJPEG sample codecs (avc1/hvc1/av01) remain the
# documented NotImplementedError.  At 100 TB: payloads never leave
# executors, frame k is seeked via offset arithmetic (not decoded
# past), and the decode cost is bounded by sampled frames.
# ---------------------------------------------------------------------------
_VIDEO_FRAMES_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "video_frames_golden.parquet",
)

_VIDEO_FRAMES_ORACLE = f"""
SELECT media_id, frame_id, mean_r, mean_g, mean_b, std_luma
FROM read_parquet('{_VIDEO_FRAMES_GOLDEN}')
ORDER BY media_id, frame_id
"""


@query("q_video_frames", oracle=_VIDEO_FRAMES_ORACLE)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        extract_features,
        make_mjpeg_media,
    )

    media = make_mjpeg_media(spark, n=6, frames=4)
    feats = extract_features(media, sample_every=1)
    return feats.select(
        "media_id",
        "frame_id",
        F.round(F.element_at("features", 1), 6).alias("mean_r"),
        F.round(F.element_at("features", 2), 6).alias("mean_g"),
        F.round(F.element_at("features", 3), 6).alias("mean_b"),
        F.round(
            (
                F.element_at("features", 4) * 0.299
                + F.element_at("features", 5) * 0.587
                + F.element_at("features", 6) * 0.114
            ),
            6,
        ).alias("std_luma"),
    ).orderBy("media_id", "frame_id")


# ---------------------------------------------------------------------------
# L7 COMPOSED multimodal pipeline (r7) — the full pre-training video
# curation shape in ONE plan: a mixed crawl (6 decodable MJPEG movies +
# 6 avc1/hvc1/av01 movies) goes through (1) container-metadata parse,
# (2) a METADATA GATE that keeps only payloads whose track fourcc the
# engine can decode — the pre-GPU filter that makes 100 TB video
# curation affordable, here also load-bearing for correctness: an
# un-gated plan feeds avc1 bytes to the JPEG decoder and the query
# CRASHES (NotImplementedError) rather than mismatching — (3) per-frame
# demux+decode+features, (4) per-media quality aggregation.
#
# The oracle is genuinely composed, not self-referential: DuckDB
# aggregates the COMMITTED per-frame golden parquet (whose values
# q_video_frames + tests/test_mp4.py pin against the independent
# decoder tests), while Spark recomputes everything from raw MP4 bytes.
# Per-frame mean/std are rounded to 6dp exactly as q_video_frames emits
# them, so both engines aggregate bit-identical doubles; avg_luma uses
# the centroid micro-unit basis (round-to-integer of fl(bigint)/count).
#
# 100 TB posture: metadata parse and decode run in mapInPandas on
# executors (payloads never move to the driver); the gate joins a
# broadcast of the parsed-metadata side; per-media agg shuffles only
# (media_id, 6 doubles) rows.
# ---------------------------------------------------------------------------
_MM_PIPE_ORACLE = f"""
WITH f AS (
  SELECT media_id,
         0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b AS luma,
         std_luma
  FROM read_parquet('{_VIDEO_FRAMES_GOLDEN}')
)
SELECT media_id,
       'jpeg' AS track_codec,
       COUNT(*) AS n_frames,
       ROUND(CAST(SUM(CAST(ROUND(luma * 1e6) AS BIGINT)) AS DOUBLE)
             / COUNT(*)) / 1e6 AS avg_luma,
       MAX(std_luma) AS max_std_luma
FROM f
GROUP BY media_id
ORDER BY media_id
"""


@query("q_multimodal_pipeline", oracle=_MM_PIPE_ORACLE)
def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        make_mjpeg_media,
        make_video_media,
        video_metadata,
    )

    mj = make_mjpeg_media(spark, n=6, frames=4)
    other = make_video_media(spark, n=6).withColumn(
        "media_id", F.col("media_id") + 100
    )
    corpus = mj.unionByName(other)
    # metadata gate: parse containers, keep only decodable fourccs
    meta = video_metadata(corpus)
    decodable = meta.where(F.col("track_codec") == "jpeg").select(
        "media_id", "track_codec"
    )
    gated = corpus.join(F.broadcast(decodable), "media_id")
    feats = extract_features(
        gated.select(
            "media_id", "kind", "codec", "width", "height", "n_frames", "payload"
        ),
        sample_every=1,
    )
    # per-frame values rounded exactly as q_video_frames emits them, so
    # the committed golden's doubles are bit-identical inputs here
    r, g, b = (
        F.round(F.element_at("features", i), 6) for i in (1, 2, 3)
    )
    std_luma = F.round(
        F.element_at("features", 4) * 0.299
        + F.element_at("features", 5) * 0.587
        + F.element_at("features", 6) * 0.114,
        6,
    )
    per_frame = feats.select(
        "media_id",
        (F.lit(0.299) * r + F.lit(0.587) * g + F.lit(0.114) * b).alias("luma"),
        std_luma.alias("std_luma"),
    )
    from pyspec_spark.functions.determinism import _fixed6

    return (
        per_frame.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            (
                F.round(
                    F.sum(_fixed6(F.col("luma"))).cast("double") / F.count("*")
                )
                / 1e6
            ).alias("avg_luma"),
            F.max("std_luma").alias("max_std_luma"),
        )
        .select(
            "media_id",
            F.lit("jpeg").alias("track_codec"),
            "n_frames",
            "avg_luma",
            "max_std_luma",
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# L7 audio — per-window RMS / zero-crossing features from REAL WAV PCM
# payloads decoded by the in-repo RIFF parser (operators/codecs.py)
# inside mapInPandas (rows-only; goldens pin sine-wave RMS=A/sqrt(2)
# and zcr=2f/rate in tests/test_codecs.py).
# ---------------------------------------------------------------------------
@query("q_audio_features")
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        extract_audio_features,
        make_audio_media,
    )

    media = make_audio_media(spark, n=8)
    return (
        extract_audio_features(media, window=1024)
        .select(
            "media_id",
            "window_id",
            F.round("rms", 6).alias("rms"),
            F.round("zcr", 6).alias("zcr"),
        )
        .orderBy("media_id", "window_id")
    )


# ---------------------------------------------------------------------------
# L7 audio, ORACLE TWIN (VERDICT r3 item 4) — the windowed RMS / ZCR
# feature math itself, proven against DuckDB independently of the WAV
# codec.  Samples are a deterministic integer stream generated IN-PLAN
# (pure int arithmetic — bit-identical in both engines, unlike
# sin()+rounding whose last-ulp libm differences could flip a floor);
# sum of squares stays exact in int64, so sqrt/division are single
# IEEE ops with one well-defined answer.  tests/test_codecs.py closes
# the loop by WAV-encoding the same stream and asserting the codec
# path (extract_audio_features) produces these exact numbers.
# ---------------------------------------------------------------------------
_AUDIO_N_MEDIA, _AUDIO_N, _AUDIO_WINDOW = 8, 4096, 512


def audio_arr_sample(media_id, k):
    """The shared sample formula: s in [-32768, 32767], pure integers."""
    return ((k * 2654435761 + (media_id + 1) * 40503) % 65536) - 32768


_AUDIO_ARR_ORACLE = f"""
WITH m AS (SELECT range AS media_id FROM range({_AUDIO_N_MEDIA})),
ks AS (SELECT media_id, range AS k FROM m, range({_AUDIO_N})),
s AS (
  SELECT media_id, k,
         ((k * 2654435761 + (media_id + 1) * 40503) % 65536) - 32768 AS smp,
         (((k - 1) * 2654435761 + (media_id + 1) * 40503) % 65536) - 32768 AS smp_prev
  FROM ks
)
SELECT media_id,
       CAST(k // {_AUDIO_WINDOW} AS INT) AS window_id,
       ROUND(SQRT(CAST(SUM(smp * smp) AS DOUBLE) / {_AUDIO_WINDOW}), 6) AS rms,
       ROUND(CAST(SUM(CASE WHEN k % {_AUDIO_WINDOW} <> 0
                            AND (smp < 0) <> (smp_prev < 0)
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / {_AUDIO_WINDOW - 1}, 6) AS zcr
FROM s
GROUP BY media_id, window_id
ORDER BY media_id, window_id
"""


@query("q_audio_features_arr", oracle=_AUDIO_ARR_ORACLE)
def q_audio_features_arr(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_media, n, window = _AUDIO_N_MEDIA, _AUDIO_N, _AUDIO_WINDOW
    mid, k = F.col("media_id"), F.col("k")
    ks = (
        spark.range(n_media)
        .select(F.col("id").alias("media_id"))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("k"),
        )
    )
    smp = ((k * F.lit(2654435761)) + (mid + 1) * F.lit(40503)) % 65536 - 32768
    smp_prev = (
        ((k - 1) * F.lit(2654435761)) + (mid + 1) * F.lit(40503)
    ) % 65536 - 32768
    # within-window sign changes only (k % window == 0 starts a window)
    flip = (
        F.when(
            (k % window != 0) & ((smp < 0) != (smp_prev < 0)), F.lit(1)
        ).otherwise(F.lit(0))
    )
    return (
        ks.select(
            mid,
            F.floor(k / window).cast("int").alias("window_id"),
            (smp * smp).alias("sq"),
            flip.alias("flip"),
        )
        .groupBy("media_id", "window_id")
        .agg(
            F.round(
                F.sqrt(F.sum("sq").cast("double") / F.lit(window)), 6
            ).alias("rms"),
            F.round(
                F.sum("flip").cast("double") / F.lit(window - 1), 6
            ).alias("zcr"),
        )
        .orderBy("media_id", "window_id")
    )


# ---------------------------------------------------------------------------
# L5 scale path (variant B) — IVF ANN top-k, fully IN-PLAN: centroid
# training (numpy Lloyd in mapInPandas over a bounded coalesced sample),
# map-only cell assignment, probe-cell selection from the broadcast
# query row, and exact cosine re-rank inside the probed cells all live
# in ONE DataFrame plan — building it runs zero Spark jobs and nothing
# (sample, model, probe) transits the driver.  Rows-only: the candidate
# set is approximate by construction; recall vs exact brute force is
# asserted in tests/test_llm_ops.py.  At rest the cell id is the
# partition key, so a probe touches n_probe/n_cells of the data — the
# IVF index IS the table layout at 100 TB.
# ---------------------------------------------------------------------------
@query("q_ann_ivf_topk")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import (
        ivf_assign_df,
        ivf_topk_df,
        train_centroids_df,
    )

    e = table(spark, sf_dir, "embeddings")
    qdf = e.where(F.col("vec_id") == 0).select("embedding")
    cents = train_centroids_df(e, n_cells=16, sample=2000)
    assigned = ivf_assign_df(e, cents)
    return ivf_topk_df(assigned, cents, qdf, k=10, n_probe=4)


# ---------------------------------------------------------------------------
# L5 memory-bounded path (r5) — product-quantization ANN top-k, fully
# IN-PLAN: per-subspace Lloyd codebooks (numpy in mapInPandas over a
# bounded ordered sample), map-only encode (broadcast codebook +
# array_min argmin — NO shuffle), ADC shortlist against a broadcast
# query-to-codeword LUT, then exact cosine re-rank of ONLY the
# shortlisted rows (the ADC+R shape from the PQ paper — quantization
# error picks candidates, never the final ranking).  Rows-only: Lloyd
# training makes codes a function of the float-rounding path, so the
# candidate set is approximate by construction; recall vs exact brute
# force is asserted in tests/test_llm_ops.py, and the exact
# deterministic twin q_ann_pq_det (queries/ml.py) IS oracle-checked.
# At 100 TB the shortlist scan reads ONLY the M small-int code columns
# (64 float32 -> 8 codes at rest) and the re-rank fetches `shortlist`
# full vectors via broadcast semi-join — PQ is the tier that fits a
# trillion-vector index where raw embeddings cannot.
# ---------------------------------------------------------------------------
@query("q_ann_pq_topk")
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import (
        pq_codebooks_trained_df,
        pq_encode_df,
        pq_rerank_topk_df,
    )

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qdf = e.where(F.col("vec_id") == 0).select("embedding")
    cb = pq_codebooks_trained_df(e, m=8, subd=8, k=16, sample=2000)
    codes = pq_encode_df(e, cb, m=8, subd=8)
    return pq_rerank_topk_df(e, codes, cb, qdf, m=8, subd=8, k=10, shortlist=100)


# ---------------------------------------------------------------------------
# L3/L8 extension (r4) — count-min-sketch heavy hitters, ORACLE-CHECKED
# end to end: the md5-salted bucket functions, the d x w sketch counts,
# and the min-over-rows estimates are all replayed exactly in DuckDB.
# The output pairs each exact top-20 term count with its CMS estimate;
# CMS can only over-count, so est_cnt >= exact_cnt is a cross-engine
# invariant (pytest-asserted too).  Scale story in
# operators/text.py count_min_sketch: shuffle output bounded by sketch
# geometry (d*w counters), not vocabulary size.
# ---------------------------------------------------------------------------
_CMS_D, _CMS_W = 4, 1024

_CMS_ORACLE = f"""
WITH ex AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
exact AS (
  SELECT term, COUNT(*) AS exact_cnt
  FROM ex GROUP BY term
  ORDER BY exact_cnt DESC, term LIMIT 20
),
sketch AS (
  SELECT t.j,
         CAST(('0x' || substr(md5(term || '#cms' || CAST(t.j AS VARCHAR)), 1, 8))::BIGINT
              % {_CMS_W} AS INT) AS bucket,
         COUNT(*) AS cnt
  FROM ex, range({_CMS_D}) t(j)
  GROUP BY 1, 2
),
probe AS (
  SELECT e.term, e.exact_cnt, t.j,
         CAST(('0x' || substr(md5(e.term || '#cms' || CAST(t.j AS VARCHAR)), 1, 8))::BIGINT
              % {_CMS_W} AS INT) AS bucket
  FROM exact e, range({_CMS_D}) t(j)
)
SELECT p.term, p.exact_cnt, MIN(s.cnt) AS est_cnt
FROM probe p JOIN sketch s USING (j, bucket)
GROUP BY p.term, p.exact_cnt
"""


@query("q_heavy_hitters_cms", oracle=_CMS_ORACLE)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import cms_estimate, count_min_sketch
    from pyspec_spark.tables import fanout

    # r13 (guide §2): the term explode feeds BOTH the d x w sketch
    # hashes and the exact probe counts from a one-split scan; fanout
    # first (integer counts everywhere — order-safe; no-op at scale).
    ex = (
        fanout(table(spark, sf_dir, "documents"), "doc_id")
        .select(F.explode(F.split("text", " ")).alias("term"))
    )
    sketch = count_min_sketch(ex, d=_CMS_D, w=_CMS_W)
    probes = (
        ex.groupBy("term")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "term")
        .limit(20)
    )
    return cms_estimate(sketch, probes, d=_CMS_D, w=_CMS_W)


# ---------------------------------------------------------------------------
# L3 extension (r4; oracle-checked since r5) — zlib compression-ratio
# quality signal.  zlib has no DuckDB builtin, but fixed-level zlib is
# bit-stable, so the expected per-doc values ARE deterministic: a golden
# table materialized once (tests/fixtures/compress_golden.parquet, keyed
# by (doc_id, md5(utf8 text)) across sf0.001/0.01/0.1) lets DuckDB serve
# as a full value oracle.  The md5 join key makes the oracle
# self-verifying — a corpus whose text drifted from the golden's drops
# rows and fails the row-count gate instead of silently passing.
# Spark side: map-only mapInPandas (the signal every corpus filter
# stack carries for repetitive/templated text).
# ---------------------------------------------------------------------------
_COMPRESS_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "compress_golden.parquet",
)

_COMPRESS_ORACLE = f"""
SELECT d.doc_id, g.raw_len, g.comp_len, g.compress_ratio
FROM documents d
JOIN read_parquet('{_COMPRESS_GOLDEN}') g
  ON g.doc_id = d.doc_id AND g.text_md5 = md5(d.text)
ORDER BY d.doc_id
"""


@query("q_compress_ratio", oracle=_COMPRESS_ORACLE)
def q_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import compression_ratio

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        compression_ratio(d)
        .select("doc_id", "raw_len", "comp_len", "compress_ratio")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L5 evaluation (r4) — ANN recall@10, ORACLE-CHECKED: the deterministic
# LSH pipeline's top-10 intersected with the exact cosine top-10,
# entirely in-plan, both sides replayed in DuckDB (their oracle SQL
# already exists — this composes them).  Turns the "recall is
# pytest-asserted" claim into a declared, cross-engine-checked number
# the driver can see.
# ---------------------------------------------------------------------------
def _ann_recall_oracle() -> str:
    exact = """
SELECT e.vec_id
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) DESC,
         e.vec_id
LIMIT 10
"""
    return f"""
WITH approx AS ({_lsh_det_oracle()}),
exact AS ({exact})
SELECT COUNT(*) AS n_hits,
       ROUND(COUNT(*) / 10.0, 6) AS recall_at_10
FROM approx JOIN exact USING (vec_id)
"""


@query("q_ann_recall", oracle=_ann_recall_oracle())
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    approx = q_ann_lsh_det.__wrapped__(spark, sf_dir).select("vec_id")
    exact = q_cosine_topk.__wrapped__(spark, sf_dir).select("vec_id")
    return approx.join(exact, "vec_id").agg(
        F.count("*").alias("n_hits"),
        F.round(F.count("*") / 10.0, 6).alias("recall_at_10"),
    )


# ---------------------------------------------------------------------------
# L2/L3 extension (r5) — exact duplicated-substring coverage (Lee et
# al. 2022), ORACLE-CHECKED: doc-level MinHash cannot see a boilerplate
# paragraph shared by otherwise-distinct pages; this measures, per doc,
# how many tokens sit inside an exact 5-gram that occurs in >= 2
# distinct documents.  Coverage is merged-interval length over the
# sorted duplicated-gram starts — pure array math, no re-join to
# tokens — and the whole pipeline (gram emission, the one deciding
# groupBy(gram) shuffle, per-doc fold) is replayed verbatim in DuckDB.
# The keep-first span REMOVER built on the same machinery is
# operators/text.py remove_duplicated_spans (golden-tested; its output
# text is engine-local by construction, so the declared query checks
# the measurable stats instead).
# ---------------------------------------------------------------------------
_SDS_N = 5

_SUBSTR_DUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
base AS (
  SELECT doc_id, len(t) AS n_tokens, t FROM toks
),
grams AS (
  SELECT doc_id, i AS start,
         array_to_string(t[i:i+{_SDS_N - 1}], ' ') AS g
  FROM base, LATERAL unnest(range(1, n_tokens - {_SDS_N} + 2)) r(i)
  WHERE n_tokens >= {_SDS_N}
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
per AS (
  SELECT doc_id, COUNT(*) AS dup_ngrams,
         list_sort(LIST(start)) AS ss
  FROM grams JOIN dup USING (g)
  GROUP BY doc_id
),
cov AS (
  SELECT doc_id, dup_ngrams,
         CAST({_SDS_N} + COALESCE(list_sum(list_transform(
                  range(2, len(ss) + 1),
                  i -> least({_SDS_N}, ss[i] - ss[i - 1]))), 0) AS BIGINT)
             AS dup_cover
  FROM per
)
SELECT b.doc_id, b.n_tokens,
       COALESCE(c.dup_ngrams, 0) AS dup_ngrams,
       COALESCE(c.dup_cover, 0) AS dup_cover,
       ROUND(COALESCE(c.dup_cover, 0) / b.n_tokens, 6) AS dup_frac
FROM base b LEFT JOIN cov c USING (doc_id)
ORDER BY b.doc_id
"""


@query("q_substr_dup_spans", oracle=_SUBSTR_DUP_ORACLE)
def q_substr_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import duplicated_span_stats
    from pyspec_spark.tables import fanout

    # r13 (guide §2): the positional n-gram build (slice+concat per
    # token position, materialized twice: df-count + coverage) ran
    # single-core below the one-split scan; fanout first (counts,
    # countDistinct, sort_array(collect_list) — order-safe; no-op at
    # scale).
    d = fanout(table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    return duplicated_span_stats(d, n=_SDS_N).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L6/L5 extension (r5) — feature-hashing document embeddings
# (Weinberger et al. 2009), ORACLE-CHECKED: the md5 bucket and ±1 sign
# are bit-identical in DuckDB, bucket sums and squared norms accumulate
# as exact BIGINTs, and the only floats are one sqrt + one division per
# value.  This is the vocabulary-free featurizer that turns a raw text
# corpus into ANN-ready vectors in ONE aggregation pass — the upstream
# producer for the q_cosine_topk/LSH/IVF/PQ similarity stack when no
# learned embeddings exist yet.
# ---------------------------------------------------------------------------
_FH_DIM = 16

_HASH_EMBED_ORACLE = f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok || '#fh'), 1, 8))::BIGINT % {_FH_DIM}
              AS INT) AS dim,
         CASE WHEN ('0x' || substr(md5(tok || '#sg'), 1, 8))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM ex
),
per AS (
  SELECT doc_id, dim, SUM(s) AS raw FROM h GROUP BY doc_id, dim
),
dense AS (
  SELECT d.doc_id, t.dim, COALESCE(p.raw, 0) AS raw
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT CAST(unnest(range(0, {_FH_DIM})) AS INT) AS dim) t
  LEFT JOIN per p ON p.doc_id = d.doc_id AND p.dim = t.dim
),
nrm AS (
  SELECT doc_id, sqrt(CAST(SUM(raw * raw) AS DOUBLE)) AS n2
  FROM dense GROUP BY doc_id
)
SELECT dn.doc_id, dn.dim,
       ROUND(CASE WHEN n.n2 > 0 THEN dn.raw / n.n2 ELSE 0 END, 6) AS fh_val
FROM dense dn JOIN nrm n USING (doc_id)
ORDER BY dn.doc_id, dn.dim
"""


@query("q_hash_embed", oracle=_HASH_EMBED_ORACLE)
def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import feature_hash_embed

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return feature_hash_embed(d, dim=_FH_DIM).orderBy("doc_id", "dim")


# ---------------------------------------------------------------------------
# L5 composite (r5) — IVFADC, the production vector index (Jégou et
# al. 2011 §IV): IVF cells pick WHICH partitions to scan (n_probe /
# n_cells of the files when `cell` is the at-rest partition key), PQ
# codes decide WHAT to shortlist inside them (M small-int columns, no
# raw vectors read), exact cosine re-rank fixes the final order
# (`shortlist` full vectors via broadcast semi-join).  All models ride
# in-plan; zero jobs at build.  Rows-only (both stages approximate by
# construction); recall vs brute force pytest-asserted, and the two
# deterministic twins q_ann_ivf_det / q_ann_pq_det oracle-prove the
# cell-assignment and ADC arithmetic separately.
# ---------------------------------------------------------------------------
@query("q_ann_ivfpq_topk")
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import (
        ivfpq_topk_df,
        pq_codebooks_trained_df,
        train_centroids_df,
    )

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qdf = e.where(F.col("vec_id") == 0).select("embedding")
    cents = train_centroids_df(e, n_cells=16, sample=2000)
    cb = pq_codebooks_trained_df(e, m=8, subd=8, k=16, sample=2000)
    return ivfpq_topk_df(
        e, cents, cb, qdf, m=8, subd=8, k=10, n_probe=6, shortlist=100
    )


# ---------------------------------------------------------------------------
# L5 batch shape (r5) — exact cosine k-NN JOIN, ORACLE-CHECKED: every
# vector of a query set (vec_id < 5) finds its top-3 corpus neighbors
# (self excluded) — the batch primitive behind near-dup clustering,
# kNN classification, and retrieval eval; the single-probe queries
# above are its 1-row special case.  Plan: broadcast query set, map-
# side scoring of the corpus scan, ONE qid-partitioned rank window.
# Exact is the declared baseline (O(|corpus| x 5) map-side); the
# corpus-scale variant is operators/similarity.py knn_join_lsh (band
# equi-join candidates, planted-NN recall measured in tests).
# ---------------------------------------------------------------------------
_KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.qid, e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe),
               6) AS score
  FROM embeddings e, q
  WHERE e.vec_id <> q.qid
),
r AS (
  SELECT qid, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)
             AS rk
  FROM s
)
SELECT qid, vec_id, score, rk FROM r WHERE rk <= 3
ORDER BY qid, rk
"""


@query("q_knn_join", oracle=_KNN_ORACLE)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import knn_join_exact

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.where(F.col("vec_id") < 5)
    return knn_join_exact(e, q, k=3, round_digits=6).orderBy("qid", "rk")


# ---------------------------------------------------------------------------
# L5+ hard-negative mining (r7) — the contrastive-training data-prep
# step: for each anchor vector, the top-3 most-similar corpus vectors
# with a DIFFERENT label (similar-but-wrong = the negatives that carry
# the gradient signal; Karpukhin et al. 2020 use BM25 hard negatives
# for DPR, the embedding-space analog mined here).  Same proven shape
# as q_knn_join: anchors broadcast onto one corpus scan, cosine scored
# map-side via the zip_with/aggregate fold (bit-identical to DuckDB's
# list_cosine_similarity), label exclusion BEFORE the rank window so
# positives never shuffle, top-3 per anchor by a window over an
# |anchors|-key space.
#
# 100 TB posture: corpus scan x1; the only shuffle carries (anchor,
# vec_id, score) triples already filtered to cross-label rows; at a
# larger anchor set the window keys scale with |anchors|, and the
# LSH-pruned variant (knn_join_lsh) is the documented scale path.
# ---------------------------------------------------------------------------
_HN_Q, _HN_K = 8, 3

_HARD_NEG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS anchor_id, embedding AS qe, label AS q_label
  FROM embeddings WHERE vec_id < {_HN_Q}
),
s AS (
  SELECT q.anchor_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.qe AS DOUBLE[])), 6) AS score
  FROM embeddings e
  JOIN q ON e.label <> q.q_label
)
SELECT anchor_id, vec_id AS neg_id, score, CAST(rk AS INT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY anchor_id ORDER BY score DESC, vec_id) AS rk
  FROM s
)
WHERE rk <= {_HN_K}
ORDER BY anchor_id, rk
"""


@query("q_hard_negatives", oracle=_HARD_NEG_ORACLE)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import _dot_sql, _norm_sql

    e = table(spark, sf_dir, "embeddings")
    # r13 (second pass): cosine + rank as parsed SQL (the exact SQL
    # faces of _dot_cols/_norm_expr; 1:1 transliteration)
    q = e.where(f"vec_id < {_HN_Q}").selectExpr(
        "vec_id AS anchor_id", "embedding AS qe", "label AS q_label"
    )
    cos = (
        f"round(({_dot_sql('embedding', 'qe')})"
        f" / (({_norm_sql('embedding')}) * ({_norm_sql('qe')})), 6)"
    )
    scored = e.join(F.broadcast(q), F.expr("label != q_label")).selectExpr(
        "anchor_id", "vec_id AS neg_id", f"{cos} AS score"
    )
    return (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY anchor_id"
            " ORDER BY score DESC, neg_id) AS rk",
        )
        .where(f"rk <= {_HN_K}")
        .select("anchor_id", "neg_id", "score", "rk")
        .orderBy("anchor_id", "rk")
    )


# ---------------------------------------------------------------------------
# L5 evaluation (r5) — PQ recall@10, ORACLE-CHECKED: the deterministic
# ADC ranking's top-10 intersected with the exact cosine top-10 — the
# same composition trick as q_ann_recall (both legs' oracle SQL already
# exists).  This is the honest headline number for raw PQ without
# re-rank: ADC approximates L2 on quantized codes while the exact
# ranking is cosine, so the declared value ALSO documents why the
# production path (q_ann_pq_topk) re-ranks a shortlist instead of
# trusting ADC order.
# ---------------------------------------------------------------------------
def _pq_recall_oracle() -> str:
    from pyspec_spark.queries.ml import _pq_oracle

    exact = """
SELECT e.vec_id
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) DESC,
         e.vec_id
LIMIT 10
"""
    return f"""
WITH approx AS (SELECT vec_id FROM ({_pq_oracle()})),
exact AS ({exact})
SELECT COUNT(*) AS n_hits,
       ROUND(COUNT(*) / 10.0, 6) AS recall_at_10
FROM approx JOIN exact USING (vec_id)
"""


@query("q_pq_recall", oracle=_pq_recall_oracle())
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.queries.ml import q_ann_pq_det

    approx = q_ann_pq_det.__wrapped__(spark, sf_dir).select("vec_id")
    exact = q_cosine_topk.__wrapped__(spark, sf_dir).select("vec_id")
    return approx.join(exact, "vec_id").agg(
        F.count("*").alias("n_hits"),
        F.round(F.count("*") / 10.0, 6).alias("recall_at_10"),
    )


# ---------------------------------------------------------------------------
# L5+ — MMR diversification re-rank (Carbonell & Goldstein 1998),
# ORACLE-CHECKED end to end: the exact cosine top-20 shortlist (the
# proven q_cosine_topk parity idiom) feeds a greedy
#   argmax 0.7*rel - 0.3*max_sel_cos
# selection of 8, replayed in DuckDB by a recursive CTE whose state
# carries the selected vectors.  All cosines snap to 6 places before
# comparison (vec_id tiebreak), so the pick sequence is engine-stable.
# The greedy runs in ONE bounded applyInPandas group (20 rows) on an
# executor — the corpus-sized work is only the shortlist scan.
# ---------------------------------------------------------------------------
_MMR_N, _MMR_K, _MMR_LAM = 20, 8, 0.7

_MMR_ORACLE = f"""
WITH RECURSIVE
cand AS (
  SELECT e.vec_id,
         CAST(e.embedding AS DOUBLE[]) AS emb,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
               CAST(q.embedding AS DOUBLE[])), 6) AS rel
  FROM embeddings e
  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
  WHERE e.vec_id != 0
  ORDER BY rel DESC, e.vec_id
  LIMIT {_MMR_N}
),
sel AS (
  (SELECT 1 AS rnk, c.vec_id, c.rel, c.rel AS mmr,
          [c.emb] AS sel_vecs, [c.vec_id] AS sel_ids
   FROM cand c ORDER BY c.rel DESC, c.vec_id LIMIT 1)
  UNION ALL
  SELECT s.rnk + 1, c.vec_id, c.rel, c.score,
         list_append(s.sel_vecs, c.emb), list_append(s.sel_ids, c.vec_id)
  FROM sel s, LATERAL (
    SELECT c2.vec_id, c2.rel, c2.emb,
           ROUND({_MMR_LAM} * c2.rel - {round(1 - _MMR_LAM, 6)} *
               list_max(list_transform(s.sel_vecs,
                   v -> ROUND(list_cosine_similarity(c2.emb, v), 6))),
               6) AS score
    FROM cand c2
    WHERE NOT list_contains(s.sel_ids, c2.vec_id)
    ORDER BY score DESC, c2.vec_id LIMIT 1
  ) c
  WHERE s.rnk < {_MMR_K}
)
SELECT rnk AS rank, vec_id, rel, mmr FROM sel ORDER BY rnk
"""


@query("q_mmr_rerank", oracle=_MMR_ORACLE)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import mmr_rerank

    from pyspec_spark.operators.similarity import _dot_sql, _norm_sql

    e = table(spark, sf_dir, "embeddings")
    # r13 (second pass): cosine as parsed SQL (the exact SQL faces of
    # the former zip_with/transform Column chains)
    q = e.where("vec_id = 0").selectExpr("embedding AS qv")
    cos = (
        f"round(({_dot_sql('embedding', 'qv')})"
        f" / (({_norm_sql('embedding')}) * ({_norm_sql('qv')})), 6)"
    )
    # The corpus-sized scan computes ONLY (vec_id, rel): attaching the
    # double-cast embedding inside the scan would run the cast HOF on
    # every row for 20 survivors (measured 2.2x the scan cost at
    # sf0.1).  The 20-row top-k is broadcast back onto the table so
    # the cast touches exactly the shortlist.
    rel_top = (
        e.where("vec_id != 0")
        .crossJoin(F.broadcast(q))
        .selectExpr("vec_id", f"{cos} AS rel")
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_N)
    )
    shortlist = (
        e.select("vec_id", "embedding")
        .join(F.broadcast(rel_top), "vec_id")
        .selectExpr(
            "vec_id",
            "rel",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb",
        )
    )
    return mmr_rerank(shortlist, k=_MMR_K, lam=_MMR_LAM)


# ---------------------------------------------------------------------------
# L37 image perceptual-hash near-dup (r7) — the multimodal face of the
# L2 dedup family: text MinHash cannot see that two JPEGs are the same
# picture re-encoded (the bytes share nothing), pHash can (operators/
# phash.py: grayscale -> 32x32 -> DCT-II -> 8x8 low-freq -> median
# threshold -> 64 bits).  The media table plants the truth: 8 synth
# pictures each encoded twice (q92 4:4:4 and q30 4:2:0); re-encode
# pairs measure <= 6 bits apart, distinct pictures >= 10 (margin
# pinned in tests/test_phash.py), so tau = 7 recovers exactly the
# planted pairs.
#
# Scale shape: hashes band into 8x8-bit keys and candidates come from
# band equality — by pigeonhole a Hamming-<=7 pair MUST agree on at
# least one of 8 bands, so at this threshold the banded join has
# GUARANTEED recall (not probabilistic like MinHash banding) and the
# oracle may use the equivalent exact form over the committed golden
# hashes.  The exact Hamming check runs only on band collisions; no
# all-pairs path exists (plan-gated: no cartesian).  Decode + hash
# leave only 8 bytes per image; the band join shuffles |images| x 8
# tiny rows.
# ---------------------------------------------------------------------------
_PHASH_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "phash_golden.parquet",
)
_PHASH_TAU = 7
_PHASH_BANDS = 8

_PHASH_ORACLE = f"""
WITH g AS (
  SELECT media_id, phash FROM read_parquet('{_PHASH_GOLDEN}')
)
SELECT a.media_id AS media_a, c.media_id AS media_b,
       CAST(bit_count(xor(a.phash, c.phash)) AS INT) AS hamming
FROM g a JOIN g c ON a.media_id < c.media_id
WHERE bit_count(xor(a.phash, c.phash)) <= {_PHASH_TAU}
ORDER BY media_a, media_b
"""


@query("q_image_phash_dedup", oracle=_PHASH_ORACLE)
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import image_phash, make_phash_media

    ph = image_phash(make_phash_media(spark, n_base=8))
    band_vals = F.array(
        *[
            F.shiftright(F.col("phash"), 8 * b).bitwiseAND(F.lit(255))
            for b in range(_PHASH_BANDS)
        ]
    )
    e = ph.select(
        "media_id", "phash", F.posexplode(band_vals).alias("b", "v")
    )
    cand = (
        e.alias("a")
        .join(
            e.alias("c"),
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.v") == F.col("c.v"))
            & (F.col("a.media_id") < F.col("c.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("c.media_id").alias("media_b"),
            F.col("a.phash").alias("pa"),
            F.col("c.phash").alias("pb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= _PHASH_TAU)
        .select("media_a", "media_b", "hamming")
        .orderBy("media_a", "media_b")
    )


# ---------------------------------------------------------------------------
# L37b VIDEO perceptual near-dup (r13) — the last uncovered media type
# of the L2 dedup family: two re-encodes of the same CLIP share no
# bytes (different quality + subsampling through different encoders),
# so byte/minhash dedup sees nothing; a frame-sampled pHash signature
# does.  Composition of two oracle-green pieces: the mp4 demuxer's
# seek-by-sample-table (operators/mp4.py — only frames 0,2,4,6 are
# ever sliced out of the payload) and the L37 image pHash
# (operators/phash.py), emitted as (media_id, frame_idx, phash) rows —
# a clip's signature is 4 longs regardless of payload size.
#
# Distance = TOTAL Hamming over the aligned sampled frames.  The media
# table plants the truth (make_video_phash_media: 6 synth clips, each
# a q92 4:4:4 and a q30 4:2:0 MJPEG-MP4): re-encode pairs total <= 14,
# distinct clips >= 28 (margins pinned in tests/test_video_phash.py),
# so tau = 20 recovers exactly the (2i, 2i+1) pairs.
#
# Banding recall is GUARANTEED, not probabilistic: total <= 20 over 4
# frames means SOME frame is <= 5 < 8 bits, and by pigeonhole a
# <= 7-bit frame pair agrees on one of its 8 8-bit bands — so banding
# per (frame_idx, band) finds every pair under the threshold.  The
# exact total-Hamming check runs only on band collisions; no all-pairs
# path exists (plan-gated: no cartesian).  Oracle = the equivalent
# exact form over the committed golden signature table, reproduced
# from the live mux+demux+decode+hash chain by the pytest.
# ---------------------------------------------------------------------------
_VPHASH_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "video_phash_golden.parquet",
)
_VPHASH_TAU_SUM = 20
_VPHASH_BANDS = 8

_VPHASH_ORACLE = f"""
WITH g AS (
  SELECT media_id, frame_idx, phash
  FROM read_parquet('{_VPHASH_GOLDEN}')
)
SELECT a.media_id AS media_a, c.media_id AS media_b,
       CAST(SUM(bit_count(xor(a.phash, c.phash))) AS BIGINT) AS ham_total
FROM g a
JOIN g c ON a.media_id < c.media_id AND a.frame_idx = c.frame_idx
GROUP BY 1, 2
HAVING SUM(bit_count(xor(a.phash, c.phash))) <= {_VPHASH_TAU_SUM}
ORDER BY media_a, media_b
"""


@query("q_video_phash_dedup", oracle=_VPHASH_ORACLE)
def q_video_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        make_video_phash_media,
        video_phash,
    )

    sig = video_phash(
        make_video_phash_media(spark, n_base=6), sample_every=2
    )
    band_vals = F.array(
        *[
            F.shiftright(F.col("phash"), 8 * b).bitwiseAND(F.lit(255))
            for b in range(_VPHASH_BANDS)
        ]
    )
    e = sig.select(
        "media_id", "frame_idx", "phash",
        F.posexplode(band_vals).alias("b", "v"),
    )
    cand = (
        e.alias("a")
        .join(
            e.alias("c"),
            (F.col("a.frame_idx") == F.col("c.frame_idx"))
            & (F.col("a.b") == F.col("c.b"))
            & (F.col("a.v") == F.col("c.v"))
            & (F.col("a.media_id") < F.col("c.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("c.media_id").alias("media_b"),
        )
        .distinct()
    )
    # exact total-Hamming over the aligned signatures, candidates only
    pair = (
        cand.join(sig.alias("sa"), F.col("media_a") == F.col("sa.media_id"))
        .join(
            sig.alias("sc"),
            (F.col("media_b") == F.col("sc.media_id"))
            & (F.col("sa.frame_idx") == F.col("sc.frame_idx")),
        )
        .select(
            "media_a",
            "media_b",
            F.bit_count(
                F.col("sa.phash").bitwiseXOR(F.col("sc.phash"))
            ).alias("d"),
        )
    )
    return (
        pair.groupBy("media_a", "media_b")
        .agg(F.sum("d").cast("bigint").alias("ham_total"))
        .where(F.col("ham_total") <= _VPHASH_TAU_SUM)
        .orderBy("media_a", "media_b")
    )


# ---------------------------------------------------------------------------
# L38 audio landmark-fingerprint near-dup (r7) — the audio face of the
# L2 dedup family: two WAVs of the SAME recording at a different level
# with added noise share no bytes (the planted degrade is
# noise-DOMINATED in the time domain), so byte/minhash dedup cannot
# see them; constellation landmarks can (operators/audiofp.py: STFT ->
# per-frame spectral peaks -> anchored peak pairs -> packed
# (f1,f2,dt) int64 hashes — clean-room from the published landmark
# construction).  The media table plants the truth: 8 deterministic
# melodies each present clean AND degraded (0.4x level + sigma=600
# noise); true pairs share >=149 hashes, distinct clips <=29 (margins
# pinned in tests/test_audiofp.py), so threshold 60 recovers exactly
# the (2i, 2i+1) pairs.
#
# Scale shape: clips never compare all-pairs — each emits a bounded
# hash set, candidates come from hash equality (ONE groupBy shuffle on
# the exploded landmark table, exactly the MinHash-band posture), and
# the pair score is the shared-hash count.  Only 8-byte hashes leave
# the decode stage.  Oracle = the same join/count over the committed
# golden landmark table, reproduced from the live
# decode+STFT+peak+hash chain by tests/test_audiofp.py.
# ---------------------------------------------------------------------------
_AUDIOFP_GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "audiofp_golden.parquet",
)
_AUDIOFP_MIN_SHARED = 60

_AUDIOFP_ORACLE = f"""
WITH g AS (
  SELECT media_id, lhash FROM read_parquet('{_AUDIOFP_GOLDEN}')
)
SELECT a.media_id AS media_a, c.media_id AS media_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM g a JOIN g c ON a.lhash = c.lhash AND a.media_id < c.media_id
GROUP BY 1, 2
HAVING COUNT(*) >= {_AUDIOFP_MIN_SHARED}
ORDER BY media_a, media_b
"""


@query("q_audio_fp_dedup", oracle=_AUDIOFP_ORACLE)
def q_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.multimodal import (
        audio_landmark_table,
        make_audiofp_media,
    )

    lm = audio_landmark_table(make_audiofp_media(spark, n_base=8))
    pairs = (
        lm.alias("a")
        .join(
            lm.alias("c"),
            (F.col("a.lhash") == F.col("c.lhash"))
            & (F.col("a.media_id") < F.col("c.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("c.media_id").alias("media_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.where(F.col("n_shared") >= _AUDIOFP_MIN_SHARED)
        .orderBy("media_a", "media_b")
    )


# ---------------------------------------------------------------------------
# L39 bitext / parallel-pair mining (r7) — the cross-lingual curation
# step behind CCMatrix/NLLB-style corpora: for every source-side
# sentence vector, the best target-side match scored by the RATIO
# MARGIN of Artetxe & Schwenk 2019 — cos(x,y) normalised by the mean
# cosine of each side's k nearest neighbours — because an absolute
# cosine threshold cannot separate true translations from hubs (vectors
# near everything).  margin > 1 means "y is closer to x than x's
# typical neighbourhood", the published mining criterion.
#
# Sides are closed-form on vec_id (even = source language, odd =
# target) so the pair universe needs no extra table.  All cosines are
# quantised to exact micro-units (the `_fixed6` basis) so both k-NN
# denominator sums are order-independent bigint sums; the margin is ONE
# bigint/bigint double division under the terminal ROUND — no libm, no
# float accumulation (the q_soft_dedup determinism recipe).
#
# 100 TB posture: the mined side here is a bounded anchor set (8 rows)
# broadcast onto ONE target-side scan — the same shape as
# q_hard_negatives; the scored table shuffles three times on small key
# spaces (src window, tgt window, final argmax).  Mining corpus ×
# corpus at web scale replaces the exact scan with the LSH/IVF
# shortlist (knn_join_lsh / q_ann_ivf_topk are the documented scale
# path) and the margin arithmetic is unchanged — it only ever sees the
# shortlist.
# ---------------------------------------------------------------------------
_BT_SRC, _BT_K = 16, 4  # anchors = even vec_id < 16 (8 rows); k-NN mean size

_BITEXT_ORACLE = f"""
WITH src AS (
  SELECT vec_id AS src_id, embedding AS se
  FROM embeddings WHERE vec_id < {_BT_SRC} AND vec_id % 2 = 0
),
tgt AS (
  SELECT vec_id AS tgt_id, embedding AS te
  FROM embeddings WHERE vec_id % 2 = 1
),
s AS (
  SELECT src_id, tgt_id,
         CAST(ROUND(list_cosine_similarity(CAST(te AS DOUBLE[]),
                                           CAST(se AS DOUBLE[])) * 1e6)
              AS BIGINT) AS c
  FROM tgt CROSS JOIN src
),
rx AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY c DESC, tgt_id)
              AS rk_x
  FROM s
),
dx AS (
  SELECT *, SUM(CASE WHEN rk_x <= {_BT_K} THEN c ELSE 0 END)
              OVER (PARTITION BY src_id) AS den_x
  FROM rx
),
ry AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY c DESC, src_id)
              AS rk_y
  FROM dx
),
dy AS (
  SELECT *, SUM(CASE WHEN rk_y <= {_BT_K} THEN c ELSE 0 END)
              OVER (PARTITION BY tgt_id) AS den_y
  FROM ry
),
m AS (
  SELECT src_id, tgt_id,
         CAST(c AS DOUBLE) / 1e6 AS cos_sim,
         CASE WHEN den_x + den_y > 0
              THEN ROUND(CAST(2 * {_BT_K} * c AS DOUBLE)
                         / CAST(den_x + den_y AS DOUBLE), 6)
              ELSE 0.0 END AS margin
  FROM dy
)
SELECT src_id, tgt_id, cos_sim, margin
FROM (
  SELECT *, ROW_NUMBER() OVER (
              PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rk
  FROM m
)
WHERE rk = 1
ORDER BY src_id
"""


@query("q_bitext_mine", oracle=_BITEXT_ORACLE)
def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.functions.determinism import _fixed6_sql
    from pyspec_spark.operators.similarity import (
        _dot_sql,
        _norm_sql,
        bitext_margin,
    )

    e = table(spark, sf_dir, "embeddings")
    src = e.where((F.col("vec_id") < _BT_SRC) & (F.col("vec_id") % 2 == 0)).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("se")
    )
    tgt = e.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("te")
    )
    # r13: the 64-dim cosine as ONE parsed-SQL projection (the exact
    # SQL faces of _dot_cols/_norm_expr/_fixed6; former Column chain
    # cost ~600 py4j round trips per build).
    cos = (
        f"({_dot_sql('te', 'se')})"
        f" / (({_norm_sql('te')}) * ({_norm_sql('se')}))"
    )
    s = tgt.crossJoin(F.broadcast(src)).selectExpr(
        "src_id", "tgt_id", f"{_fixed6_sql(cos)} AS c"
    )
    return bitext_margin(s, _BT_K)


# ---------------------------------------------------------------------------
# L39 scale path (r8) — the corpus x corpus variant the q_bitext_mine
# docstring prescribes, now REAL: bitext_mine_lsh swaps the exact
# broadcast scan for the knn_join_lsh banded-signature shortlist and
# reuses the identical bitext_margin arithmetic.  Rows-only by design
# (the LSH candidate set is signature-dependent, not SQL-replayable);
# the planted-translation recall pytest
# (test_llm_ops.py::test_bitext_mine_lsh_planted_translation_recall)
# is the correctness evidence, the knn_join_lsh precedent.
# ---------------------------------------------------------------------------
@query("q_bitext_mine_lsh")
def q_bitext_mine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import bitext_mine_lsh

    e = table(spark, sf_dir, "embeddings")
    src = e.where((F.col("vec_id") < _BT_SRC) & (F.col("vec_id") % 2 == 0)).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("se")
    )
    tgt = e.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("te")
    )
    return bitext_mine_lsh(src, tgt, k=_BT_K, max_hamming=6)


# ---------------------------------------------------------------------------
# L2d — dedup threshold sweep (r7): the tuning table behind "dedup at
# Jaccard >= X" — for every feasible estimate level of the 64-hash
# MinHash (n matching hash positions, n = 32..64, i.e. tau = n/64 from
# 0.5 to 1.0), how many candidate pairs the banded index would keep.
# The q_gate_sweep idea applied to the dedup family: produced BEFORE
# committing to a threshold, on the SAME signature/band basis as
# q_minhash_neardup (its oracle prefix is reused by string surgery on
# the registered constant, so the candidate set cannot drift).  The
# grid is integer match-counts, not float taus — 1/64 is the method's
# real resolution, and integer thresholds make every comparison exact.
#
# 100 TB posture: the banded candidate pairs are the SAME bounded set
# the near-dup query already materializes (never all-pairs); the sweep
# adds one map-side explode of <= 33 qualifying levels per pair and a
# 33-key aggregation — the tuning table costs one extra tiny shuffle
# on top of the index build.
# ---------------------------------------------------------------------------
_TAU_MIN = 32  # n/64 = 0.5

# everything up to the final threshold filter = the candidate+estimate set
_MINHASH_PAIRS_SQL = _MINHASH_ORACLE.rsplit("WHERE ROUND", 1)[0]

_TAU_SWEEP_ORACLE = f"""
WITH pairs AS ({_MINHASH_PAIRS_SQL}),
n AS (
  SELECT CAST(ROUND(est_jaccard * 64) AS INT) AS n64 FROM pairs
),
grid AS (SELECT CAST(unnest(range({_TAU_MIN}, 65)) AS INT) AS t),
counts AS (
  SELECT t, CAST(COUNT(n64) AS BIGINT) AS n_pairs
  FROM grid LEFT JOIN n ON n64 >= t
  GROUP BY t
)
SELECT t, ROUND(t / 64.0, 6) AS tau, n_pairs
FROM counts
ORDER BY t
"""


@query("q_dedup_tau_sweep", oracle=_TAU_SWEEP_ORACLE)
def q_dedup_tau_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_neardup(
        d, threshold=0.0, pre_partition=spark.sparkContext.defaultParallelism
    )
    # r13 (second pass): level explode + grid projection as parsed SQL
    # (1:1 transliteration of the former Column chain)
    n64 = "CAST(round(est_jaccard * 64) AS INT)"
    lvls = (
        f"CASE WHEN {n64} >= {_TAU_MIN}"
        f" THEN sequence({_TAU_MIN}, least({n64}, 64))"
        " ELSE array() END"
    )
    counts = (
        pairs.selectExpr(f"explode({lvls}) AS t")
        .groupBy("t")
        .agg(F.count("*").alias("n_pairs"))
    )
    grid = spark.range(_TAU_MIN, 65).selectExpr("CAST(id AS INT) AS t")
    return (
        grid.join(counts, "t", "left")
        .selectExpr(
            "t",
            "round(t / 64.0D, 6) AS tau",
            "CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs",
        )
        .orderBy("t")
    )


# ---------------------------------------------------------------------------
# L30+ avc1 I_PCM FRAME decode under the oracle gate (r8) — the
# long-documented H.264 frame-decode boundary narrowed to
# per-macroblock: samples are REAL IDR/I_PCM access units
# (operators/h264.py encode_ipcm_idr; raw byte-aligned samples, the
# lossless-archival coding mode), muxed behind real stsz/stsc/stco with
# a real avcC, demuxed and decoded in-executor, cropped by the SPS'
# TRUE dimensions (non-16-multiples, so the crop is load-bearing).  The
# oracle needs NO golden file: the planes are closed-form integer
# modular patterns, so DuckDB replays the per-frame pixel sums from
# generate-series arithmetic — any slice-header, alignment, escaping,
# demux, or crop defect flips an exact integer.
#
# 100 TB posture: decode runs in mapInPandas on executors (payloads
# never move), only (media, frame, 4 ints) rows shuffle.  Transformed/
# predicted macroblocks remain the contract NotImplementedError.
# ---------------------------------------------------------------------------
_IPCM_N, _IPCM_FRAMES = 4, 2

_IPCM_ORACLE = f"""
WITH m AS (SELECT CAST(unnest(range(0, {_IPCM_N})) AS BIGINT) AS media_id),
fr AS (SELECT CAST(unnest(range(0, {_IPCM_FRAMES})) AS INT) AS frame_id),
d AS (SELECT media_id, 44 + 4 * media_id AS w, 28 + 4 * media_id AS h FROM m),
ys AS (
  SELECT d.media_id, fr.frame_id,
         CAST(COUNT(*) AS BIGINT) AS n_px,
         CAST(SUM((xx.x * 7 + yy.y * 13 + d.media_id * 31
                   + fr.frame_id * 17) % 254 + 1) AS BIGINT) AS y_sum
  FROM d, fr,
       LATERAL (SELECT unnest(range(0, d.w)) AS x) xx,
       LATERAL (SELECT unnest(range(0, d.h)) AS y) yy
  GROUP BY 1, 2
),
cs AS (
  SELECT d.media_id, fr.frame_id,
         CAST(SUM((xx.x * 5 + yy.y * 11 + d.media_id * 7
                   + fr.frame_id * 3) % 254 + 1) AS BIGINT) AS cb_sum,
         CAST(SUM((xx.x * 3 + yy.y * 7 + d.media_id * 13
                   + fr.frame_id * 5) % 254 + 1) AS BIGINT) AS cr_sum
  FROM d, fr,
       LATERAL (SELECT unnest(range(0, d.w // 2)) AS x) xx,
       LATERAL (SELECT unnest(range(0, d.h // 2)) AS y) yy
  GROUP BY 1, 2
)
SELECT ys.media_id, ys.frame_id, ys.n_px, ys.y_sum, cs.cb_sum, cs.cr_sum
FROM ys JOIN cs USING (media_id, frame_id)
ORDER BY media_id, frame_id
"""


@query("q_avc_ipcm_frames", oracle=_IPCM_ORACLE)
def q_avc_ipcm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from pyspec_spark.operators.multimodal import make_avc_ipcm_media

    media = make_avc_ipcm_media(spark, n=_IPCM_N, frames=_IPCM_FRAMES)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pyspec_spark.operators.mp4 import (
            extract_mp4_samples,
            parse_mp4_metadata,
        )
        from pyspec_spark.operators.multimodal import decode_avc_ipcm_sample

        cols = ["media_id", "frame_id", "n_px", "y_sum", "cb_sum", "cr_sum"]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                meta = parse_mp4_metadata(payload)
                video = next(
                    t for t in meta["tracks"] if t["handler"] == "vide"
                )
                w, h = video["avc"]["width"], video["avc"]["height"]
                _, samples = extract_mp4_samples(payload)
                for f, s in enumerate(samples):
                    y, cb, cr = decode_avc_ipcm_sample(s, w, h)
                    out.append(
                        {
                            "media_id": int(r["media_id"]),
                            "frame_id": f,
                            "n_px": w * h,
                            "y_sum": int(y.sum(dtype=np.int64)),
                            "cb_sum": int(cb.sum(dtype=np.int64)),
                            "cr_sum": int(cr.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(
        run,
        "media_id BIGINT, frame_id INT, n_px BIGINT, y_sum BIGINT, "
        "cb_sum BIGINT, cr_sum BIGINT",
    ).orderBy("media_id", "frame_id")


# ---------------------------------------------------------------------------
# L30+ hvc1 PCM FRAME decode under the oracle gate (r9) — the HEVC
# half of the video frame-decode boundary narrowed to per-CU: samples
# are REAL all-PCM IDR access units (operators/h265.py
# encode_pcm_islice — CABAC-framed PCM coding units: real context
# init, DecodeDecision part_mode bins, terminate-bin pcm_flag /
# end_of_slice, engine re-init after every pcm_sample block), muxed
# behind real stsz/stsc/stco with a real hvcC (SPS+PPS arrays),
# demuxed and decoded in-executor, windowed by the SPS conformance
# window (non-16-multiple dims, so the window is load-bearing).  Same
# golden-file-free oracle scheme as q_avc_ipcm_frames: the planes are
# closed-form integer modular patterns, so DuckDB replays per-frame
# pixel sums from generate-series arithmetic — any CABAC, alignment,
# escaping, demux, or window defect flips an exact integer.
#
# 100 TB posture: decode runs in mapInPandas on executors (payloads
# never move), only (media, frame, 4 ints) rows shuffle.  Non-PCM
# coding units remain the contract NotImplementedError.
# ---------------------------------------------------------------------------
_HEVC_IPCM_N, _HEVC_IPCM_FRAMES = 4, 2

_HEVC_IPCM_ORACLE = f"""
WITH m AS (SELECT CAST(unnest(range(0, {_HEVC_IPCM_N})) AS BIGINT) AS media_id),
fr AS (SELECT CAST(unnest(range(0, {_HEVC_IPCM_FRAMES})) AS INT) AS frame_id),
d AS (SELECT media_id, 36 + 4 * media_id AS w, 24 + 4 * media_id AS h FROM m),
ys AS (
  SELECT d.media_id, fr.frame_id,
         CAST(COUNT(*) AS BIGINT) AS n_px,
         CAST(SUM((xx.x * 7 + yy.y * 13 + d.media_id * 31
                   + fr.frame_id * 17) % 254 + 1) AS BIGINT) AS y_sum
  FROM d, fr,
       LATERAL (SELECT unnest(range(0, d.w)) AS x) xx,
       LATERAL (SELECT unnest(range(0, d.h)) AS y) yy
  GROUP BY 1, 2
),
cs AS (
  SELECT d.media_id, fr.frame_id,
         CAST(SUM((xx.x * 5 + yy.y * 11 + d.media_id * 7
                   + fr.frame_id * 3) % 254 + 1) AS BIGINT) AS cb_sum,
         CAST(SUM((xx.x * 3 + yy.y * 7 + d.media_id * 13
                   + fr.frame_id * 5) % 254 + 1) AS BIGINT) AS cr_sum
  FROM d, fr,
       LATERAL (SELECT unnest(range(0, d.w // 2)) AS x) xx,
       LATERAL (SELECT unnest(range(0, d.h // 2)) AS y) yy
  GROUP BY 1, 2
)
SELECT ys.media_id, ys.frame_id, ys.n_px, ys.y_sum, cs.cb_sum, cs.cr_sum
FROM ys JOIN cs USING (media_id, frame_id)
ORDER BY media_id, frame_id
"""


@query("q_hevc_ipcm_frames", oracle=_HEVC_IPCM_ORACLE)
def q_hevc_ipcm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from pyspec_spark.operators.multimodal import make_hevc_ipcm_media

    media = make_hevc_ipcm_media(
        spark, n=_HEVC_IPCM_N, frames=_HEVC_IPCM_FRAMES
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pyspec_spark.operators.mp4 import (
            extract_mp4_samples,
            parse_mp4_metadata,
        )
        from pyspec_spark.operators.multimodal import decode_hevc_ipcm_sample

        cols = ["media_id", "frame_id", "n_px", "y_sum", "cb_sum", "cr_sum"]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                meta = parse_mp4_metadata(payload)
                video = next(
                    t for t in meta["tracks"] if t["handler"] == "vide"
                )
                w, h = video["hevc"]["width"], video["hevc"]["height"]
                _, samples = extract_mp4_samples(payload)
                for f, s in enumerate(samples):
                    y, cb, cr = decode_hevc_ipcm_sample(s, w, h)
                    out.append(
                        {
                            "media_id": int(r["media_id"]),
                            "frame_id": f,
                            "n_px": w * h,
                            "y_sum": int(y.sum(dtype=np.int64)),
                            "cb_sum": int(cb.sum(dtype=np.int64)),
                            "cr_sum": int(cr.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(
        run,
        "media_id BIGINT, frame_id INT, n_px BIGINT, y_sum BIGINT, "
        "cb_sum BIGINT, cr_sum BIGINT",
    ).orderBy("media_id", "frame_id")


# ---------------------------------------------------------------------------
# L7+ FLAC audio decode under the oracle gate (r9) — the audio half of
# the multimodal boundary narrowed: speech corpora (LibriSpeech and
# kin) ship FLAC, and FLAC is LOSSLESS, so the decode is held to the
# same exact-integer contract as the PCM video paths.  Fixture
# payloads are REAL FLAC streams (operators/flac.py: STREAMINFO,
# CRC-8/CRC-16-checked frames, CONSTANT/FIXED/VERBATIM subframes with
# Rice-coded residuals, MD5-verified PCM) synthesized from closed-form
# integer modular samples; the query decodes in-executor and emits
# per-window integer sums, and DuckDB replays the same sums from
# generate-series arithmetic — any framing, Rice, CRC, or predictor
# defect flips an exact integer.  The decoder covers the full lossless
# surface (LPC 1-32, all three stereo decorrelation modes, partitioned
# Rice + raw escape, wasted bits — r9) at every standard depth
# 8/12/16/20/24/32 (r10); only nonstandard depths raise.
#
# 100 TB posture: decode runs in mapInPandas on executors (payloads
# never move); only (media, window, 3 ints) rows shuffle.
# ---------------------------------------------------------------------------
_FLAC_N, _FLAC_WIN = 4, 500


def _flac_len(m: int) -> int:
    return 3000 + 500 * m


def _flac_sample_expr(m: str, i: str) -> str:
    """The synth pattern, as SQL over media index m and sample index i."""
    return f"(({i} * (7 + {m}) + {m} * 97) % 4001) - 2000"


_FLAC_ORACLE = f"""
WITH m AS (SELECT CAST(unnest(range(0, {_FLAC_N})) AS BIGINT) AS media_id),
s AS (
  SELECT m.media_id,
         CAST(ii.i AS BIGINT) AS i,
         CAST({_flac_sample_expr('m.media_id', 'ii.i')} AS BIGINT) AS x
  FROM m, LATERAL (
    SELECT unnest(range(0, 3000 + 500 * m.media_id)) AS i
  ) ii
)
SELECT media_id,
       CAST(i // {_FLAC_WIN} AS INT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_s,
       CAST(SUM(ABS(x)) AS BIGINT) AS sum_abs
FROM s
GROUP BY 1, 2
ORDER BY media_id, window_id
"""


@query("q_flac_roundtrip", oracle=_FLAC_ORACLE)
def q_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from pyspec_spark.operators.flac import encode_flac
    from pyspec_spark.operators.multimodal import MEDIA_SCHEMA

    rows = []
    for m in range(_FLAC_N):
        n = _flac_len(m)
        i = np.arange(n, dtype=np.int64)
        x = ((i * (7 + m) + m * 97) % 4001 - 2000).astype(np.int16)
        rows.append(
            (m, "audio", "flac", None, None, n,
             bytearray(encode_flac(x, rate=16000)))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspec_spark.operators.flac import decode_flac

        cols = ["media_id", "window_id", "n", "sum_s", "sum_abs"]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                samples, _rate = decode_flac(bytes(r["payload"]))
                x = samples[:, 0].astype(np.int64)
                for w in range(len(x) // _FLAC_WIN):
                    seg = x[w * _FLAC_WIN : (w + 1) * _FLAC_WIN]
                    out.append(
                        {
                            "media_id": int(r["media_id"]),
                            "window_id": w,
                            "n": len(seg),
                            "sum_s": int(seg.sum()),
                            "sum_abs": int(np.abs(seg).sum()),
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(
        run,
        "media_id BIGINT, window_id INT, n BIGINT, sum_s BIGINT, "
        "sum_abs BIGINT",
    ).orderBy("media_id", "window_id")


# ---------------------------------------------------------------------------
# L2g — typo canonicalization via the EXACT fuzzy (edit-distance) join
# (r13).  The vocabulary-repair pipeline every OCR / user-generated /
# crawl corpus runs before token statistics: map noisy token variants
# back to their canonical vocabulary forms.  The noisy set is PLANTED
# deterministically from the corpus itself (the L37b planted-truth
# pattern): each clean vocabulary word spawns _TYPO_DRAWS corrupted
# variants via a content-keyed md5 draw choosing the edit mode
# (substitute / delete / insert), position, and replacement letter —
# bit-identical in DuckDB, so the ENTIRE pipeline (corruption, the
# deletion-neighborhood banded join, the exact levenshtein verify, the
# per-noisy canonical pick) is oracle-checked end to end.
#
# Matching is SymSpell deletion-neighborhood banding
# (operators/dedup.py fuzzy_token_matches): recall at tau=1 is
# GUARANTEED by the banding theorem, precision by the exact
# levenshtein — no all-pairs product at any vocabulary size
# (plan-gated).  Scale: vocabulary is distinct-ed before the explode
# (bounded by vocabulary density, not corpus frequency); the only
# shuffles are token-keyed distincts and the variant-keyed equi-join.
# ---------------------------------------------------------------------------
_TYPO_DRAWS = 8
_TYPO_ALPHA = "abcdefghijklmnopqrstuvwxyz"

_TYPO_ORACLE = f"""
WITH clean AS (
  SELECT DISTINCT w
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE regexp_matches(w, '^[a-z]{{3,20}}$')
),
draw AS (
  SELECT w, d,
         (('0x' || substr(md5(w || ':' || d), 1, 2))::BIGINT % 3) AS mode,
         CAST(('0x' || substr(md5(w || ':' || d), 3, 4))::BIGINT
              % length(w) AS INT) AS p,
         substr('{_TYPO_ALPHA}',
                CAST(('0x' || substr(md5(w || ':' || d), 7, 2))::BIGINT
                     % 26 AS INT) + 1, 1) AS letter
  FROM clean, (SELECT unnest(range({_TYPO_DRAWS})) AS d)
),
noisy0 AS (
  SELECT DISTINCT
         CASE mode
           WHEN 0 THEN substr(w, 1, p) || letter || substr(w, p + 2)
           WHEN 1 THEN substr(w, 1, p) || substr(w, p + 2)
           ELSE substr(w, 1, p) || letter || substr(w, p + 1)
         END AS noisy
  FROM draw
),
noisy AS (
  SELECT noisy FROM noisy0
  WHERE noisy NOT IN (SELECT w FROM clean)
),
m AS (
  SELECT n.noisy, c.w AS canon
  FROM noisy n
  JOIN clean c
    ON abs(length(n.noisy) - length(c.w)) <= 1
   AND levenshtein(n.noisy, c.w) <= 1
)
SELECT noisy, MIN(canon) AS canon, CAST(COUNT(*) AS INT) AS n_cands
FROM m
GROUP BY noisy
ORDER BY noisy
"""


def _typo_noisy_vocab(clean: DataFrame) -> DataFrame:
    """Deterministic planted corruptions of the clean vocabulary:
    (w, d) -> one of substitute/delete/insert keyed by md5(w || ':' || d),
    minus any corruption that lands back ON a vocabulary word."""
    w = F.col("w")
    h = F.md5(
        F.concat(w, F.lit(":"), F.col("d").cast("string")).cast("binary")
    )
    mode = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % 3
    p = (F.conv(F.substring(h, 3, 4), 16, 10).cast("long") % F.length(w)).cast(
        "int"
    )
    letter = F.substring(
        F.lit(_TYPO_ALPHA),
        (F.conv(F.substring(h, 7, 2), 16, 10).cast("long") % 26).cast("int")
        + F.lit(1),
        F.lit(1),
    )
    head = F.substring(w, F.lit(1), p)
    tail_sub = F.substring(w, p + F.lit(2), F.length(w))
    tail_ins = F.substring(w, p + F.lit(1), F.length(w))
    corrupted = (
        F.when(mode == 0, F.concat(head, letter, tail_sub))
        .when(mode == 1, F.concat(head, tail_sub))
        .otherwise(F.concat(head, letter, tail_ins))
    )
    return (
        clean.select("w", F.explode(F.sequence(F.lit(0), F.lit(_TYPO_DRAWS - 1))).alias("d"))
        .select(corrupted.alias("noisy"))
        .distinct()
        .join(clean.withColumnRenamed("w", "noisy"), "noisy", "left_anti")
    )


@query("q_typo_canon", oracle=_TYPO_ORACLE)
def q_typo_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.dedup import fuzzy_token_matches

    docs = table(spark, sf_dir, "documents")
    clean = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w").rlike("^[a-z]{3,20}$"))
        .distinct()
    )
    noisy = _typo_noisy_vocab(clean)
    matches = fuzzy_token_matches(
        noisy, clean, tau=1, left_col="noisy", right_col="w"
    )
    return (
        matches.groupBy(F.col("tok_a").alias("noisy"))
        .agg(
            F.min("tok_b").alias("canon"),
            F.count("*").cast("int").alias("n_cands"),
        )
        .orderBy("noisy")
    )


# ---------------------------------------------------------------------------
# L5h query face (r13) — exact chunk retrieval, ORACLE-CHECKED end to
# end: the correctness baseline of the maintained RAG lifecycle
# (operators/rag.py) in ONE declared statement — overlapping chunking
# (the L13b boundary arithmetic), feature-hash chunk embeddings (the
# L6+ md5 basis), and exact cosine top-10 against an in-corpus probe
# (the first chunk of doc 0), all spliced into a single DuckDB replay.
# The cosine runs on the INTEGER bucket sums (dot and norms over exact
# BIGINTs, one IEEE division + round at the end — no float-order
# dependence), and chunks sharing no hashed dimension with the query
# still rank (dot coalesces to 0), so the top-10 boundary is exact.
#
# Scale posture: chunking + hashing are map-only; the bucket sums are
# one (chunk, dim)-keyed aggregation; the query vector is a 16-row
# broadcast + a 1-row norm broadcast; the ranking is TakeOrdered.
# The PQ-served production path over the same semantics is
# operators/rag.py (build/extend/audit — pinned by tests); THIS query
# is its exact-arithmetic twin, the same relationship q_ann_ivf_det
# has to the maintained vector lake.
# ---------------------------------------------------------------------------
_RAG_CHUNK = 32
_RAG_STRIDE = 24
_RAG_DIM = 16

_RAG_TOPK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks,
         CAST(unnest(range(
           1 + greatest(0, (greatest(n - {_RAG_CHUNK}, 0) + {_RAG_STRIDE} - 1)
                           // {_RAG_STRIDE})
         )) AS INT) AS chunk_id
  FROM t
),
ex AS (
  SELECT doc_id, chunk_id,
         unnest(list_slice(toks, chunk_id * {_RAG_STRIDE} + 1,
                           chunk_id * {_RAG_STRIDE} + {_RAG_CHUNK})) AS tok
  FROM c
),
h AS (
  SELECT doc_id, chunk_id,
         CAST(('0x' || substr(md5(tok || '#fh'), 1, 8))::BIGINT % {_RAG_DIM}
              AS INT) AS dim,
         CASE WHEN ('0x' || substr(md5(tok || '#sg'), 1, 8))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM ex
),
per AS (
  SELECT doc_id, chunk_id, dim, SUM(s) AS raw
  FROM h GROUP BY doc_id, chunk_id, dim
),
nrm AS (
  SELECT doc_id, chunk_id, sqrt(CAST(SUM(raw * raw) AS DOUBLE)) AS n2
  FROM per GROUP BY doc_id, chunk_id
),
qv AS (
  SELECT dim, raw FROM per WHERE doc_id = 0 AND chunk_id = 0
),
qn AS (
  SELECT n2 AS qn2 FROM nrm WHERE doc_id = 0 AND chunk_id = 0
),
dots AS (
  SELECT p.doc_id, p.chunk_id, SUM(p.raw * q.raw) AS dot
  FROM per p JOIN qv q USING (dim)
  GROUP BY p.doc_id, p.chunk_id
)
SELECT n.doc_id, n.chunk_id,
       ROUND(CASE WHEN n.n2 > 0 AND q.qn2 > 0
                  THEN CAST(COALESCE(d.dot, 0) AS DOUBLE) / (n.n2 * q.qn2)
                  ELSE 0 END, 6) AS score
FROM nrm n
LEFT JOIN dots d USING (doc_id, chunk_id)
CROSS JOIN qn q
ORDER BY score DESC, n.doc_id, n.chunk_id
LIMIT 10
"""


@query("q_rag_chunk_topk", oracle=_RAG_TOPK_ORACLE)
def q_rag_chunk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import chunk_tokens

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_tokens(docs, chunk=_RAG_CHUNK, stride=_RAG_STRIDE)
    ex = chunks.select(
        "doc_id",
        "chunk_id",
        F.explode(F.split("chunk_text", " ")).alias("tok"),
    )
    fh = F.md5(F.concat(F.col("tok"), F.lit("#fh")).cast("binary"))
    sg = F.md5(F.concat(F.col("tok"), F.lit("#sg")).cast("binary"))
    h = ex.select(
        "doc_id",
        "chunk_id",
        (F.conv(F.substring(fh, 1, 8), 16, 10).cast("long") % _RAG_DIM)
        .cast("int")
        .alias("dim"),
        F.when(
            F.conv(F.substring(sg, 1, 8), 16, 10).cast("long") % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    per = h.groupBy("doc_id", "chunk_id", "dim").agg(
        F.sum("s").alias("raw")
    )
    nrm = per.groupBy("doc_id", "chunk_id").agg(
        F.sqrt(F.sum(F.col("raw") * F.col("raw")).cast("double")).alias("n2")
    )
    qv = per.where(
        (F.col("doc_id") == 0) & (F.col("chunk_id") == 0)
    ).select("dim", F.col("raw").alias("qraw"))
    qn = nrm.where(
        (F.col("doc_id") == 0) & (F.col("chunk_id") == 0)
    ).select(F.col("n2").alias("qn2"))
    dots = (
        per.join(F.broadcast(qv), "dim")
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum(F.col("raw") * F.col("qraw")).alias("dot"))
    )
    return (
        nrm.join(dots, ["doc_id", "chunk_id"], "left")
        .crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            "chunk_id",
            F.round(
                F.when(
                    (F.col("n2") > 0) & (F.col("qn2") > 0),
                    F.coalesce(F.col("dot"), F.lit(0)).cast("double")
                    / (F.col("n2") * F.col("qn2")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id", "chunk_id")
        .limit(10)
    )
