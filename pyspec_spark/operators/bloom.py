"""Deterministic Bloom filter as a DataFrame aggregate (SURVEY.md §2.12
L14 — benchmark-decontamination membership at corpus scale).

Reference loci: none in `stuwilkins/pyspec` (north-star surface).  The
construction is the textbook Bloom filter (Bloom 1970, CACM 13(7)) with
the double-hash family replaced by k independent md5-derived positions —
md5 produces identical hex on Spark and DuckDB, so the ENTIRE filter
(bit-for-bit) and every probe replay exactly in the oracle engine.

Why this exists next to the exact broadcast semi-join (q_decontaminate):
the exact path broadcasts the full benchmark shingle SET, whose size
grows with the benchmark corpus.  The Bloom path broadcasts a
CONSTANT-SIZE bitmap (``bits/8`` bytes regardless of benchmark size) at
the cost of a bounded, computable false-positive rate
``(1 - e^(-k*n/m))^k``.  False negatives are impossible — tested.

Physical shape (the 100 TB posture):
- build: explode (k rows per value) -> one ``bit_or`` aggregation whose
  state is bounded by ``bits/32`` rows regardless of input size, then
  densified against a ``sequence()`` word lattice into ONE row holding
  the whole filter as an ``array<long>``.
- probe: a single ``crossJoin(broadcast(one_row_filter))`` + map-side
  ``element_at``/bitmask expressions — no join, no shuffle, and the
  filter subtree is built exactly once (a k-way join formulation would
  re-plan the build k times).

Word layout: 32 bits used per 64-bit word.  32, not 64: DuckDB's strict
BIGINT overflow rejects ``1 << 63`` and Spark would yield the sign bit,
so the portable word is the low half.  Masks are therefore always
positive and ``&``-compatible in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 8192
BLOOM_K = 3


def bloom_position(col: Column, i: int, bits: int) -> Column:
    """Position of hash ``i`` for a value: first 8 md5 hex chars of
    ``value || '#b' || i`` as an integer, mod ``bits``.  Mirrors the SQL
    ``('0x' || substr(md5(v || '#b' || i), 1, 8))::BIGINT % bits``."""
    h = F.md5(F.concat(col, F.lit(f"#b{i}")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % bits


def _bloom_position_sql(expr: str, i: int, bits: int) -> str:
    """The parsed-SQL face of :func:`bloom_position` — same operators,
    same values, one py4j round-trip however many positions (r13
    plan-construction note in queries/curation._replicate_copies)."""
    return (
        f"CAST(conv(substring(md5(CAST({expr} || '#b{i}' AS BINARY)),"
        f" 1, 8), 16, 10) AS BIGINT) % {bits}"
    )


def bloom_build(
    values: DataFrame,
    col: str = "shingle",
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Aggregate a value column into sparse Bloom words
    ``(word_idx long, bits long)`` — at most ``bits/32`` rows."""
    positions = ", ".join(
        _bloom_position_sql(col, i, bits) for i in range(k)
    )
    return (
        values.selectExpr(f"explode(array({positions})) AS pos")
        .selectExpr(
            "CAST(pos / 32 AS BIGINT) AS word_idx",
            "shiftleft(1L, CAST(pos % 32 AS INT)) AS mask",
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_to_array(bloom: DataFrame, bits: int = BLOOM_BITS) -> DataFrame:
    """Densify sparse words into ONE row ``(words array<long>)`` of
    length ``bits/32`` (index = word_idx, unset words = 0), ready to
    broadcast.  The lattice comes from ``sequence()`` — no driver data.
    """
    n_words = bits // 32
    # r13 (second pass): lattice + densify as parsed SQL (1:1
    # transliteration of the former Column chain)
    lattice = (
        bloom.sparkSession.range(1)
        .selectExpr(f"explode(sequence(0, {n_words - 1})) AS w")
        .selectExpr("CAST(w AS BIGINT) AS word_idx")
    )
    return (
        lattice.join(F.broadcast(bloom), "word_idx", "left")
        .selectExpr("word_idx", "coalesce(bits, 0) AS bits")
        .agg(
            F.expr(
                "transform(sort_array(collect_list("
                "struct(word_idx, bits))), s -> s.bits)"
            ).alias("words")
        )
    )


def bloom_contains(
    words: Column,
    value: Column,
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> Column:
    """True iff all k positions of ``value`` are set in the densified
    ``words`` array.  Pure Column arithmetic — `value` may be a lambda
    variable, so membership tests run INSIDE higher-order functions
    (``filter(shingles, s -> bloom_contains(words, s))``), which keeps
    a per-document containment computation map-only: no explode, no
    re-aggregation shuffle.  Trade-off (measured, sf0.1): HOF lambdas
    evaluate on Catalyst's interpreted path, so the in-lambda hash
    chain ran 1285 ms vs 122 ms for the explode+codegen probe — use
    the lambda form where statelessness matters (streaming append
    mode), the explode form for batch throughput (q_bloom_decontam).
    The mask is ``pow(2.0, bit)`` — exact for
    bit <= 31 and usable where ``shiftleft`` (literal-only shift in the
    Python API) is not; 2^31 fits the positive BIGINT range."""
    hit = F.lit(True)
    for i in range(k):
        p = bloom_position(value, i, bits)
        word = F.element_at(words, ((p / 32).cast("long") + 1).cast("int"))
        mask = F.pow(F.lit(2.0), (p % 32).cast("double")).cast("long")
        hit = hit & (word.bitwiseAND(mask) != 0)
    return hit


def bloom_probe(
    df: DataFrame,
    bloom_arr: DataFrame,
    col: str = "shingle",
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    out: str = "is_hit",
) -> DataFrame:
    """Add boolean ``out``: all k positions of ``col`` set in the
    densified filter (``bloom_to_array`` output).  One broadcast cross
    join of the single filter row; everything else is map-side."""
    # r13: the k-position containment test as one parsed-SQL expression
    # (the Column face above stays for HOF-lambda callers).  true AND
    # (...) mirrors the Column fold's F.lit(True) seed exactly; the
    # pow(2.0, bit) mask matches bloom_contains.
    terms = []
    for i in range(k):
        p = f"({_bloom_position_sql(col, i, bits)})"
        word = f"element_at(words, CAST(CAST({p} / 32 AS BIGINT) + 1 AS INT))"
        mask = f"CAST(pow(2.0D, CAST({p} % 32 AS DOUBLE)) AS BIGINT)"
        terms.append(f"(({word} & {mask}) != 0)")
    probed = df.crossJoin(F.broadcast(bloom_arr))
    return probed.selectExpr(
        *df.columns,
        f"(true AND {' AND '.join(terms)}) AS {out}",
    )
