#!/usr/bin/env python
"""Scaling probe for the r13 exact fuzzy edit-distance join (L2g).

The claim under test: the SymSpell deletion-neighborhood band turns
an O(V^2) all-pairs levenshtein into a map-side bounded explode plus
ONE variant-keyed equi-join — linear in vocabulary size — while
remaining EXACT (recall guaranteed by the banding theorem, precision
by the built-in levenshtein verify).

Vocabulary: V deterministic Knuth-hash tokens (length 8, alphabet
a..z — incompressible, near-zero accidental collisions); every 100th
token plants a one-substitution twin, so the true pair count is a
known ~V/100 at every scale and both arms must find exactly it.

Arms:
- **banded** (the shipped operator, fuzzy_token_matches tau=1): runs
  at every scale; expectation LINEAR wall vs V.
- **allpairs** (crossJoin + length band + levenshtein): the naive
  formulation; run only at the two smallest scales — its wall grows
  ~quadratically and extrapolates to hours where the banded arm takes
  seconds.  Both arms assert the same pair count (exactness).

    python tools/scale_probe_r13c.py [V ...]    # default 8k 16k 200k 800k
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspec_spark.operators.dedup import fuzzy_token_matches  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402

TOKLEN = 8
ALLPAIRS_MAX = 16_000


def _vocab(spark, v: int):
    """v deterministic tokens + a planted one-substitution twin per
    100 ids (twin flips position id%8 to a different letter).  Letters
    come from per-position xxhash64 draws — genuinely independent per
    (id, position), unlike a shared-linear-hash double-mod, which
    aliases (e.g. 57k ≡ −572 ≡ 0 mod 26 collapses a 100003-modulus
    construction to a few hundred distinct tokens)."""

    def _letter(idx):
        return F.substring(
            F.lit("abcdefghijklmnopqrstuvwxyz"),
            F.pmod(F.xxhash64(F.col("id"), idx), F.lit(26)).cast("int")
            + F.lit(1),
            F.lit(1),
        )

    base = spark.range(v).select(
        F.col("id"),
        F.concat(*[_letter(F.lit(j)) for j in range(TOKLEN)]).alias(
            "token"
        ),
    )
    pos = (F.col("id") % TOKLEN).cast("int")
    # replacement letter: shift the original at `pos` by 13 (never equal)
    orig_idx = F.pmod(F.xxhash64(F.col("id"), pos), F.lit(26)).cast("int")
    repl = F.substring(
        F.lit("abcdefghijklmnopqrstuvwxyz"),
        ((orig_idx + 13) % 26) + F.lit(1),
        F.lit(1),
    )
    twins = base.where(F.col("id") % 100 == 0).select(
        F.concat(
            F.substring("token", F.lit(1), pos),
            repl,
            F.substring("token", pos + F.lit(2), F.lit(TOKLEN)),
        ).alias("token")
    )
    return base.select("token").unionAll(twins).distinct()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8_000, 16_000, 200_000, 800_000]
    spark = get_spark("scale_probe_r13c", shuffle_partitions=32)
    print("| V | arm | pairs | wall |")
    print("|---|-----|-------|------|")
    for v in sizes:
        vocab = _vocab(spark, v).persist()
        nv = vocab.count()

        t0 = time.time()
        banded = (
            fuzzy_token_matches(vocab, vocab, tau=1)
            .where(F.col("tok_a") < F.col("tok_b"))
            .count()
        )
        wall_b = time.time() - t0
        print(
            f"| {nv} | banded | {banded} | {wall_b:.2f} s |", flush=True
        )

        if v <= ALLPAIRS_MAX:
            t0 = time.time()
            a = vocab.select(F.col("token").alias("tok_a"))
            b = vocab.select(F.col("token").alias("tok_b"))
            allp = (
                a.crossJoin(b)
                .where(F.col("tok_a") < F.col("tok_b"))
                .where(
                    F.abs(F.length("tok_a") - F.length("tok_b")) <= 1
                )
                .where(F.levenshtein("tok_a", "tok_b") <= 1)
                .count()
            )
            wall_a = time.time() - t0
            assert allp == banded, (allp, banded)
            print(
                f"| {nv} | allpairs | {allp} | {wall_a:.2f} s |",
                flush=True,
            )
        vocab.unpersist()


if __name__ == "__main__":
    main()
