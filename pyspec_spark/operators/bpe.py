"""Byte-pair-encoding tokenizer training + application — SURVEY §2.12
L3 extension (r4), modeled on the published algorithm (Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016 — the BPE used by GPT-2/RoBERTa-class tokenizers).

Division of labor (the same split production tokenizer trainers use):
- The CORPUS-sized work — reducing raw text to a (word, count) table —
  is a distributed map + one aggregation.  At 100 TB this is the only
  step that touches every byte.
- Merge training operates on the aggregated vocabulary table, which is
  orders of magnitude smaller than the corpus (Heaps' law); it is a
  bounded, documented driver-side loop over at most ``max_vocab_words``
  rows, the same bounded-model policy as the IVF centroid trainer
  (operators/similarity.py).  Real-world BPE training (GPT-2's own)
  runs exactly this way: count distributed, merge locally.
- ENCODING with the trained merges is distributed again: the merge
  rank table broadcasts inside an Arrow-batched pandas function
  (vocab-sized, a few MB for 50k merges).

Determinism: word counts tiebreak lexicographically, pair counts
tiebreak on (left, right); training is a pure function of the corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (Sennrich et al. §3.2)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt): the one corpus-sized aggregation."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + cnt
    return counts


def _apply_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge every non-overlapping occurrence of pair, left to right."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    wc: DataFrame,
    n_merges: int,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) table.

    Collects at most ``max_vocab_words`` rows (top by count, word
    tiebreak) — the bounded driver-side model materialization this
    module's docstring justifies.  Returns merges in training order;
    their position IS the merge rank used by :func:`bpe_encode`.
    """
    rows = (
        wc.orderBy(F.desc("cnt"), "word").limit(max_vocab_words).collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["word"]) + (END,)
        vocab[syms] = vocab.get(syms, 0) + int(r["cnt"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic argmax: count desc, then (left, right) asc
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _apply_merge(syms, best): cnt for syms, cnt in vocab.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly merge the lowest-rank adjacent
    pair (the standard GPT-2-style inference loop)."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + (syms[i] + syms[i + 1],) + syms[i + 2 :]
    return list(syms)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with the trained merges, distributed via
    mapInPandas; the rank table rides in the closure (broadcast with
    the serialized function — vocab-sized, not corpus-sized)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(StringType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = [
                [
                    t
                    for w in str(txt).split()
                    for t in encode_word(w, ranks)
                ]
                for txt in pdf[text_col]
            ]
            out = pdf.copy()
            out[out_col] = toks
            yield out

    return df.mapInPandas(run, schema)
