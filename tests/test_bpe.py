"""BPE tokenizer training/encoding tests — operators/bpe.py (r4).

Golden strategy: an independent dict-based reference implementation of
Sennrich-2016 BPE lives in this file; the Spark-backed trainer must
produce the identical merge sequence on the classic low/lower/newest/
widest corpus and on corpus text.  Encoding must reconstruct the word
(lossless concatenation) and match the trainer's final symbol state.
"""

from __future__ import annotations

import pytest

from pyspec_spark.operators.bpe import (
    END,
    bpe_encode,
    encode_word,
    train_bpe,
    word_counts,
)


def _ref_train(word_cnt: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Independent reference: straight transcription of the published
    algorithm (Sennrich et al. 2016, Figure 1) with the same
    deterministic tiebreak."""
    vocab = {}
    for w, c in word_cnt.items():
        syms = tuple(w) + (END,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


CLASSIC = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_matches_reference_on_classic_corpus(spark):
    text = " ".join(w for w, c in CLASSIC.items() for _ in range(c))
    df = spark.createDataFrame([(text,)], "text string")
    got = train_bpe(word_counts(df), n_merges=10)
    assert got == _ref_train(CLASSIC, 10)
    # the famous first merges: ('e','s') count 9, then ('es','t') 9
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")


def test_train_matches_reference_on_corpus_text(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc_rows = word_counts(docs.limit(50)).collect()
    ref = _ref_train({r["word"]: r["cnt"] for r in wc_rows}, 25)
    got = train_bpe(word_counts(docs.limit(50)), n_merges=25)
    assert got == ref


def test_encode_word_lossless_and_greedy():
    merges = [("e", "s"), ("es", "t"), ("est", END), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + END]
    assert encode_word("low", ranks) == ["low", END]
    # unknown word falls back to chars + END, still lossless
    toks = encode_word("xyz", ranks)
    assert "".join(toks) == "xyz" + END


def test_bpe_encode_distributed_matches_local(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    merges = train_bpe(word_counts(docs), n_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe_encode(docs, merges).select("doc_id", "text", "bpe_tokens").collect()
    assert len(out) == 30
    for r in out:
        local = [t for w in r["text"].split() for t in encode_word(w, ranks)]
        assert r["bpe_tokens"] == local
        # lossless: stripping END markers reconstructs the text's words
        rebuilt = "".join(r["bpe_tokens"]).replace(END, " ").split()
        assert rebuilt == r["text"].split()


def test_train_respects_max_vocab_cap(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # cap of 5 words: training sees only the top-5 by (cnt desc, word)
    wc = word_counts(docs)
    top5 = {
        r["word"]: r["cnt"]
        for r in wc.orderBy(wc["cnt"].desc(), "word").limit(5).collect()
    }
    got = train_bpe(wc, n_merges=5, max_vocab_words=5)
    assert got == _ref_train(top5, 5)


def test_merges_exhausted_stops_early():
    merges = _ref_train({"ab": 1}, 100)
    # 'a','b','</w>' can only merge twice
    assert len(merges) == 2
    assert merges == _train_via_operator_local({"ab": 1})


def _train_via_operator_local(word_cnt):
    """train_bpe's local loop on a dict (bypassing Spark) via its own
    helpers, to pin the two implementations together at the unit level."""
    from pyspec_spark.operators.bpe import _apply_merge, _pair_counts

    vocab = {}
    for w, c in word_cnt.items():
        syms = tuple(w) + (END,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(100):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_apply_merge(s, best): c for s, c in vocab.items()}
    return merges
