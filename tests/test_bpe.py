"""Real-BPE tokenizer: learned merges must behave like BPE (frequent
pairs merge first, counts shrink monotonically with more merges), the
encode must round-trip the word stream, and everything must be
deterministic across runs."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.functions.text import TOKEN_SPLIT_RE
from mtg_bulk_database_spark.operators.bpe import (
    WORD_END,
    bpe_encode,
    bpe_train,
)

SF_DIR = "/root/testdata/sf0.01"


def test_bpe_train_deterministic_and_useful(spark):
    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe_train(docs, n_merges=50)
    assert 0 < len(merges) <= 50
    assert merges == bpe_train(docs, n_merges=50)
    # ranks must be usable: every merge pair is two non-empty strings
    assert all(isinstance(a, str) and a and isinstance(b, str) and b for a, b in merges)


def test_bpe_encode_roundtrip_and_monotone(spark):
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 50)
    merges = bpe_train(docs, n_merges=100)
    enc = bpe_encode(docs, merges).select("doc_id", "text", "bpe_tokens", "n_bpe_tokens")
    rows = enc.collect()
    assert len(rows) == 50
    for r in rows:
        toks = r["bpe_tokens"].split(" ") if r["bpe_tokens"] else []
        assert len(toks) == r["n_bpe_tokens"]
        # concatenating subwords (dropping </w>) reproduces the word stream
        rebuilt = "".join(toks).replace(WORD_END, " ").strip()
        words = " ".join(
            w.lower() for w in re.split(TOKEN_SPLIT_RE, r["text"]) if w
        )
        assert rebuilt == words
    # more merges => never more tokens
    few = bpe_encode(docs, merges[:10], count_col="n_few").select("doc_id", "n_few")
    joined = enc.join(few, "doc_id")
    bad = joined.filter(F.col("n_bpe_tokens") > F.col("n_few")).count()
    assert bad == 0
    # zero merges degenerate to chars+wordend
    zero = bpe_encode(docs, [], count_col="n0").select("doc_id", "text", "n0").collect()
    for r in zero:
        words = [w.lower() for w in re.split(TOKEN_SPLIT_RE, r["text"]) if w]
        assert r["n0"] == sum(len(w) + 1 for w in words)
