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


def test_frozen_fold_agrees_with_iterative_encoder(spark):
    """r8: q234's fixed-order single-pass fold vs the iterative
    best-rank encoder (`_encode_word`), over the sf0.01 vocabulary
    with the SAME frozen 24-merge table.  The two differ only on
    words where applying a later rule re-enables an earlier one —
    rare by construction on a rank-ordered table — so agreement must
    be near-total, and BOTH must reconstruct every word exactly
    (losslessness holds regardless of merge order)."""
    from pyspark.sql import functions as F

    from mtg_bulk_database_spark.catalog import load_table
    from mtg_bulk_database_spark.functions.text import tokens
    from mtg_bulk_database_spark.operators.bpe import WORD_END, _encode_word
    from mtg_bulk_database_spark.pipeline_queries12 import (
        _Q234_MERGES,
        _q234_merge_chain,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    chain = _q234_merge_chain(
        "concat(' ', regexp_replace(word, '(.)', '$1 '), '</w> ')"
    )
    vocab = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .distinct()
        .selectExpr("word", f"trim({chain}) AS folded")
        .collect()
    )
    assert len(vocab) > 10
    ranks = {pair: i for i, pair in enumerate(_Q234_MERGES)}
    memo: dict[str, tuple[str, ...]] = {}
    agree = 0
    for r in vocab:
        fold = tuple(r["folded"].split(" "))
        iterative = _encode_word(r["word"], ranks, memo)
        # losslessness: both reconstruct the word
        assert "".join(fold).replace(WORD_END, "") == r["word"]
        assert "".join(iterative).replace(WORD_END, "") == r["word"]
        if fold == iterative:
            agree += 1
    assert agree / len(vocab) >= 0.9, (agree, len(vocab))
