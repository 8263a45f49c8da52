"""Text-analysis operators for corpus curation (north-star extension):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure column expressions (codegen'd, UDF-free) with
deterministic integer-derived arithmetic so a SQL oracle can reproduce
every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ENGLISH_STOPWORDS, tokens, ts_tokens

#: regex for the BPE-ish sub-token count: alpha runs, single digits,
#: or single non-alphanumeric-non-space symbols.
BPE_ISH_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"


def _stopword_hits(tok: Column) -> Column:
    return F.size(
        F.filter(tok, lambda t: t.isin(*ENGLISH_STOPWORDS))
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-density language heuristic: English function words are
    high-frequency, so their token share separates English-like text.
    ratio = stopword_tokens / tokens (int/int → engine-stable double);
    predicted_lang = 'en' iff ratio ≥ 0.1.

    (On synthetic corpora the label column is the ground truth to score
    against; on real corpora swap in per-language stopword tables —
    same plan shape, one column per language score.)
    """
    tok = tokens(text_col)
    ratio = F.when(
        F.size(tok) > 0,
        _stopword_hits(tok).cast("double") / F.size(tok),
    ).otherwise(F.lit(0.0))
    return df.withColumn("stopword_ratio", ratio).withColumn(
        "predicted_lang",
        F.when(F.col("stopword_ratio") >= 0.1, F.lit("en")).otherwise(
            F.lit("other")
        ),
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish sub-token count (alpha runs /
    digits / symbols) — the standard pre-tokenization cost estimate."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != F.lit(""))
    )
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), 0)
    )
    return df.withColumn("ws_tokens", ws).withColumn("bpe_ish_tokens", bpe)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score on integer-derived ratios:

    - len_score: min(n_tokens, 100)/100      (too-short penalty)
    - alpha_ratio: alpha chars / chars        (symbol-soup penalty)
    - stop_ratio capped at 0.5, scaled ×2     (natural-language signal)

    score = round((len_score + alpha_ratio + capped_stop)/3, 6)
    """
    tok = tokens(text_col)
    n_tok = F.size(tok)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    len_score = F.least(n_tok, F.lit(100)).cast("double") / 100.0
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    stop_ratio = F.when(
        n_tok > 0, _stopword_hits(tok).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    capped_stop = F.least(stop_ratio, F.lit(0.5)) * 2.0
    score = F.round((len_score + alpha_ratio + capped_stop) / 3.0, 6)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("quality_score", score)
    )


def with_normalized_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text form for training corpora: lowercase, non-[a-z0-9]
    runs collapsed to single spaces, trimmed. Pure columnar (two regexp
    passes inside codegen); emits ``norm_text`` + ``norm_chars``."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.withColumn("norm_text", norm).withColumn(
        "norm_chars", F.length(F.col("norm_text"))
    )


def with_repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals over the token stream — the
    standard "is this document boilerplate/spam" filters:

    - ``unique_token_ratio``: distinct tokens / tokens
    - ``top_token_ratio``:    occurrences of the most frequent token / tokens
    - ``dup_bigram_ratio``:   1 − distinct bigrams / bigrams

    All integer-derived ratios (exact division → oracle-stable). The
    token array is materialized in its OWN projection and each metric
    references the attribute — inlining ``tokens(text)`` into every
    HOF would re-tokenize per reference (the measured 10-30× plan trap
    documented in dedup.py). Per-row cost is O(u·n) for the top-token
    count — bounded by document length, no shuffle.
    """
    t = F.col("_rep_toks")
    with_toks = df.withColumn("_rep_toks", tokens(text_col))
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = with_toks.withColumn("_rep_bigrams", bigrams)
    b = F.col("_rep_bigrams")
    top_count = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda x: F.size(F.filter(t, lambda y: y == x)),
        )
    )
    return (
        staged.withColumn("n_tokens", n)
        .withColumn(
            "unique_token_ratio",
            F.when(n > 0, F.size(F.array_distinct(t)).cast("double") / n).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "top_token_ratio",
            F.when(n > 0, top_count.cast("double") / n).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_bigram_ratio",
            F.when(
                F.size(b) > 0,
                F.lit(1.0)
                - F.size(F.array_distinct(b)).cast("double") / F.size(b),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_rep_toks", "_rep_bigrams")
    )


#: hex prefixes for the deterministic corpus split: md5 first byte
#: < 0xe6 (230/256 ≈ 89.8%) → train, < 0xf3 (+5.1%) → val, rest → test.
TRAIN_SPLIT_BOUNDS = ("e6", "f3")


def with_train_split(
    df: DataFrame,
    text_col: str = "text",
    bounds: tuple[str, str] = TRAIN_SPLIT_BOUNDS,
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash — the
    split every sample lands in is a pure function of its text, stable
    across runs, partitions, and engines (md5 is engine-portable, unlike
    xxhash64/hash whose seeds differ between Spark and other systems).
    Emits ``split_bucket`` (first md5 byte as hex) + ``split``."""
    bucket = F.substring(F.md5(F.col(text_col)), 1, 2)
    train_b, val_b = bounds
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_b, F.lit("train"))
        .when(F.col("split_bucket") < val_b, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct non-stopword token set — a canonical-form hash that
    catches shuffled/reordered copies exact dedup misses."""
    canon = F.concat_ws(" ", F.array_sort(ts_tokens(text_col)))
    return df.withColumn("fingerprint", F.md5(canon))


# --- DuckDB-SQL twins (shared with pipeline_queries) ----------------------


def sql_stopword_hits(toks_expr: str) -> str:
    from ..functions.text import sql_stopword_array

    return (
        f"len(list_filter({toks_expr},"
        f" x -> list_contains({sql_stopword_array()}, x)))"
    )
