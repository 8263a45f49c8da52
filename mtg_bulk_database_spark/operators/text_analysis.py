"""Text-analysis operators for corpus curation (north-star extension):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure column expressions (codegen'd, UDF-free) with
deterministic integer-derived arithmetic so a SQL oracle can reproduce
every value bit-for-bit.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves type hints here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    ASCII_LOWER,
    ASCII_UPPER,
    ENGLISH_STOPWORDS,
    tokens,
    ts_tokens,
)

#: regex for the BPE-ish sub-token count: alpha runs, single digits,
#: or single non-alphanumeric-non-space symbols.
# ASCII-case-insensitive classes over the RAW text (no lower() first):
# locale-sensitive case mappings (İ) change the extracted-run count
# between engines when lowering precedes extraction — see
# functions/text.py on the tokenizer family's split-before-lower order.
#
# Explicit whitespace ENUMERATION, never the engine-defined ``\s``
# (r5, probed): Java's ``\s`` is ``[ \t\n\x0B\f\r]`` but RE2's is
# ``[ \t\n\f\r]`` — a vertical tab forks the whitespace-token count
# between Spark and DuckDB (and Python's is Unicode-wide, a third
# answer). The enumerated class is the tokenizer family's
# by-construction portability applied to whitespace.
WS_CLASS = " \\t\\n\\x0B\\f\\r"
WS_SPLIT_RE = f"[{WS_CLASS}]+"
BPE_ISH_RE = f"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9{WS_CLASS}]"


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
    # hoisted token array (r11b): see with_gopher_quality — inlined,
    # the tokenizer evaluated 3× per row after project collapse.
    tok_attr = f"_ta_ltok_{text_col}"
    df = df.withColumn(tok_attr, tokens(text_col))
    tok = F.col(tok_attr)
    ratio = F.when(
        F.size(tok) > 0,
        _stopword_hits(tok).cast("double") / F.size(tok),
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("stopword_ratio", ratio)
        .withColumn(
            "predicted_lang",
            F.when(F.col("stopword_ratio") >= 0.1, F.lit("en")).otherwise(
                F.lit("other")
            ),
        )
        .drop(tok_attr)
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish sub-token count (alpha runs /
    digits / symbols) — the standard pre-tokenization cost estimate."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), WS_SPLIT_RE), lambda t: t != F.lit(""))
    )
    bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)
    )
    return df.withColumn("ws_tokens", ws).withColumn("bpe_ish_tokens", bpe)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score on integer-derived ratios:

    - len_score: min(n_tokens, 100)/100      (too-short penalty)
    - alpha_ratio: alpha chars / chars        (symbol-soup penalty)
    - stop_ratio capped at 0.5, scaled ×2     (natural-language signal)

    score = round((len_score + alpha_ratio + capped_stop)/3, 6)
    """
    # hoisted token array (r11b): see with_gopher_quality — the score
    # tree referenced ``tokens(text)`` ~4× inline per row; the named
    # column keeps one evaluation under CollapseProject.
    tok_attr = f"_ta_qtok_{text_col}"
    df = df.withColumn(tok_attr, tokens(text_col))
    tok = F.col(tok_attr)
    n_tok = F.size(tok)
    n_chars = F.length(F.col(text_col))
    # alpha count = ASCII-alpha chars of the RAW text: `translate` is a
    # 52-entry table walk per char vs the regex engine running a class
    # per char — measured 1.48 s → 0.32 s on the sf0.1 document scan
    # (r4 profile; oracle keeps the regexp form).  No lower() pass at
    # all (r5): counting [a-z] of the LOWERCASED text would hinge on
    # every engine's locale-sensitive case mapping emitting the same
    # number of ASCII letters — counting [a-zA-Z] of the raw text is
    # locale-free by construction (functions/text.py) and drops a
    # whole string materialization from the hot scan.
    txt = F.col(text_col)
    n_alpha = F.length(txt) - F.length(
        F.translate(
            txt, "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ", ""
        )
    )
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
        .drop(tok_attr)
    )


def with_normalized_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text form for training corpora: non-ASCII-alnum runs
    collapsed to single spaces, trimmed, THEN lowercased — replace
    before lower so only pure-ASCII letters reach the case mapping
    (the tokenizer family's locale-free order, functions/text.py).
    Pure columnar (two regexp passes inside codegen); emits
    ``norm_text`` + ``norm_chars``."""
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]", " "),
                " +",
                " ",
            )
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
    # top-token frequency = longest equal run of the SORTED tokens: an
    # O(n log n) sort + O(n) fold, replacing the r3 O(unique·n) nested
    # HOF (count each distinct token against the full array) — measured
    # 0.75 s → 0.46 s on the sf0.1 document scan, identical values
    _run = lambda acc, x: F.when(  # noqa: E731 — local fold step
        x == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1))
    top_count = F.aggregate(
        F.array_sort(t),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            _run(acc, x).alias("run"),
            F.greatest(acc["best"], _run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
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


def with_leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    bounds: tuple[str, str] = TRAIN_SPLIT_BOUNDS,
) -> DataFrame:
    """Train/val/test assignment keyed on the CONTENT FINGERPRINT
    (md5 of the sorted token set) instead of the raw text: exact and
    reordered/shuffled copies share a fingerprint, so they land in the
    SAME split — closing the eval-leakage hole a per-document split
    leaves open (a test document's near-copy in train inflates eval).
    For transitive near-dup groups, run the same assignment on
    ``graph.connected_components``' ``dup_group`` label instead — the
    seam is the split key, the bucketing is identical. Pure columnar.
    """
    fp = with_fingerprint(df, text_col)
    bucket = F.substring(F.md5(F.col("fingerprint")), 1, 2)
    train_b, val_b = bounds
    return fp.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_b, F.lit("train"))
        .when(F.col("split_bucket") < val_b, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split every document into overlapping token windows — the
    context-window preparation step of a training pipeline (one training
    sample per chunk). Emits one row per chunk:
    (id, chunk_idx, chunk_text, n_chunk_tokens).

    Stride = chunk_tokens − overlap; windows start at 0, stride, 2·stride
    … while the start is inside the document, so every token lands in at
    least one chunk and the tail chunk may be short (standard sliding-
    window semantics). Zero-token documents produce no chunks.

    Scale shape: tokenize → per-row window expansion (sequence +
    transform + slice, all codegen'd) → posexplode. No shuffle at all —
    chunking is embarrassingly parallel and the output inherits the
    input's partitioning; the fan-out factor is ~n_tokens/stride per
    doc, visible to AQE for downstream re-coalescing.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    t = F.col("_chunk_toks")
    n = F.size(t)
    staged = df.select(F.col(id_col), tokens(text_col).alias("_chunk_toks")).filter(
        n > 0
    )
    windows = F.transform(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: F.slice(t, s + 1, chunk_tokens),
    )
    # posexplode_OUTER + output-side null filter: plain posexplode lets
    # InferFiltersFromGenerate push a `size(windows)>0` filter that
    # re-inlines (and re-evaluates) the whole window expression per row
    # — the measured 10-30× plan trap documented in dedup.py
    exploded = staged.select(
        F.col(id_col), F.posexplode_outer(windows).alias("chunk_idx", "_chunk")
    ).filter(F.col("_chunk").isNotNull())
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
        F.size("_chunk").alias("n_chunk_tokens"),
    )


#: redaction passes, applied in order; counts are computed on the text
#: as it stood BEFORE that pass (so an email's digits never double-count
#: as a phone). Patterns stay inside the Java-regex ∩ RE2 common subset
#: so the DuckDB oracle runs them verbatim.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"),
)


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII scrubbing (emails, IPv4s, phone-shaped numbers) — the
    compliance pass a training corpus runs before anything else. Emits
    ``redacted_text`` + one ``n_<kind>`` count per pattern.

    Pure columnar: k regexp passes inside one codegen stage, no UDF, no
    shuffle. Pattern list is deliberately conservative/auditable — at
    production scale swap in a vetted pattern pack (same plan shape,
    more passes) or an NER model via mapInPandas for the fuzzy classes.
    """
    out = df
    cur: Column = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn("redacted_text", cur)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct non-stopword token set — a canonical-form hash that
    catches shuffled/reordered copies exact dedup misses."""
    canon = F.concat_ws(" ", F.array_sort(ts_tokens(text_col)))
    return df.withColumn("fingerprint", F.md5(canon))


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every char ``k``-gram of the normalized text,
    then keep the minimum hash of each sliding ``window`` — guarantees
    any shared substring of length ≥ k+window−1 contributes at least one
    common fingerprint, at ~1/window the storage of full k-gram sets.
    Emits ``winnow_fps``: the sorted distinct fingerprint set.

    The "rolling hash" here is an md5 prefix per k-gram rather than a
    Rabin-Karp recurrence: Spark evaluates the k-grams as one columnar
    HOF pass where sharing state between positions isn't expressible —
    and an 8-hex-char prefix keeps the min-in-window comparison a plain
    lexicographic string min that any SQL engine reproduces exactly.

    Three chained projections (base string → hash array → window mins),
    each column materialized as an attribute before the next references
    it — the inline-expression re-evaluation guard documented in
    dedup.py. No shuffle; fingerprints are ready to explode into the
    posting-list join that powers substring-level dup mining.
    """
    # strip-before-lower: only pure-ASCII chars reach the case mapping
    # (the tokenizer family's locale-free order, functions/text.py)
    base = F.lower(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", ""))
    staged = df.withColumn("_wf_base", base)
    b = F.col("_wf_base")
    n_grams = F.length(b) - (k - 1)
    hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.substring(F.md5(F.substring(b, i, k)), 1, 8),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.withColumn("_wf_hashes", hashes)
    h = F.col("_wf_hashes")
    n_windows = F.size(h) - (window - 1)
    fps = (
        F.when(F.size(h) == 0, F.array().cast("array<string>"))
        .when(F.size(h) < window, F.array(F.array_min(h)))
        .otherwise(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), n_windows),
                        lambda j: F.array_min(F.slice(h, j, window)),
                    )
                )
            )
        )
    )
    return staged.withColumn("winnow_fps", fps).drop("_wf_base", "_wf_hashes")


#: Gopher rule thresholds (Rae et al. 2021 appendix A1.1, adapted to
#: this engine's tokenizer) — shared with the q106 SQL twin.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 10, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 2.0, 10.0
GOPHER_MIN_ALPHA, GOPHER_MIN_STOP = 0.6, 0.05


def with_gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style heuristic quality rules: word-count bounds,
    mean-word-length band, alpha-word fraction, stopword fraction, and
    the conjunctive ``passes`` gate. Each metric is an exact integer
    count with one final double division, so a SQL oracle reproduces
    every value bit-for-bit. Pure columnar — one tokenize, a handful of
    higher-order-function passes, zero shuffle; at 100 TB this is a
    map-only stage that fuses into whatever scan precedes it.
    """
    # EVALUATE-ONCE LAYOUT (r11b, guide §4.1 + the q223 discipline):
    # the previous form inlined ``tokens(text)`` into every output
    # column — after project collapse the fused scan evaluated the
    # regexp tokenizer ~10× per row (and every downstream consumer of
    # these columns, e.g. the q210/q213/q229 classifier logit, inlined
    # still more copies), with the interpreted ``aggregate``/``filter``
    # HOFs on top.  Hoisting the token array into a named projection
    # column makes CollapseProject keep ONE evaluation (non-cheap,
    # multi-referenced), and the two HOF passes become codegen'd
    # single-pass char counts:
    #   · tot_len: Σ len(token) ≡ count of [a-zA-Z0-9] chars of the
    #     RAW text (tokens are exactly the alnum runs, lowercased —
    #     a 62-entry ``translate`` table walk, the with_quality_score
    #     r4 trick);
    #   · alpha_words: tokens containing ≥1 letter ≡ matches of ONE
    #     codegen'd regexp over the folded text ([0-9]*[a-z][a-z0-9]*
    #     consumes exactly the letter-bearing alnum runs — maximal
    #     runs, so no match crosses a separator and greedy matching
    #     takes each qualifying run in one piece).
    # Integer counts → identical values; oracle hashes unchanged
    # (pinned by the q106/q210/q213 gates + oracle fuzz).
    tok_attr = f"_ta_tok_{text_col}"
    staged = df.withColumn(tok_attr, tokens(text_col))
    tok = F.col(tok_attr)
    n_words = F.size(tok)
    txt = F.col(text_col)
    tot_len = F.length(txt) - F.length(
        F.translate(
            txt,
            "abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
            "",
        )
    )
    alpha_words = F.size(
        F.regexp_extract_all(
            F.translate(txt, ASCII_UPPER, ASCII_LOWER),
            F.lit("[0-9]*[a-z][a-z0-9]*"),
            0,
        )
    )
    stop_words = _stopword_hits(tok)

    def _frac(num: Column) -> Column:
        return F.when(
            n_words > 0, num.cast("double") / n_words
        ).otherwise(F.lit(0.0))

    mean_word_len = _frac(tot_len)
    alpha_frac = _frac(alpha_words)
    stop_frac = _frac(stop_words)
    passes = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_word_len.between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
        & (alpha_frac >= GOPHER_MIN_ALPHA)
        & (stop_frac >= GOPHER_MIN_STOP)
    )
    return (
        staged.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("alpha_frac", alpha_frac)
        .withColumn("stop_frac", stop_frac)
        .withColumn("passes", passes)
        .drop(tok_attr)
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Statistical-LM fluency scoring (the CCNet/KenLM quality signal,
    reduced to a corpus-trained bigram model with add-one smoothing):
    per document, the sum and mean of ``ln P(w_i | w_{i-1})`` where
    ``P(w2|w1) = (C(w1 w2) + 1) / (C(w1) + |V|)``. Low (very negative)
    mean log-prob ≈ disfluent/gibberish text — the perplexity-bucket
    filter web-scale pipelines run after the cheap heuristic gates.

    Engine-exactness: each term is truncated to integer MICRO-nats via
    ``floor(ln(p) · 1e6)`` — floor is exact on IEEE doubles in every
    engine (unlike round(), whose half-up implementations differ), so
    the per-document sum is an order-independent BIGINT sum and the two
    final double divisions are single identical operations on identical
    inputs.

    Scale shape: the model IS two aggregate tables (unigram counts,
    bigram counts) — never collected, never a driver artifact. Training
    and scoring share one tokenize. The posting→count joins shuffle on
    the token/bigram (Zipf-skewed head keys are the AQE skew-join
    case), and the vocab size is a 1-row broadcast. At 100 TB the
    counts tables are corpus-level ingest artifacts, rebuilt
    incrementally with the matview machinery rather than per query.

    ``train_df`` selects the training corpus (the CCNet setup scores a
    crawl against a reference-corpus LM); default is self-training on
    ``df``. Bigrams/unigrams unseen in training back off to the add-one
    floor — ``(0+1)/(0+|V|)`` — via left joins, so cross-corpus scoring
    is total.

    Returns one row per input row: ``id_col, n_bigrams,
    sum_logprob, avg_logprob`` (documents with < 2 tokens score 0).
    """

    def _bigrams(frame: DataFrame, cols: list[str]) -> DataFrame:
        # staged projections + explode_OUTER with an output-side null
        # filter: plain explode of the inline when/transform lets
        # InferFiltersFromGenerate push a size()>0 filter that
        # re-inlines and re-evaluates the whole O(n) bigram build —
        # the plan trap documented in dedup.py / chunk_documents
        staged = frame.select(*cols, tokens(text_col).alias("_l"))
        bg_arr = F.when(
            F.size("_l") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("_l") - 2),
                lambda i: F.concat(
                    F.get("_l", i), F.lit(" "), F.get("_l", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        staged = staged.select(*cols, bg_arr.alias("_bg_arr"))
        return staged.select(
            *cols, F.explode_outer("_bg_arr").alias("bg")
        ).filter(F.col("bg").isNotNull())

    train = train_df if train_df is not None else df
    uni = train.select(F.explode(tokens(text_col)).alias("t"))
    unic = uni.groupBy("t").agg(F.count("*").alias("c1"))
    vocab = uni.agg(F.count_distinct("t").alias("vocab"))
    bgc = _bigrams(train, []).groupBy("bg").agg(F.count("*").alias("c2"))

    bg = _bigrams(df, [id_col])
    terms = (
        bg.join(bgc, "bg", "left")
        .withColumn("_w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(
            unic.withColumnRenamed("t", "_w1"), "_w1", "left"
        )
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "term_micro",
            F.floor(
                F.log(
                    (F.coalesce("c2", F.lit(0)) + F.lit(1.0))
                    / (F.coalesce("c1", F.lit(0)) + F.col("vocab"))
                )
                * F.lit(1000000.0)
            ),
        )
    )
    scored = terms.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("term_micro").alias("_sum_micro"),
    )
    sum_lp = F.col("_sum_micro").cast("double") / F.lit(1000000.0)
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce(sum_lp, F.lit(0.0)).alias("sum_logprob"),
            F.when(F.col("n_bigrams") > 0, sum_lp / F.col("n_bigrams"))
            .otherwise(F.lit(0.0))
            .alias("avg_logprob"),
        )
    )


def remove_repeated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """The REMOVAL half of repeated-passage detection (q99 finds the
    passages; this rewrites the corpus without them — the CCNet
    paragraph-dedup pass): split each document into NON-overlapping
    ``chunk_tokens`` windows, drop every chunk whose text occurs in
    ≥ ``min_docs`` distinct documents, and reassemble the survivors in
    original order. Non-overlapping windows make removal well-defined
    (no token belongs to two chunks).

    Scale shape: the chunker is zero-shuffle; the boilerplate list is
    one groupBy on the chunk (hash chunks to int64 at 100 TB), and the
    reassembly is one groupBy back on the document id. The removal
    list is usually tiny → broadcast into the marking join.

    Returns one row per input row: ``id_col, clean_text,
    n_kept_chunks, n_removed_chunks`` (empty documents yield '' / 0/0).
    """
    chunks = chunk_documents(
        df, text_col, id_col, chunk_tokens=chunk_tokens, overlap=0
    )
    bad = (
        chunks.groupBy("chunk_text")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("chunk_text", F.lit(1).alias("_bad"))
    )
    marked = chunks.join(F.broadcast(bad), "chunk_text", "left")
    kept_struct = F.when(
        F.col("_bad").isNull(), F.struct("chunk_idx", "chunk_text")
    )
    agg = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(F.col("_bad").isNull(), 1).otherwise(0)).alias(
            "n_kept_chunks"
        ),
        F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0)).alias(
            "n_removed_chunks"
        ),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept_chunks", F.lit(0)).alias("n_kept_chunks"),
            F.coalesce("n_removed_chunks", F.lit(0)).alias(
                "n_removed_chunks"
            ),
        )
    )


def with_nfc_text(
    df: DataFrame, text_col: str = "text", out_col: str = "nfc_text"
) -> DataFrame:
    """Unicode NFC normalization (canonical composition).

    Real multilingual corpora mix composed ('é' U+00E9) and decomposed
    ('e' + U+0301) encodings of the same visible text; every downstream
    exact-match operator (fingerprint dedup q31, decontamination q81,
    repeated-passage removal q118) silently misses duplicates across
    the two forms unless text is normalized first — so this belongs at
    the head of the curation pipeline, right next to
    ``with_normalized_text`` (which handles case/whitespace but not
    codepoint composition).

    Spark has no built-in Unicode-normalization expression, so this is
    one of the few justified Python stages: an Arrow-batched pandas UDF
    over ``unicodedata.normalize`` (a pure table lookup, no model
    state). Map-only — zero shuffle, scales linearly with input; the
    UDF is self-contained (stdlib import inside) so it needs no shipped
    package on executors.
    """
    @F.pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(
            lambda s: unicodedata.normalize("NFC", s) if s is not None else None
        )

    return df.withColumn(out_col, nfc(F.col(text_col)))


def with_compression_ratio(
    df: DataFrame, text_col: str = "text", out_col: str = "compression_ratio"
) -> DataFrame:
    """DEFLATE compressibility as a quality signal (the gzip heuristic
    CCNet/RefinedWeb-class pipelines use): templated/repetitive text
    compresses far below natural prose, and high-entropy noise barely
    compresses at all — both tails are removal candidates that simple
    token ratios (q63) can miss when the repetition unit is long.

    ratio = compressed_bytes / raw_bytes (level 6, headers included;
    empty text → 1.0). zlib is deterministic for a fixed level and
    strategy, so the column is stable across executors and runs —
    but it is NOT SQL-expressible, hence the rows-only gate. Arrow
    pandas UDF: per-row C-speed deflate, no Python-loop hot path.
    """

    @F.pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(s):
            if s is None:
                return None
            raw = s.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return df.withColumn(out_col, ratio(F.col(text_col)))


# --- DuckDB-SQL twins (shared with pipeline_queries) ----------------------


def sql_stopword_hits(toks_expr: str) -> str:
    from ..functions.text import sql_stopword_array

    return (
        f"len(list_filter({toks_expr},"
        f" x -> list_contains({sql_stopword_array()}, x)))"
    )
