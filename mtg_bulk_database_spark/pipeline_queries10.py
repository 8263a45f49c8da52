"""Registry entries, round 6: statistical-LM corpus quality (the CCNet
perplexity-filter shape trained ON the engine), readability scoring,
and sketch SET ALGEBRA (distinct-overlap between event populations from
mergeable HLL registers — the audience-overlap question a 100 TB event
store answers without a COUNT(DISTINCT) join).

House discipline throughout: integer-derived ratios, ln rounded to 6 dp
(transcendental rule), DECIMAL-summed accumulations with ONE final
double division, and every output column typed BIGINT/DOUBLE/VARCHAR so
no DuckDB HUGEINT/TIMESTAMPTZ ever reaches the driver's comparator
(test_oracle_parity.test_no_oracle_output_types_huge_or_tz).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .functions.text import sql_tokens, tokens
from .operators.sketches import (
    HLL_P,
    hll_estimate_from_registers,
    hll_portable_registers,
    sql_hll_portable,
)
from .registry import query

_TOKS = sql_tokens("text")

#: Bigram separator — US (unit separator). Tokens are [a-z0-9] runs, so
#: the separator can never appear inside one; both engines build the
#: identical bigram strings.
_BG_SEP = "\x1f"


# ---------------------------------------------------------------------------
# Bigram language-model perplexity scoring (q214).
# ---------------------------------------------------------------------------
def _q214_oracle() -> str:
    return f"""WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents),
    uni0 AS (
      SELECT unnest(t) AS w FROM toks),
    uni AS (
      SELECT w, count(*) AS cu FROM uni0 GROUP BY w),
    v AS (SELECT count(*) AS vsz FROM uni),
    bgs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || chr(31) || t[i + 1])) AS bg
      FROM toks WHERE len(t) >= 2),
    bi AS (
      SELECT bg, count(*) AS cb FROM bgs GROUP BY bg),
    scored AS (
      SELECT b.doc_id,
             count(*) AS nb,
             sum(CAST(round(ln((bi.cb + 1.0)
                             / (uni.cu + v.vsz)), 6)
                      AS DECIMAL(18,6))) AS lp
      FROM bgs b
      JOIN bi USING (bg)
      JOIN uni ON uni.w = string_split(b.bg, chr(31))[1]
      CROSS JOIN v
      GROUP BY b.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN s.nb > 0
                THEN round(CAST(s.lp AS DOUBLE) / s.nb, 6) END AS avg_logp
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id"""


@query("q214_lm_perplexity", _q214_oracle())
def q214(spark, sf_dir):
    """CCNet-style statistical-LM quality gate, trained and scored ON
    the corpus in one lineage: corpus bigram/unigram tables (two
    shuffles) feed an add-one-smoothed conditional log-probability
    ``ln((c(w1,w2)+1)/(c(w1)+V))`` per bigram, averaged per document —
    documents whose token SEQUENCES are unusual for the corpus (not
    just their token bag, q98's signal) score low. The LM "training" is
    exactly the count tables, so there is no float iteration and the
    whole estimator is SQL-expressible.

    Engine-exactness: counts and V are integers; each ln is rounded to
    6 dp (house transcendental rule) and summed as DECIMAL(18,6) so
    partial-aggregation order cannot perturb the mean; ONE final double
    division per document.

    Scale: bigram arrays are built POSITIONALLY from the token array
    (no self-join, no window); the vocab and bigram tables are real
    distributed tables (never collected); the scoring joins key on the
    bigram/unigram — Zipf-skewed heads are the AQE skew-join case, and
    |bi| is bounded by total corpus tokens. V folds in as a 1-row
    broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    bgs = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat(
                        F.element_at("t", i),
                        F.lit(_BG_SEP),
                        F.element_at("t", i + 1),
                    ),
                )
            ).alias("bg"),
        )
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    v = uni.agg(F.count("*").alias("vsz"))
    bi = bgs.groupBy("bg").agg(F.count("*").alias("cb"))
    scored = (
        bgs.join(bi, "bg")
        .withColumn("w1", F.split("bg", _BG_SEP).getItem(0))
        .join(uni, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("nb"),
            F.sum(
                F.round(
                    F.log(
                        (F.col("cb") + F.lit(1.0))
                        / (F.col("cu") + F.col("vsz"))
                    ),
                    6,
                ).cast("decimal(18,6)")
            ).alias("lp"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("nb"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.when(
            F.col("nb") > 0,
            F.round(F.col("lp").cast("double") / F.col("nb"), 6),
        ).alias("avg_logp"),
    )


# ---------------------------------------------------------------------------
# Flesch reading-ease readability scoring (q215).
# ---------------------------------------------------------------------------
def _q215_oracle() -> str:
    return f"""WITH f AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(coalesce(list_sum(list_transform({_TOKS},
                    x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')),
                                  1))), 0) AS BIGINT) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             round(206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
           END AS flesch
    FROM f"""


@query("q215_readability", _q215_oracle())
def q215(spark, sf_dir):
    """Flesch reading-ease per document — the classic curriculum /
    difficulty signal for training-data selection (pair it with the
    quality gates: low-quality AND low-readability is the junk
    quadrant; high-quality HIGH-difficulty is curriculum tail).
    Syllables are vowel-group runs per token with a 1-minimum (the
    standard heuristic), sentences are terminal-punctuation runs with a
    1-minimum, so every input to the score is an integer count; the
    score itself is two exact divisions in a fixed association order —
    deterministic across engines without any rounding discipline
    beyond the final 6 dp. One codegen'd scan, zero shuffles."""
    toks = tokens("text")
    n_words = F.size(toks).cast("bigint")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)),
        F.lit(1),
    ).cast("bigint")
    syl = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.greatest(
            F.size(F.regexp_extract_all(x, F.lit("[aeiouy]+"), 0)),
            F.lit(1),
        ).cast("bigint"),
    )
    n_syl = F.coalesce(syl, F.lit(0)).cast("bigint")
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
        F.when(
            n_words > 0,
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (n_words.cast("double") / n_sent)
                - F.lit(84.6) * (n_syl.cast("double") / n_words),
                6,
            ),
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# HLL set algebra: audience overlap from mergeable registers (q216).
# ---------------------------------------------------------------------------
_Q216_A, _Q216_B = "purchase", "view"


def _q216_oracle() -> str:
    # three estimates from the SAME register construction: A, B, and
    # A∪B (the union sketch is register-wise MAX — here computed by
    # running the identical pipeline over the concatenated population,
    # which yields the same registers by max's associativity)
    def est(cte_filter: str, tag: str) -> str:
        src = f"""(SELECT '{tag}' AS g, user_id
                   FROM events
                   WHERE user_id IS NOT NULL AND ({cte_filter}))"""
        body = sql_hll_portable("src_" + tag, "g", "CAST(user_id AS VARCHAR)")
        return f"""(WITH src_{tag} AS (SELECT * FROM {src}),
                    {body})"""

    a = est(f"event_type = '{_Q216_A}'", "a")
    b = est(f"event_type = '{_Q216_B}'", "b")
    u = est(
        f"event_type = '{_Q216_A}' OR event_type = '{_Q216_B}'", "u"
    )
    return f"""SELECT ea.est_distinct AS est_a,
                      eb.est_distinct AS est_b,
                      eu.est_distinct AS est_union,
                      round(ea.est_distinct + eb.est_distinct
                            - eu.est_distinct, 4) AS est_intersection
               FROM {a} ea CROSS JOIN {b} eb CROSS JOIN {u} eu"""


@query("q216_hll_set_algebra", _q216_oracle())
def q216(spark, sf_dir):
    """Distinct-audience OVERLAP between two event populations by
    inclusion–exclusion over portable HLL sketches: |A∩B| ≈ est(A) +
    est(B) − est(A∪B), where the union estimate comes from the
    register-wise MAX of the two sketches — the merge that makes HLL
    mergeable is exactly set union, so the union sketch is computed
    WITHOUT rescanning either population once registers are persisted
    as an ingest artifact. At 100 TB this answers "how many purchasers
    also viewed" from two register frames of 2^p rows each; the exact
    COUNT(DISTINCT) twin needs a full shuffle of both populations.

    The registered plan builds registers per population (one pass over
    the filtered scan each — in production these ARE the persisted
    artifact) and derives all three estimates through the identical
    q178 arithmetic, so the DuckDB twin hash-matches bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    uid = F.col("user_id").cast("string")

    def regs(pred, tag):
        return hll_portable_registers(
            ev.where(pred).select(F.lit(tag).alias("g"), uid.alias("u")),
            "g",
            "u",
        )
    ra = regs(F.col("event_type") == _Q216_A, "a")
    rb = regs(F.col("event_type") == _Q216_B, "b")
    # union sketch: register-wise MAX across the two register frames
    ru = (
        ra.unionByName(rb)
        .groupBy("idx")
        .agg(F.max("M").alias("M"))
        .withColumn("g", F.lit("u"))
    )
    ea = hll_estimate_from_registers(ra, "g").select(
        F.col("est_distinct").alias("est_a")
    )
    eb = hll_estimate_from_registers(rb, "g").select(
        F.col("est_distinct").alias("est_b")
    )
    eu = hll_estimate_from_registers(ru, "g").select(
        F.col("est_distinct").alias("est_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_intersection"),
        )
    )
