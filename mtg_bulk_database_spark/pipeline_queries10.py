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
# Per-source token-distribution divergence vs the corpus (q214).
# ---------------------------------------------------------------------------
def _q214_oracle() -> str:
    return f"""WITH tok AS (
      SELECT source, unnest({_TOKS}) AS w FROM documents),
    src_c AS (
      SELECT source, w, count(*) AS cs FROM tok GROUP BY source, w),
    corp_c AS (
      SELECT w, count(*) AS c FROM tok GROUP BY w),
    v AS (SELECT count(*) AS vsz FROM corp_c),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
    src_n AS (
      SELECT source, CAST(count(*) AS BIGINT) AS ns FROM tok
      GROUP BY source),
    terms AS (
      SELECT t.source,
             sum(CAST(round(ln((corp_c.c + 1.0) / (tot.n + v.vsz)), 6)
                      AS DECIMAL(18,6))) AS s_corp,
             sum(CAST(round(ln((src_c.cs + 1.0) / (src_n.ns + v.vsz)), 6)
                      AS DECIMAL(18,6))) AS s_self
      FROM tok t
      JOIN corp_c USING (w)
      JOIN src_c ON src_c.source = t.source AND src_c.w = t.w
      JOIN src_n ON src_n.source = t.source
      CROSS JOIN v CROSS JOIN tot
      GROUP BY t.source)
    SELECT s.source, n.ns AS n_tokens,
           CAST(CAST(-t.s_corp * 1000000 AS BIGINT) // n.ns AS DOUBLE)
             / 1000000.0 AS cross_entropy,
           CAST(CAST(-t.s_self * 1000000 AS BIGINT) // n.ns AS DOUBLE)
             / 1000000.0 AS entropy,
           CAST(CAST(-t.s_corp * 1000000 AS BIGINT) // n.ns
                - CAST(-t.s_self * 1000000 AS BIGINT) // n.ns AS DOUBLE)
             / 1000000.0 AS kl
    FROM src_n n JOIN terms t ON t.source = n.source
    JOIN (SELECT DISTINCT source FROM documents) s
      ON s.source = n.source"""


@query("q214_source_token_kl", _q214_oracle())
def q214(spark, sf_dir):
    """Domain-divergence scoring per SOURCE — the DoReMi-shaped signal
    a corpus mixer weighs sources by: for each source, the empirical
    cross-entropy of its tokens under the CORPUS unigram distribution,
    its own entropy, and their difference KL(source ‖ corpus). An
    out-of-distribution source (boilerplate dump, wrong language,
    machine noise) shows a large KL; near-zero means the source looks
    like the corpus. Distinct from q110/q120 (per-DOCUMENT fluency
    under a bigram LM) and q93 (volume/quality mix): this is the
    source-level distribution-shift lens over the same token machinery.

    Both sums run over the source's OWN tokens (never a vocab x source
    expansion): H(s, corpus) = −(1/n_s)·Σ_tokens ln p(w) needs only a
    token→corpus-count join, so cost is linear in corpus tokens — one
    explode, two count tables, Zipf-head joins under AQE skew handling.
    Add-one smoothing over the corpus vocab keeps every ln finite;
    each ln is 6 dp-rounded and DECIMAL-summed (house rules); the final
    per-source ratios floor at 1e-6 via integer division on the exact
    micro-sums (the r9 half-micro discipline), so kl is exactly
    cross_entropy - entropy.

    ONE fanned-out tokenize pass (r11b, guide §2.3): the token stream
    feeds five consumers (the two eagerly-checkpointed count tables,
    vocab/total stats, and the scoring join) — each re-ran the
    tokenize scan; the checkpointed token-ARRAY table is tokenized
    once and re-exploded per consumer."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select("source", tokens("text").alias("_l")).localCheckpoint(
        eager=False
    )
    tok = toks.select("source", F.explode("_l").alias("w"))
    # The count tables are VOCAB-sized (tiny next to the token stream)
    # but their final-aggregate sits directly above their shuffle, and
    # AQE's OptimizeSkewedJoin only pattern-matches a plain
    # Sort+ShuffleRead under each SMJ child — so without a barrier the
    # Zipf-head token key could NEVER split, however skewed (verified:
    # tests/test_plans.py::test_q214_zipf_head_skew_join_splits).  The
    # checkpoint materializes the vocab-sized table once and lets the
    # join introduce its own ENSURE_REQUIREMENTS exchange, which AQE
    # may split/replicate.  (At bench scale the 31-row count tables
    # broadcast instead — the barrier only matters where vocab exceeds
    # the broadcast threshold, exactly where the head is hottest.)
    src_c = (
        tok.groupBy("source", "w")
        .agg(F.count("*").alias("cs"))
        .localCheckpoint(eager=True)
    )
    corp_c = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    v = corp_c.agg(F.count("*").alias("vsz"))
    tot = tok.agg(F.count("*").cast("bigint").alias("n"))
    src_n = tok.groupBy("source").agg(
        F.count("*").cast("bigint").alias("ns")
    )
    terms = (
        tok.join(corp_c, "w")
        .join(src_c, ["source", "w"])
        .join(src_n, "source")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(
                F.round(
                    F.log(
                        (F.col("c") + F.lit(1.0))
                        / (F.col("n") + F.col("vsz"))
                    ),
                    6,
                ).cast("decimal(18,6)")
            ).alias("s_corp"),
            F.sum(
                F.round(
                    F.log(
                        (F.col("cs") + F.lit(1.0))
                        / (F.col("ns") + F.col("vsz"))
                    ),
                    6,
                ).cast("decimal(18,6)")
            ).alias("s_self"),
        )
    )
    # floor-at-1e-6 via INTEGER division on the exact negated micro-
    # sums (r9: the q226 fuzz seam generalized — round(decimal_sum /
    # count, 6) lands on half-micros and the engines round apart;
    # ln-probs are negative so -s_micro is non-negative and truncating
    # DIV == flooring //).  KL is the difference of the two floored
    # micros, so kl == cross_entropy - entropy EXACTLY post-floor.
    ce_micro = F.expr("CAST(-s_corp * 1000000 AS BIGINT) DIV ns")
    h_micro = F.expr("CAST(-s_self * 1000000 AS BIGINT) DIV ns")
    return src_n.join(terms, "source").select(
        "source",
        F.col("ns").alias("n_tokens"),
        (ce_micro.cast("double") / F.lit(1000000.0)).alias(
            "cross_entropy"
        ),
        (h_micro.cast("double") / F.lit(1000000.0)).alias("entropy"),
        (
            (ce_micro - h_micro).cast("double") / F.lit(1000000.0)
        ).alias("kl"),
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


# ---------------------------------------------------------------------------
# IVF coarse-quantizer ASSIGNMENT with the frozen centroid artifact
# (q217) — the q213 pattern applied to the ANN family: k-means TRAINING
# is float-iterative (rows-only by nature, q75), but the deployed
# quantizer's assignment pass is pure fixed-literal algebra, so the
# serving half of IVF becomes a hash-checked gate.
# ---------------------------------------------------------------------------
from .functions.vectors import (  # noqa: E402
    cosine_similarity,
    indexable_vector,
    lit_cosine_scores,
    sql_cosine,
    sql_indexable,
)

#: Deployed coarse-quantizer artifact: ``similarity.ivf_index`` on the
#: sf0.01 embedding pool (n_lists=8, seed 42, spherical k-means), each
#: centroid frozen to 6 dp.  Cosine against these literals is pure
#: mul/add/sqrt/divide — every op IEEE-exact, no transcendental — so
#: the scores are BIT-identical across engines with no rounding
#: discipline needed beyond the defensive final 6 dp.
_Q217_CENTROIDS = (
    (-0.077729, 0.000613, -0.022249, -0.031346, -0.065625, -0.027281, -0.01306, -0.024105, -0.056388, -0.058213, 0.037927, -0.043047, -0.035335, -0.005288, -0.028536, -0.078915, 0.024373, 0.079232, 0.006768, -0.026803, 0.044129, 0.045647, 0.055511, 0.024626, 0.047379, -0.067458, 0.024594, -0.01479, -0.012264, -0.006515, -0.00676, -0.023688, 0.085699, 0.012473, 0.015957, 0.004062, -0.041726, -0.038952, 0.042452, -0.002432, -0.001098, 0.026545, 0.005638, -0.060911, 0.048676, 0.00398, 0.039394, 0.020951, -0.013709, -0.056016, 0.011631, -0.013431, 0.044736, -0.035133, -0.010927, -0.04723, -0.087872, -0.052917, 0.017504, 0.000454, 0.017088, 0.044163, -0.012853, -0.04995),
    (-0.028749, -0.052552, -0.063649, 0.034742, 0.038582, 0.022227, -0.037753, -0.010122, 0.025068, 0.014159, 0.035167, 0.007628, -0.029794, 0.025887, -0.003722, -0.009944, -0.03039, -0.047398, -0.036284, -0.018795, -0.03715, 0.028837, -0.001218, 0.003317, 0.038614, 0.077516, 0.012595, -0.001309, -0.026577, -0.000716, 0.027367, 0.005273, 0.038856, -0.048054, 0.000395, -0.021265, 0.007153, 0.01439, -0.058294, 0.045066, 0.045292, 0.008911, 0.033511, 0.029382, -0.032029, 0.008499, 0.019104, -0.025905, 0.040761, 0.06675, -0.016299, -0.005997, 0.064654, 0.009144, -0.037538, 0.017623, 0.008372, -0.00083, 0.001366, 0.029033, 0.021949, 0.041429, -0.016304, 0.00555),
    (0.006969, 0.01189, -0.015741, -0.042739, 0.002153, 0.016276, 0.00927, -0.013579, -0.00058, -0.06959, -0.01506, -0.045794, -0.03287, 0.014215, -0.019316, 0.002047, 0.062008, 0.006583, 0.029074, 0.043362, 0.009481, -0.006041, 0.04828, -0.019527, -0.031275, -0.006724, -0.007716, 0.032046, 0.023208, 0.008608, -0.017016, 0.006399, -0.049185, -6.6e-05, 0.024261, 0.024875, -0.000759, 0.015202, 0.025088, 0.020275, -0.018381, 0.020712, 0.020875, -0.009496, -0.041281, 0.021358, -0.014017, -0.038378, -0.012092, 0.027974, -0.025311, -0.010463, -0.012935, -0.032555, 0.019773, -0.047775, 0.029738, -0.011994, -0.012939, -0.018872, -0.040692, 0.023509, 0.007005, -0.022163),
    (-0.008152, 0.011199, 0.047988, 0.000178, 0.026236, -0.047446, 0.04683, -0.006881, 0.025152, -0.022347, -0.058308, 0.021628, 0.062466, 0.019645, 0.068487, -0.040318, -0.007682, -0.00192, -0.027591, 0.032256, 0.013564, -0.035227, -0.023519, -0.049224, 0.011254, 0.034101, -0.051985, -0.035664, -0.058455, 0.021986, 0.03972, -0.054928, 0.067352, 0.035608, 0.013487, 0.015702, 0.03885, 0.000203, -0.101167, -0.020161, 0.022672, -0.033123, -0.01755, 0.043722, 0.022636, 0.023665, -0.045344, 0.005739, -0.036323, -0.083343, -0.036008, 0.077574, 0.026789, -0.012495, 0.071319, -0.022576, 0.019833, -0.030623, 0.063543, 0.026139, 0.00155, -0.050652, 0.061162, -0.032034),
    (-0.003742, -0.009924, 0.0102, -0.011084, 0.01533, 0.044474, -0.091717, 0.025378, 0.006677, 0.077806, -0.07259, 0.037998, 0.051009, -0.028151, 0.019246, 0.069954, 0.023183, -0.030952, 0.039284, -0.042813, 0.029457, 0.021265, -0.017934, -0.016462, -0.020942, 0.045149, -0.006752, -0.008335, -0.01191, -0.045639, -0.003695, -0.006798, -0.024017, -0.000337, 0.011667, -0.072792, -0.01172, -0.026305, 0.01874, -0.046788, -0.01456, -0.00709, 0.005286, -0.005432, 0.01472, -0.000836, -0.03207, 0.019499, -0.038001, -0.046973, 0.012253, -0.009679, -0.000313, 0.041647, -0.017108, 0.029373, 0.019551, 0.046087, 0.025027, -0.009323, -0.033994, -0.003284, 0.01503, -0.03845),
    (0.039574, 0.041078, 0.039067, 0.016605, 0.03317, 0.060251, -0.037953, -0.002488, -0.033369, -0.033856, 0.063835, 0.031803, -0.026467, -0.015287, -0.002077, 0.033329, -0.042122, 0.018438, -0.006291, -0.0337, -0.001009, -0.022842, -0.021422, 0.02201, 0.012236, -0.005968, 0.035881, 0.022352, 0.04029, 0.036742, 0.010479, -0.01258, 0.018073, -0.014016, -0.010772, -0.00449, -0.008491, 0.056831, -0.00925, -0.002243, -0.026757, -0.072218, -0.013554, -0.011276, -0.019089, 0.0024, 0.037392, 0.00302, 0.035248, -0.030404, 0.056088, 0.003721, -0.044213, -0.016601, -0.016909, 0.01409, 0.034106, 0.038694, -0.032002, 0.008887, 0.058948, -0.049121, 0.005662, 0.054187),
    (0.058356, -0.031186, 0.012924, 0.028765, -0.016309, -0.016235, 0.015167, 0.101596, -0.020379, 0.076782, 0.039677, 0.018428, -0.005724, 0.00621, -0.011618, 0.004316, -0.032413, 0.031523, -0.022415, 0.000471, -0.045489, -0.003148, -0.001984, -0.012555, -0.031315, 0.008672, -0.016275, 0.038789, 0.020338, -0.015336, 0.03386, 0.024057, 0.002277, 0.009259, 0.000506, 0.08099, -0.025142, -0.057737, 0.046938, -0.025404, -0.031119, -0.020528, -0.06063, -0.017584, -0.011756, -0.037199, -0.007535, 0.099877, -0.034982, -0.01883, 0.029119, -0.03619, -0.004774, 0.003186, 0.02047, 0.003466, -0.057086, -0.053151, -0.066395, -0.051297, -0.005883, 0.021924, -0.03981, -0.024143),
    (-0.043453, -0.028158, 0.100705, -0.058704, 0.011311, -0.137549, 0.005293, -0.013477, 0.051751, 0.034413, 0.037265, 0.003598, 0.076742, -0.001581, -0.002491, -0.003523, 0.023352, 0.066254, -0.026833, 0.111049, -0.048357, 0.002216, -0.037273, -0.02983, 0.000369, -0.052943, -0.041111, 0.017788, -0.074532, -0.003033, -0.067523, -0.047617, 0.039266, -0.035864, -0.04717, -0.029122, -0.001083, -0.03508, 0.003861, 0.005106, 0.077801, -0.030826, 0.030678, 0.056546, -0.023114, 0.004502, 0.001879, -0.005354, 0.020767, -0.013816, 0.094346, 0.025511, 0.059924, 0.028314, 0.069704, 0.041246, 0.020718, 0.007811, 0.030701, -0.086704, 0.004982, 0.005655, -0.049228, -0.048529),
)

def _q217_oracle() -> str:
    def sql_cent(c) -> str:
        # parenthesized so the twin's subscript `{cent}[i]` parses
        return "([" + ", ".join(repr(v) for v in c) + "]::DOUBLE[])"

    score_cols = ",\n             ".join(
        f"round({sql_cosine('embedding', sql_cent(c))}, 6) AS s{i}"
        for i, c in enumerate(_Q217_CENTROIDS)
    )
    arr = "[" + ", ".join(f"s{i}" for i in range(len(_Q217_CENTROIDS))) + "]"
    return f"""WITH pool AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id <> 0 AND {sql_indexable('embedding')}),
    scored AS (
      SELECT vec_id,
             {score_cols}
      FROM pool),
    arrd AS (
      SELECT vec_id, {arr} AS sc FROM scored)
    SELECT vec_id,
           CAST(list_position(sc, list_aggregate(sc, 'max')) - 1 AS INT)
             AS list_id,
           list_aggregate(sc, 'max') AS affinity
    FROM arrd"""


@query("q217_ivf_assign_portable", _q217_oracle())
def q217(spark, sf_dir):
    """The IVF index's ASSIGNMENT pass with the deployed centroid
    artifact, hash-checked against DuckDB: every indexable embedding
    scores against all 8 frozen centroids (fixed-order zip_with fold —
    the vectors module's cross-engine dot discipline) and lands in the
    argmax list, first-index tiebreak.  This is exactly the map pass a
    100 TB ingest runs to cluster-partition vectors before writing
    (q75 probes the result); one codegen'd scan, zero shuffles, the
    centroid table folded in as literals."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        (F.col("vec_id") != 0) & indexable_vector(F.col("embedding"))
    )
    # literal-codebook scores as ONE JVM-parsed SQL string — identical
    # Catalyst trees, ~1.2 s less py4j construction per bench pass
    # (functions.vectors.lit_cosine_scores; the q223 discipline)
    scores = lit_cosine_scores("embedding", _Q217_CENTROIDS, round_dp=6)
    return emb.select(
        "vec_id",
        scores.alias("sc"),
    ).select(
        "vec_id",
        (F.array_position("sc", F.array_max("sc")) - 1)
        .cast("int")
        .alias("list_id"),
        F.array_max("sc").alias("affinity"),
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix (q218) — the signup-week × weeks-since grid.
# ---------------------------------------------------------------------------
@query(
    "q218_cohort_retention",
    """WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7
                  AS BIGINT) AS week_idx
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
      WHERE e.ts IS NOT NULL),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size
      FROM first_seen GROUP BY cohort_week),
    grid AS (
      SELECT cohort_week, week_idx, count(*) AS n_active
      FROM activity GROUP BY cohort_week, week_idx)
    SELECT g.cohort_week, g.week_idx, g.n_active, s.cohort_size,
           round(CAST(g.n_active AS DOUBLE) / s.cohort_size, 6)
             AS retention
    FROM grid g JOIN sizes s USING (cohort_week)""",
)
def q218(spark, sf_dir):
    """The retention grid every growth dashboard draws: users bucket
    into signup-week cohorts (ISO week of first event — both engines
    truncate to Monday; CAST to DATE kills the engines' differing
    date_trunc return types), activity collapses to distinct
    (user, week) cells, and the matrix is one groupBy over
    (cohort, weeks-since) with a cohort-size join. Week indices are
    exact integer date arithmetic between two week-start dates —
    never float duration division — and retention is one final double
    division of two counts.

    Scale: two shuffles on user (first-seen + the activity join — at
    ingest the first-seen frame is the persisted artifact, making this
    one shuffle), one on the cohort grid (|weeks|² cells, metadata);
    the distinct is partial-aggregated. Complements q172 (cumulative
    uniques) and q175 (reactivation census): this is the COHORTED
    decay view of the same lag machinery."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_idx"),
        )
        .distinct()
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    grid = activity.groupBy("cohort_week", "week_idx").agg(
        F.count("*").alias("n_active")
    )
    return grid.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_idx",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: nDCG@10 of the BM25 ranking (q219).
# ---------------------------------------------------------------------------
from .operators.retrieval import bm25_scores, sql_bm25_scores  # noqa: E402

_Q219_TERMS = ("spark", "vector")
_Q219_K = 10
#: Per-rank discounts 1/log2(i+1), frozen as 6 dp PYTHON literals so
#: both engines multiply integer gains by the IDENTICAL decimal — no
#: runtime log2 ever runs (the transcendental is precomputed, the
#: strongest form of the house ln rule).
_Q219_DISC = (
    "1.0", "0.63093", "0.5", "0.430677", "0.386853",
    "0.356207", "0.333333", "0.315465", "0.30103", "0.289065",
)


def _q219_oracle() -> str:
    t0, t1 = _Q219_TERMS
    bm25 = sql_bm25_scores(_Q219_TERMS)
    disc = "[" + ", ".join(_Q219_DISC) + "]::DECIMAL(8,6)[]"
    return f"""WITH scored AS ({bm25}),
    rels AS (
      SELECT doc_id,
             CAST(list_contains({_TOKS}, '{t0}') AS INT)
             + CAST(list_contains({_TOKS}, '{t1}') AS INT) AS rel
      FROM documents),
    top AS (
      SELECT s.doc_id, r.rel,
             row_number() OVER (ORDER BY s.bm25 DESC, s.doc_id) AS rk
      FROM scored s JOIN rels r USING (doc_id)
      ORDER BY s.bm25 DESC, s.doc_id LIMIT {_Q219_K}),
    dcg AS (
      SELECT sum(((1 << rel) - 1) * ({disc})[rk]) AS dcg FROM top),
    ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rk
      FROM rels ORDER BY rel DESC, doc_id LIMIT {_Q219_K}),
    idcg AS (
      SELECT sum(((1 << rel) - 1) * ({disc})[rk]) AS idcg FROM ideal),
    nrel AS (
      SELECT count(CASE WHEN rel > 0 THEN 1 END) AS n_relevant FROM rels)
    SELECT CAST(nrel.n_relevant AS BIGINT) AS n_relevant,
           round(CAST(dcg.dcg AS DOUBLE), 6) AS dcg,
           round(CAST(idcg.idcg AS DOUBLE), 6) AS idcg,
           CASE WHEN idcg.idcg > 0
                THEN round(CAST(dcg.dcg AS DOUBLE)
                           / CAST(idcg.idcg AS DOUBLE), 6) END AS ndcg
    FROM dcg, idcg, nrel"""


@query("q219_retrieval_ndcg", _q219_oracle())
def q219(spark, sf_dir):
    """The retrieval family's EVAL gate (the q180 discipline applied to
    ranking): nDCG@10 of the BM25 ranking against a graded relevance
    oracle (how many distinct query terms the document contains —
    deterministic, so the metric is hash-checkable end to end, which a
    human-judged qrel set never is).

    Engine-exactness: gains ``2^rel − 1`` are integers, the per-rank
    discounts ``1/log2(i+1)`` are PRE-FROZEN 6 dp decimal literals (no
    runtime transcendental at all), so DCG/IDCG are exact DECIMAL sums
    and nDCG is one final double division. Scale: the only global sort
    is a top-10 (TakeOrdered shape, never a full-table window); the
    relevance column is a codegen'd projection; corpus stats come from
    bm25_scores' single broadcast stats row."""
    from pyspark.sql import Window

    t0, t1 = _Q219_TERMS
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    rels = docs.select(
        "doc_id",
        (
            F.array_contains(toks, t0).cast("int")
            + F.array_contains(toks, t1).cast("int")
        ).alias("rel"),
    )
    disc = F.array(
        *[F.lit(d).cast("decimal(8,6)") for d in _Q219_DISC]
    )
    gain = F.expr("shiftleft(1, rel) - 1")  # 2^rel − 1, integer

    def decimal_dcg(ranked, out: str):
        return ranked.agg(
            F.sum(gain * F.element_at(disc, F.col("rk"))).alias(out)
        )

    # the ranked frames are post-limit(10), so the single-partition
    # window is 10 rows by construction (the constant partition key is
    # documentation of that intent — the optimizer prunes foldable
    # keys, and a 10-row frame never triggers the WindowExec warning)
    w_score = Window.partitionBy(F.lit(0)).orderBy(
        F.col("bm25").desc(), "doc_id"
    )
    top = (
        bm25_scores(docs, list(_Q219_TERMS))
        .join(rels, "doc_id")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_Q219_K)
        .withColumn("rk", F.row_number().over(w_score))
    )
    w_rel = Window.partitionBy(F.lit(0)).orderBy(
        F.col("rel").desc(), "doc_id"
    )
    ideal = (
        rels.orderBy(F.col("rel").desc(), "doc_id")
        .limit(_Q219_K)
        .withColumn("rk", F.row_number().over(w_rel))
    )
    dcg = decimal_dcg(top, "dcg")
    idcg = decimal_dcg(ideal, "idcg")
    nrel = rels.agg(
        F.count(F.when(F.col("rel") > 0, 1)).alias("n_relevant")
    )
    return (
        nrel.crossJoin(F.broadcast(dcg))
        .crossJoin(F.broadcast(idcg))
        .select(
            "n_relevant",
            F.round(F.col("dcg").cast("double"), 6).alias("dcg"),
            F.round(F.col("idcg").cast("double"), 6).alias("idcg"),
            F.when(
                F.col("idcg") > 0,
                F.round(
                    F.col("dcg").cast("double")
                    / F.col("idcg").cast("double"),
                    6,
                ),
            ).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence-packing efficiency report (q220) — the fill-rate audit over
# q102's packed training sequences.
# ---------------------------------------------------------------------------
def _q220_oracle() -> str:
    from .pipeline_queries4 import _PACK_BUDGET
    from .registry import ORACLE_SQL

    # layered ON the registered q102 oracle text, so the two gates can
    # never drift apart: the efficiency report audits exactly the
    # packing the packing gate verifies
    from .functions.exact import guarded_micro_ratio_sql

    fill = guarded_micro_ratio_sql(
        "total_tokens", f"(n_seqs * {_PACK_BUDGET})", "//"
    )
    return f"""WITH packed AS ({ORACLE_SQL["q102_pack_sequences"]}),
    per_seq AS (
      SELECT shard, seq_id,
             CAST(sum(n_chunk_tokens) AS BIGINT) AS toks
      FROM packed GROUP BY shard, seq_id),
    agg AS (
      SELECT shard,
             count(*) AS n_seqs,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             count(CASE WHEN toks > {_PACK_BUDGET} THEN 1 END)
               AS n_overflow
      FROM per_seq GROUP BY shard)
    SELECT shard, n_seqs, total_tokens,
           CAST({fill} AS DOUBLE) / 1000000.0 AS avg_fill,
           n_overflow
    FROM agg"""


@query("q220_packing_efficiency", _q220_oracle())
def q220(spark, sf_dir):
    """The packing audit a training-data team reads before shipping
    batches: per shard, how many fixed-budget sequences the packer
    produced, the mean fill rate (wasted budget = padding tokens the
    trainer pays for), and how many sequences overflowed the budget
    (q102's approximate packing allows ≤1 chunk of overflow — this
    gate COUNTS it instead of assuming it). Layered on q102's own
    output, so the report and the packing share one lineage; two
    narrow integer aggregates on top of the packing plan, one final
    division per shard."""
    from .pipeline_queries4 import _PACK_BUDGET, q102

    from .functions.exact import guarded_micro_ratio_sql

    packed = q102(spark, sf_dir)
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_chunk_tokens").cast("bigint").alias("toks")
    )
    agg = per_seq.groupBy("shard").agg(
        F.count("*").alias("n_seqs"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.count(
            F.when(F.col("toks") > _PACK_BUDGET, 1)
        ).alias("n_overflow"),
    )
    # fill rate floored at 1e-6 via the overflow-safe integer form
    # (r9: fuzz seed 5 hit a half-micro — 1.0015625 — where the
    # engines' round() disagree; the q226/q214 discipline)
    fill_micro = F.expr(
        guarded_micro_ratio_sql(
            "total_tokens", f"(n_seqs * {_PACK_BUDGET})", "DIV"
        )
    )
    return agg.select(
        "shard",
        "n_seqs",
        "total_tokens",
        (fill_micro.cast("double") / F.lit(1000000.0)).alias("avg_fill"),
        "n_overflow",
    )


# ---------------------------------------------------------------------------
# IVF probe with the frozen quantizer (q221) — completes the ANN
# serving loop as an oracled gate: q217 proved the ASSIGNMENT pass;
# this proves the PROBE (list selection + pruned exact re-rank).
# ---------------------------------------------------------------------------
_Q221_NPROBE = 4
_Q221_K = 10


def _cos_total(a, b):
    """Cosine that yields NULL instead of an ANSI error on zero-norm
    input. q221's list_id feeds a JOIN KEY, and Catalyst pushes the
    key's isnotnull check BELOW the indexable filter — so the division
    can execute on rows the filter would drop (fuzz corpora carry
    zero-norm vectors). try_divide makes the expression total; values
    on indexable rows are bit-identical to cosine_similarity."""
    from .functions.vectors import dot, l2_norm

    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def _sql_cent(c) -> str:
    # parenthesized so a subscript `{cent}[i]` parses
    return "([" + ", ".join(repr(v) for v in c) + "]::DOUBLE[])"


def _q221_oracle() -> str:
    cent_rows = ",\n        ".join(
        f"({i}, {_sql_cent(c)})" for i, c in enumerate(_Q217_CENTROIDS)
    )
    score_cols = ",\n             ".join(
        f"round({sql_cosine('embedding', _sql_cent(c))}, 6) AS s{i}"
        for i, c in enumerate(_Q217_CENTROIDS)
    )
    arr = "[" + ", ".join(f"s{i}" for i in range(len(_Q217_CENTROIDS))) + "]"
    return f"""WITH q AS (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cents(idx, cent) AS (VALUES
        {cent_rows}),
    qs AS (
      SELECT idx, round({sql_cosine('cent', 'qv')}, 6) AS qscore
      FROM cents, q),
    probe AS (
      SELECT idx FROM qs ORDER BY qscore DESC, idx LIMIT {_Q221_NPROBE}),
    pool AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id <> 0 AND {sql_indexable('embedding')}),
    scored AS (
      SELECT vec_id, embedding,
             {score_cols}
      FROM pool),
    assigned AS (
      SELECT vec_id, embedding,
             CAST(list_position({arr}, list_aggregate({arr}, 'max')) - 1
                  AS INT) AS list_id
      FROM scored)
    SELECT a.vec_id,
           round({sql_cosine('a.embedding', 'q.qv')}, 4) AS cosine
    FROM assigned a JOIN probe p ON a.list_id = p.idx, q
    ORDER BY cosine DESC, a.vec_id LIMIT {_Q221_K}"""


@query("q221_ivf_probe_portable", _q221_oracle())
def q221(spark, sf_dir):
    """The IVF probe as a hash-checked gate, completing the family's
    serving loop (q217 = assignment, this = query time): the query
    vector (vec_id 0, read from the table in BOTH engines — no
    driver-side literal) ranks the 8 frozen centroids, the top
    ``n_probe`` lists are selected, and the exact cosine re-rank runs
    ONLY over vectors assigned to those lists — the probe-pruned scan
    that makes IVF sublinear at 100 TB (the assigned table is written
    list-partitioned at ingest, so the probe reads ~n_probe/n_lists of
    the files; here assignment is recomputed inline since the gate
    must be self-contained). Every score is pure mul/add/sqrt/divide
    (bit-identical), probe ties break on centroid index, rank ties on
    vec_id; q75 keeps the data-adaptive trained path, recall-pinned."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    cents = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(_Q217_CENTROIDS)],
        "idx int, cent array<double>",
    )
    from pyspark.sql import Window

    qs = cents.crossJoin(F.broadcast(qrow)).select(
        "idx",
        F.round(
            _cos_total(F.col("cent"), F.col("qv")), 6
        ).alias("qscore"),
    )
    # top-n_probe of the 8-row centroid frame via TakeOrdered — no
    # window at all (a constant partitionBy(lit(0)) key is ELIMINATED
    # by the optimizer's foldable-partition pruning, so the rank-window
    # form still emitted 'No Partition Defined' warnings into the
    # driver's bounded bench tail); same deterministic selection as
    # the oracle's row_number <= n_probe
    probe = (
        qs.orderBy(F.col("qscore").desc(), "idx")
        .limit(_Q221_NPROBE)
        .select(F.col("idx").alias("list_id"))
    )
    pool = emb.where(
        (F.col("vec_id") != 0) & indexable_vector(F.col("embedding"))
    )
    # one JVM-parsed SQL string for the literal-codebook scores (see
    # q217) — try_divide form: list_id feeds a join key, whose
    # isnotnull check Catalyst pushes below the indexable filter
    scores = lit_cosine_scores(
        "embedding", _Q217_CENTROIDS, round_dp=6, total=True
    )
    assigned = pool.select(
        "vec_id",
        "embedding",
        (F.array_position(scores, F.array_max(scores)) - 1)
        .cast("int")
        .alias("list_id"),
    )
    return (
        assigned.join(F.broadcast(probe), "list_id")
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.round(
                _cos_total(F.col("embedding"), F.col("qv")), 4
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(_Q221_K)
    )
