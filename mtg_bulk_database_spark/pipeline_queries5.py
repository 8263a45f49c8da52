"""Registry entries, round 3 (cont.): the statistical-LM quality layer
and corpus-assembly operators above the dedup family — bigram-LM
fluency scoring (the perplexity-filter stand-in), temperature-scaled
source mixing (α-sampling), and incremental-ingest novelty detection
(new batch vs. reference-corpus fingerprint anti-join).

All three follow the house exactness rules: integer accumulation
(micro-nat floors / BIGINT weights) with single final double
operations, content-hash lotteries instead of RNG, and DuckDB twins
that share tokenizer/predicate builders with the Spark side so the
two can never drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .functions.text import sql_tokens, sql_ts_tokens
from .operators import sampling, text_analysis
from .registry import query

_TOKS = sql_tokens("text")


# ---------------------------------------------------------------------------
# Bigram-LM fluency score — see text_analysis.bigram_lm_score for the
# model and the micro-nat exactness scheme. The oracle retrains the
# same add-one bigram model in SQL.
# ---------------------------------------------------------------------------
@query(
    "q110_bigram_lm_score",
    f"""WITH tok AS (
          SELECT doc_id, {_TOKS} AS l FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(l) >= 2
                        THEN list_transform(generate_series(1, len(l) - 1),
                                            i -> l[i] || ' ' || l[i + 1])
                        ELSE CAST([] AS VARCHAR[]) END) AS bg
          FROM tok),
        uni AS (SELECT unnest(l) AS t FROM tok),
        unic AS (SELECT t, count(*) AS c1 FROM uni GROUP BY t),
        v AS (SELECT count(DISTINCT t) AS vocab FROM uni),
        bgc AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
        terms AS (
          SELECT b.doc_id,
                 CAST(floor(ln((c.c2 + 1.0) / (u.c1 + v.vocab))
                            * 1000000.0) AS BIGINT) AS term_micro
          FROM bg b
          JOIN bgc c USING (bg)
          JOIN unic u ON u.t = string_split(b.bg, ' ')[1]
          CROSS JOIN v),
        scored AS (
          SELECT doc_id, count(*) AS n_bigrams, sum(term_micro) AS s
          FROM terms GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               coalesce(CAST(s.s AS DOUBLE) / 1000000.0, 0.0) AS sum_logprob,
               CASE WHEN s.n_bigrams > 0
                    THEN (CAST(s.s AS DOUBLE) / 1000000.0) / s.n_bigrams
                    ELSE 0.0 END AS avg_logprob
        FROM documents d LEFT JOIN scored s USING (doc_id)""",
)
def q110(spark, sf_dir):
    """Corpus-trained bigram-LM scoring: the model is two aggregate
    tables built from the same scan being scored — one query, no
    driver-side artifact. See the operator docstring for the 100 TB
    shape (Zipf-skewed count joins → AQE skew handling; counts become
    incremental ingest artifacts via the matview machinery)."""
    docs = load_table(spark, sf_dir, "documents")
    return text_analysis.bigram_lm_score(docs)


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing — see sampling.temperature_mix.
# ---------------------------------------------------------------------------
@query(
    "q111_temperature_mix",
    """WITH n AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
        w AS (SELECT source, n_s,
                     CAST(floor(sqrt(n_s) * 1000000.0) AS BIGINT) AS w_micro
              FROM n),
        d AS (SELECT sum(w_micro) AS denom, sum(n_s) AS n_total FROM w),
        t AS (SELECT w.source,
                     CAST(floor((CAST(w.w_micro AS DOUBLE)
                                 * floor(d.n_total * 0.5))
                                / CAST(d.denom AS DOUBLE)) AS BIGINT)
                       AS source_target
              FROM w CROSS JOIN d),
        r AS (SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(coalesce(text, '')), doc_id) AS mix_rank
              FROM documents)
        SELECT r.doc_id, r.source, r.mix_rank, t.source_target
        FROM r JOIN t USING (source)
        WHERE r.mix_rank <= t.source_target""",
)
def q111(spark, sf_dir):
    """α = 0.5 source mixing over half the corpus: head sources are
    flattened toward sqrt-proportional shares, tail sources boosted.
    Allocation is a |sources|-row broadcast; the only corpus-wide cost
    is the q97-style content-hash rank window."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.temperature_mix(docs, budget_frac=0.5)


# ---------------------------------------------------------------------------
# Incremental-ingest novelty: which incoming documents are NOT already
# in the reference corpus, by canonical content fingerprint. The
# reference/incoming split reuses the deterministic train-split buckets
# (q64) so the scenario is reproducible without a second table.
# ---------------------------------------------------------------------------
@query(
    "q112_novel_against_corpus",
    f"""WITH fp AS (
          SELECT doc_id,
                 substring(md5(text), 1, 2) AS b,
                 md5(array_to_string(list_sort({sql_ts_tokens('text')}), ' '))
                   AS fingerprint
          FROM documents),
        ref AS (SELECT DISTINCT fingerprint FROM fp WHERE b < 'e6'),
        inc AS (SELECT doc_id, fingerprint FROM fp WHERE b >= 'e6')
        SELECT i.doc_id, i.fingerprint
        FROM inc i
        WHERE NOT EXISTS (SELECT 1 FROM ref r
                          WHERE r.fingerprint = i.fingerprint)""",
)
def q112(spark, sf_dir):
    """The de-facto ingest gate at 100 TB: every new batch is
    fingerprint-anti-joined against the corpus index before any
    expensive scoring runs. The anti-join shuffles both sides on an
    md5 key (uniform, skew-free); Spark's runtime Bloom-filter join
    pushes reference membership below the incoming side's shuffle, and
    in steady state the reference fingerprint set is a ledger-table
    ingest artifact, not a rescan (ingest/ledger.py)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = text_analysis.with_fingerprint(text_analysis.with_train_split(docs))
    ref = fp.filter(F.col("split") == "train").select("fingerprint").distinct()
    inc = fp.filter(F.col("split") != "train").select("doc_id", "fingerprint")
    return inc.join(ref, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )
