"""Ranked retrieval over the corpus: BM25 scoring and hybrid
(lexical + semantic) fusion.

The reference's query surface stops at boolean full-text match
(PostgreSQL ``@@ to_tsquery``, reference ``init.sql:144-146`` — see
``functions/text.py`` for the tokenizer parity story); a training-data
pipeline additionally needs RANKED retrieval — "give me the best k
documents for this probe" — for eval-set mining, hard-negative mining,
and corpus inspection. This module adds the two standard shapes:

- :func:`bm25_scores` — Okapi BM25 (Robertson et al., TREC-3), the
  classic sparse ranker.
- :func:`rrf_fuse` — reciprocal-rank fusion (Cormack et al., SIGIR'09)
  of any two ranked lists, used here to fuse BM25 with embedding
  cosine into a hybrid retriever.

Scale design: every step is a columnar expression over one corpus scan.
Per-term term-frequencies are ``size(filter(tokens, t = term))`` inside
one projection (no explode, no per-term shuffle); the corpus-level
statistics (N, avgdl, per-term document frequency) reduce to ONE tiny
aggregate row that is broadcast back over the scan — so the whole
scorer is scan → 1-row agg → broadcast-join → projection → top-k
(TakeOrderedAndProject), with no wide shuffle anywhere. At 100 TB the
only full-data pass is the scan itself, and the driver never holds more
than the stats row + the k results.

Determinism contract (drives the DuckDB oracle): within-row arithmetic
on IEEE doubles is exactly rounded, so identical expression trees give
bit-identical scores on any engine; the only transcendental (ln in the
idf) is rounded to 6 decimals on both sides before use, and there is NO
cross-row float accumulation anywhere (the per-document score sums a
fixed, ordered list of per-term contributions inside one row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(toks, term: str):
    # |toks| − |toks \ {term}| ≡ count of ``term`` in ``toks`` — the
    # same integer ``size(filter(toks, t -> t = term))`` computed, but
    # ``array_remove`` is a codegen'd collection expression where the
    # ``filter`` higher-order function is CodegenFallback: every call
    # ran the row interpreter over the whole token array (r11b, guide
    # §4.1 "prefer built-ins"; q222 evaluates 16 of these per row per
    # consumer).  NULL array → NULL either way; ``term`` is never NULL
    # (literal) and tokens are never NULL (regexp output), so the
    # null-element caveats of array_remove are unreachable.
    return F.size(toks) - F.size(F.array_remove(toks, term))


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Score every document against ``terms``; returns
    ``(id_col, bm25)`` for documents with a positive score.

    idf uses the "+1" (Lucene-style, never-negative) variant:
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``, rounded to 6 decimals.
    """
    toks_col = tokens(text_col)
    base = df.select(F.col(id_col), toks_col.alias("_toks"))
    dl = F.size("_toks")

    # ONE corpus-stats row: N, Σdl, df per term — broadcast back over
    # the scan (the q86 winsorize pattern); no collect, no extra pass.
    stat_aggs = [
        F.count("*").alias("_n"),
        F.sum(dl.cast("long")).alias("_sumdl"),
    ]
    for i, t in enumerate(terms):
        stat_aggs.append(
            F.sum((_tf(F.col("_toks"), t) > 0).cast("long")).alias(f"_df{i}")
        )
    stats = base.agg(*stat_aggs)

    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    contribs = []
    for i, t in enumerate(terms):
        tf = _tf(F.col("_toks"), t).cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.round(
            F.log(
                F.lit(1.0)
                + (F.col("_n").cast("double") - dfreq + F.lit(0.5))
                / (dfreq + F.lit(0.5))
            ),
            6,
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * (dl.cast("double") / avgdl)
        )
        contribs.append(idf * ((tf * F.lit(k1 + 1.0)) / denom))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return (
        scored.withColumn("bm25", F.round(score, 6))
        .filter(F.col("bm25") > 0)
        .select(id_col, "bm25")
    )


def sql_bm25_scores(
    terms: Sequence[str],
    text_expr: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`bm25_scores` — same expression tree so the
    doubles are bit-identical (see module docstring)."""
    toks = sql_tokens(text_expr)
    tf = lambda t: f"len(list_filter(_toks, x -> x = '{t}'))"  # noqa: E731
    df_cols = ",\n               ".join(
        f"SUM(CASE WHEN {tf(t)} > 0 THEN 1 ELSE 0 END) AS _df{i}"
        for i, t in enumerate(terms)
    )
    contribs = []
    for i, t in enumerate(terms):
        idf = (
            f"round(ln(1.0 + (CAST(_n AS DOUBLE) - CAST(_df{i} AS DOUBLE)"
            f" + 0.5) / (CAST(_df{i} AS DOUBLE) + 0.5)), 6)"
        )
        tfd = f"CAST({tf(t)} AS DOUBLE)"
        denom = (
            f"({tfd} + {k1!r} * (1.0 - {b!r} + {b!r} *"
            f" (CAST(len(_toks) AS DOUBLE) / _avgdl)))"
        )
        contribs.append(f"{idf} * (({tfd} * {k1 + 1.0!r}) / {denom})")
    score = " + ".join(contribs)
    return f"""
        WITH _b AS (SELECT {id_col}, {toks} AS _toks FROM {table}),
        _s AS (SELECT COUNT(*) AS _n, SUM(len(_toks)) AS _sumdl,
               {df_cols}
               FROM _b),
        _j AS (SELECT _b.*, _s.*,
                      CAST(_sumdl AS DOUBLE) / CAST(_n AS DOUBLE) AS _avgdl
               FROM _b, _s)
        SELECT {id_col}, round({score}, 6) AS bm25
        FROM _j WHERE round({score}, 6) > 0"""


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document characteristic terms: top-k tokens by tf·idf —
    the corpus-inspection primitive (domain tagging, cluster naming,
    index-term selection) BM25's query-at-a-time shape doesn't cover.

    tf is the raw in-document count; idf is the smoothed
    ``ln((N+1)/(df_t+1)) + 1`` (never negative, defined for df_t = N),
    rounded to 6 decimals — the module's ln-portability rule. The
    score is one double product of an exact integer and the rounded
    idf, so it is bit-identical across engines; ties break on the term.

    Scale shape: explode → partial-aggregated ``groupBy(doc, term)``
    for tf, ``groupBy(term)`` over that (already-reduced) table for
    document frequency, an equi-join back on ``term`` (AQE broadcasts
    it when the vocabulary is small; at 100 TB it is a plain shuffle
    join on the term — never a driver collect), and one window on the
    doc id whose rank predicate keeps only the k winners.
    """
    toks = tokens(text_col)
    tok = df.select(
        F.col(id_col), F.explode(toks).alias("term")
    )
    # tf feeds TWO consumers (the per-term document frequency and the
    # scoring join) — without a barrier the tokenize+explode+shuffle
    # lineage ran once per consumer (r11b, guide §2.3; interleaved A/B
    # at sf0.1: 1.21 → 0.88 s wall, rows identical).  The (doc, term,
    # tf) table is the reduced post-aggregation relation, the same
    # persist-between-stages discipline as the dedup shingle tables.
    tf = (
        tok.groupBy(id_col, "term")
        .agg(F.count("*").alias("_tf"))
        .localCheckpoint(eager=False)
    )
    dfq = tf.groupBy("term").agg(F.count("*").alias("_df_t"))
    n = df.agg(F.count("*").alias("_n"))
    idf = F.round(
        F.log(
            (F.col("_n").cast("double") + F.lit(1.0))
            / (F.col("_df_t").cast("double") + F.lit(1.0))
        )
        + F.lit(1.0),
        6,
    )
    scored = (
        tf.join(dfq, on="term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("term"),
            (F.col("_tf").cast("double") * idf).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return scored.withColumn("kw_rank", F.row_number().over(w)).filter(
        F.col("kw_rank") <= k
    )


def sql_tfidf_keywords(
    k: int = 5,
    text_expr: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`tfidf_keywords` — same expression tree."""
    toks = sql_tokens(text_expr)
    return f"""
        WITH _tok AS (SELECT {id_col}, unnest({toks}) AS term
                      FROM {table}),
        _tf AS (SELECT {id_col}, term, count(*) AS _tf
                FROM _tok GROUP BY {id_col}, term),
        _dfq AS (SELECT term, count(*) AS _df_t FROM _tf GROUP BY term),
        _n AS (SELECT count(*) AS _n FROM {table}),
        _scored AS (
          SELECT _tf.{id_col}, _tf.term,
                 CAST(_tf._tf AS DOUBLE) *
                 round(ln((CAST(_n._n AS DOUBLE) + 1.0)
                          / (CAST(_dfq._df_t AS DOUBLE) + 1.0)) + 1.0, 6)
                     AS tfidf
          FROM _tf JOIN _dfq USING (term), _n)
        SELECT {id_col}, term, tfidf, kw_rank
        FROM (SELECT *, row_number() OVER (
                          PARTITION BY {id_col}
                          ORDER BY tfidf DESC, term) AS kw_rank
              FROM _scored)
        WHERE kw_rank <= {k}"""


def hard_negative_pairs(
    docs: DataFrame,
    emb: DataFrame,
    k_top: int = 20,
    jaccard_min: float = 0.02,
    cosine_max: float = 0.0,
    shingle_df_cap: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 3,
    shingles_df: DataFrame | None = None,
    hot_df: DataFrame | None = None,
) -> DataFrame:
    """Hard-negative mining for retrieval training: document pairs that
    are LEXICALLY close (word-k-gram Jaccard ≥ ``jaccard_min``) but
    SEMANTICALLY far (embedding cosine ≤ ``cosine_max``) — the
    "looks relevant, isn't" pairs contrastive training needs most.

    Pipeline: shingle posting lists → **stop-shingle cap** (shingles
    appearing in more than ``shingle_df_cap`` documents are dropped
    from the posting join — the standard bound that keeps the
    candidate-pair fanout linear in corpus size at mining-level
    thresholds, where AllPairs prefix filtering has no bite) → pair
    common counts → Jaccard against the FULL per-doc shingle sizes
    (so the cap only ever shrinks `common`, never inflates a score) →
    embedding join on both sides (zero-norm vectors excluded) → score
    ``jaccard − cosine`` descending, deterministic (id_a, id_b)
    tiebreak, TakeOrderedAndProject top-k.

    Every arithmetic step is engine-exact (integer-ratio Jaccard;
    cosine rounded to 6 dp per the module's portability rule), so the
    gate oracle hash-matches bitwise.
    """
    from ..functions.vectors import dot, indexable_vector, l2_norm
    from .dedup import with_shingles

    # ``shingles_df``: the prebuilt/persisted posting table shared
    # across the dedup family (an ingest artifact); built per-query
    # only when absent — same contract as ngram_jaccard_pairs.
    sh = (
        shingles_df
        if shingles_df is not None
        else with_shingles(docs, text_col, id_col, k).localCheckpoint(
            eager=False
        )
    )
    sizes = sh.select(
        F.col(id_col).alias("_id"), F.size("shingles").alias("_n")
    )
    ex = sh.select(
        F.col(id_col), F.explode_outer("shingles").alias("s")
    ).filter(F.col("s").isNotNull())
    # stop-shingle bound as a broadcast ANTI-join against the HOT set
    # (DF > cap): the kept set is posting-table-sized (equi-joining it
    # shuffles the whole posting table — the r8 q224 A/B measured the
    # difference at ~0.7 s on sf0.1), while Zipf keeps the over-cap
    # head to a handful of shingles at any sane cap.  ``hot_df``: the
    # persisted ingest-time statistic (pipeline_queries.
    # hot_shingles_prebuilt) — pass it to move even the DF count out
    # of the timed query.
    hot = (
        hot_df
        if hot_df is not None
        else ex.groupBy("s")
        .agg(F.count("*").alias("_df_s"))
        .filter(F.col("_df_s") > shingle_df_cap)
        .select("s")
    )
    ex = ex.join(F.broadcast(hot), on="s", how="left_anti")
    a = ex.select(F.col(id_col).alias("id_a"), "s")
    b = ex.select(F.col(id_col).alias("id_b"), "s")
    common = (
        a.join(b, on="s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_common"))
    )
    jac = (
        common.join(
            sizes.withColumnRenamed("_id", "id_a").withColumnRenamed(
                "_n", "_na"
            ),
            on="id_a",
        )
        .join(
            sizes.withColumnRenamed("_id", "id_b").withColumnRenamed(
                "_n", "_nb"
            ),
            on="id_b",
        )
        .withColumn(
            "jaccard",
            F.col("_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= jaccard_min)
    )
    # Per-VECTOR norms, hoisted below the pair join (guide §1.2 /
    # first-principles): `cosine_similarity` per pair re-folds each
    # embedding THREE times (dot + two l2 norms) per candidate pair,
    # where the norm depends only on the vector — |vectors| folds, not
    # |pairs|.  The joined row carries the scalar norm; the pair leg
    # keeps exactly one fold (the dot).  Bit-identical: the same IEEE
    # operations in the same order (l2(a)*l2(b) per pair ≡ the product
    # of the per-row norms), verified null-safe-equal on the real
    # corpus; zero-norm vectors were already excluded by
    # indexable_vector, so no new division edge.  Linear-in-|pairs|
    # work drops ~3× at 100× pair counts.
    ea = emb.filter(indexable_vector(F.col(emb_col))).select(
        F.col(vec_id_col).alias("id_a"),
        F.col(emb_col).alias("_ea"),
        l2_norm(F.col(emb_col)).alias("_nrm_a"),
    )
    eb = emb.filter(indexable_vector(F.col(emb_col))).select(
        F.col(vec_id_col).alias("id_b"),
        F.col(emb_col).alias("_eb"),
        l2_norm(F.col(emb_col)).alias("_nrm_b"),
    )
    scored = (
        jac.join(ea, on="id_a")
        .join(eb, on="id_b")
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("_ea"), F.col("_eb"))
                / (F.col("_nrm_a") * F.col("_nrm_b")),
                6,
            ),
        )
        .filter(F.col("cosine") <= cosine_max)
        .select(
            "id_a",
            "id_b",
            F.round("jaccard", 6).alias("jaccard"),
            "cosine",
            F.round(F.col("jaccard") - F.col("cosine"), 6).alias(
                "hn_score"
            ),
        )
    )
    return scored.orderBy(
        F.col("hn_score").desc(), "id_a", "id_b"
    ).limit(k_top)


def sql_hard_negative_pairs(
    toks_sql: str,
    k_top: int = 20,
    jaccard_min: float = 0.02,
    cosine_max: float = 0.0,
    shingle_df_cap: int = 1000,
) -> str:
    """DuckDB twin of :func:`hard_negative_pairs` (k=3 shingles)."""
    from ..functions.vectors import sql_cosine, sql_indexable

    cos = sql_cosine("ea.embedding", "eb.embedding")
    return f"""
    WITH toks AS (SELECT doc_id, {toks_sql} AS t FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                      AS shingles
           FROM toks WHERE len(t) >= 3),
    ex0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    kept AS (SELECT s FROM ex0 GROUP BY s
             HAVING count(*) <= {shingle_df_cap}),
    ex AS (SELECT ex0.* FROM ex0 JOIN kept USING (s)),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS _common
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    jac AS (SELECT id_a, id_b,
                   _common::DOUBLE / (sa.n + sb.n - _common) AS jaccard
            FROM pairs
            JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sa
                 ON sa.doc_id = id_a
            JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sb
                 ON sb.doc_id = id_b
            WHERE _common::DOUBLE / (sa.n + sb.n - _common)
                  >= {jaccard_min!r}),
    scored AS (SELECT id_a, id_b, round(jaccard, 6) AS jaccard,
                      round({cos}, 6) AS cosine,
                      round(jaccard - round({cos}, 6), 6) AS hn_score
               FROM jac
               JOIN embeddings ea ON ea.vec_id = id_a
                    AND {sql_indexable('ea.embedding')}
               JOIN embeddings eb ON eb.vec_id = id_b
                    AND {sql_indexable('eb.embedding')}
               WHERE round({cos}, 6) <= {cosine_max!r})
    SELECT * FROM scored
    ORDER BY hn_score DESC, id_a, id_b LIMIT {k_top}"""


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (full outer — an item
    present in one list only still gets that list's contribution):

        rrf = Σ_lists 1/(k + rank_list)

    Ranks are dense over (score DESC, id ASC) so they are deterministic
    under ties; the fused score is a two-term within-row sum of exact
    reciprocals — engine-portable without decimal tricks. Each input is
    ranked with a single global sort of the (already small) candidate
    list; fusion is one equi-join on the id.
    """
    # the fused inputs are already top-k candidate lists, so the
    # single-partition rank is k-bounded by construction; the constant
    # partition key documents that intent (the optimizer prunes the
    # foldable key — the retrieval family keeps no data-sized
    # unpartitioned window anywhere)
    wa = Window.partitionBy(F.lit(0)).orderBy(
        F.col(score_a).desc(), F.col(id_col).asc()
    )
    wb = Window.partitionBy(F.lit(0)).orderBy(
        F.col(score_b).desc(), F.col(id_col).asc()
    )
    ra = ranked_a.select(id_col, F.row_number().over(wa).alias("_ra"))
    rb = ranked_b.select(id_col, F.row_number().over(wb).alias("_rb"))
    fused = ra.join(rb, on=id_col, how="full")
    contrib = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col(c))
    ).otherwise(F.lit(0.0))
    return fused.select(
        id_col,
        F.round(contrib("_ra") + contrib("_rb"), 6).alias("rrf"),
    )


#: Per-rank nDCG discounts ``1/log2(rank+1)`` for k=10, frozen as 6 dp
#: literals so neither engine evaluates a transcendental at runtime
#: (the house ln rule in its strongest form — the constant is
#: precomputed once, offline).
NDCG_DISC_10 = (
    "1.0", "0.63093", "0.5", "0.430677", "0.386853",
    "0.356207", "0.333333", "0.315465", "0.30103", "0.289065",
)


def grouped_bm25_ndcg(
    docs: DataFrame,
    query_terms: Sequence[Sequence[str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-query nDCG@k of the BM25 ranking over a QUERY RELATION —
    the grouped generalization of the single-query eval (q219 stays
    the frozen oracle anchor; this is the operator a retrieval team
    actually runs: one row of ``(query_id, n_relevant, dcg, idcg,
    ndcg)`` per query).

    Relevance is graded and deterministic: ``rel`` = number of the
    query's terms the document contains (so the metric is
    hash-checkable end to end); gain is ``2^rel − 1``; discounts are
    the PRE-FROZEN ``NDCG_DISC_10`` decimal literals.

    Engine-exactness: each per-term BM25 contribution is the same
    within-row double tree as :func:`bm25_scores`; the per-query score
    is a within-row sum over that query's FIXED term list (never a
    cross-row float accumulation), rounded to 6 dp; DCG/IDCG are
    DECIMAL sums of integer-gain × frozen-decimal-discount products.

    Scale shape: ONE corpus scan projects per-term tfs; the corpus
    stats (N, Σdl, per-term df) reduce to a single broadcast row; the
    per-query (score, rel) rows come from exploding a CONSTANT-width
    array of structs (|queries| entries — linear, codegen'd, no join);
    the two ``row_number() <= k`` filters over
    ``Window.partitionBy(query_id)`` compile to WindowGroupLimit
    (partial per-partition top-k BEFORE the shuffle, pinned in
    tests/test_plans.py), so at 100 TB each executor forwards at most
    k rows per query rather than sorting the full matched set.
    """
    all_terms = sorted({t for terms in query_terms for t in terms})
    toks_col = tokens(text_col)
    # ONE tokenize pass into a NARROW (id, dl, tf per term) integer
    # frame, lazily checkpointed (r11b, guide §2.3/§5): the previous
    # shape re-ran tokenize + 16 per-term scans once per consumer
    # (stats + dcg + idcg + n_relevant = 4 corpus passes), and each
    # _tf was an interpreted ``filter`` HOF.  The tf frame is
    # |docs| × (2 + |terms|) ints — the guide-§8 lightweight proxy —
    # so every downstream branch reads integers only, and at 100 TB
    # the corpus text is scanned exactly once.  The A/B at sf0.1:
    # 2.37 → 1.58 s wall, rows identical (tf counts are integers, so
    # no float-order hazard is introduced by the restructure).
    base = (
        docs.select(F.col(id_col), toks_col.alias("_toks"))
        .select(
            F.col(id_col),
            F.size("_toks").alias("_dl"),
            *[
                _tf(F.col("_toks"), t).alias(f"_tf{i}")
                for i, t in enumerate(all_terms)
            ],
        )
        .localCheckpoint(eager=False)
    )
    dl = F.col("_dl")

    stat_aggs = [
        F.count("*").alias("_n"),
        F.sum(dl.cast("long")).alias("_sumdl"),
    ]
    for i, _t in enumerate(all_terms):
        stat_aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
        )
    stats = base.agg(*stat_aggs)
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")

    def contrib(t: str):
        i = all_terms.index(t)
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.round(
            F.log(
                F.lit(1.0)
                + (F.col("_n").cast("double") - dfreq + F.lit(0.5))
                / (dfreq + F.lit(0.5))
            ),
            6,
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * (dl.cast("double") / avgdl)
        )
        return idf * ((tf * F.lit(k1 + 1.0)) / denom)

    per_q = []
    for terms in query_terms:
        qid = " ".join(terms)
        score = contrib(terms[0])
        rel = (F.col(f"_tf{all_terms.index(terms[0])}") > 0).cast("int")
        for t in terms[1:]:
            score = score + contrib(t)
            rel = rel + (F.col(f"_tf{all_terms.index(t)}") > 0).cast("int")
        per_q.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                F.round(score, 6).alias("bm25"),
                rel.alias("rel"),
            )
        )
    scored = (
        j.select(F.col(id_col), F.explode(F.array(*per_q)).alias("_s"))
        .select(id_col, "_s.*")
        # integer predicate (no float-rounding edge): a doc is in a
        # query's stream iff it contains ≥1 of that query's terms
        .where(F.col("rel") > 0)
        # three consumers (dcg, idcg, n_relevant) hang off this node
        # and each re-runs the score projection — DELIBERATELY not
        # checkpointed: the matched set is corpus-scale here (common
        # terms match most docs), and an r8 A/B measured materializing
        # it SLOWER than the re-scans (2.35 s → 3.13 s at sf0.1) —
        # the opposite economics of q233's 256-row edge list.  Since
        # r11b the re-run is cheap by construction anyway: it reads
        # the checkpointed integer tf frame, never the corpus text.
    )

    disc = F.array(*[F.lit(d).cast("decimal(8,6)") for d in NDCG_DISC_10[:k]])
    gain = F.expr("shiftleft(1, rel) - 1")
    w_score = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), id_col
    )
    w_rel = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), id_col
    )
    dcg = (
        scored.withColumn("rk", F.row_number().over(w_score))
        .where(F.col("rk") <= k)
        .groupBy("query_id")
        .agg(F.sum(gain * F.element_at(disc, F.col("rk"))).alias("_dcg"))
    )
    idcg = (
        scored.withColumn("rk", F.row_number().over(w_rel))
        .where(F.col("rk") <= k)
        .groupBy("query_id")
        .agg(F.sum(gain * F.element_at(disc, F.col("rk"))).alias("_idcg"))
    )
    nrel = scored.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_relevant")
    )
    return (
        nrel.join(dcg, "query_id")
        .join(idcg, "query_id")
        .select(
            "query_id",
            "n_relevant",
            F.round(F.col("_dcg").cast("double"), 6).alias("dcg"),
            F.round(F.col("_idcg").cast("double"), 6).alias("idcg"),
            F.when(
                F.col("_idcg") > 0,
                F.round(
                    F.col("_dcg").cast("double")
                    / F.col("_idcg").cast("double"),
                    6,
                ),
            ).alias("ndcg"),
        )
    )


def sql_grouped_bm25_ndcg(
    query_terms: Sequence[Sequence[str]],
    k: int = 10,
    text_expr: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`grouped_bm25_ndcg` — identical expression
    trees (within-row double arithmetic, frozen decimal discounts)."""
    toks = sql_tokens(text_expr)
    all_terms = sorted({t for terms in query_terms for t in terms})
    tf = lambda t: f"len(list_filter(_toks, x -> x = '{t}'))"  # noqa: E731
    df_cols = ",\n               ".join(
        f"SUM(CASE WHEN {tf(t)} > 0 THEN 1 ELSE 0 END) AS _df{i}"
        for i, t in enumerate(all_terms)
    )

    def contrib(t: str) -> str:
        i = all_terms.index(t)
        idf = (
            f"round(ln(1.0 + (CAST(_n AS DOUBLE) - CAST(_df{i} AS DOUBLE)"
            f" + 0.5) / (CAST(_df{i} AS DOUBLE) + 0.5)), 6)"
        )
        tfd = f"CAST({tf(t)} AS DOUBLE)"
        denom = (
            f"({tfd} + {k1!r} * (1.0 - {b!r} + {b!r} *"
            f" (CAST(len(_toks) AS DOUBLE) / _avgdl)))"
        )
        return f"{idf} * (({tfd} * {k1 + 1.0!r}) / {denom})"

    branches = []
    for terms in query_terms:
        qid = " ".join(terms)
        score = " + ".join(contrib(t) for t in terms)
        rel = " + ".join(
            f"CAST({tf(t)} > 0 AS INT)" for t in terms
        )
        branches.append(
            f"SELECT '{qid}' AS query_id, {id_col},"
            f" round({score}, 6) AS bm25, {rel} AS rel FROM _j"
        )
    union = "\n      UNION ALL ".join(branches)
    disc = (
        "[" + ", ".join(NDCG_DISC_10[:k]) + "]::DECIMAL(8,6)[]"
    )
    return f"""
    WITH _b AS (SELECT {id_col}, {toks} AS _toks FROM {table}),
    _s AS (SELECT COUNT(*) AS _n, SUM(len(_toks)) AS _sumdl,
           {df_cols}
           FROM _b),
    _j AS (SELECT _b.*, _s.*,
                  CAST(_sumdl AS DOUBLE) / CAST(_n AS DOUBLE) AS _avgdl
           FROM _b, _s),
    scored0 AS ({union}),
    scored AS (SELECT * FROM scored0 WHERE rel > 0),
    ranked AS (SELECT query_id, rel,
                      row_number() OVER (PARTITION BY query_id
                          ORDER BY bm25 DESC, {id_col}) AS rk
               FROM scored),
    ideal AS (SELECT query_id, rel,
                     row_number() OVER (PARTITION BY query_id
                         ORDER BY rel DESC, {id_col}) AS rk
              FROM scored),
    dcg AS (SELECT query_id,
                   sum(((1 << rel) - 1) * ({disc})[rk]) AS _dcg
            FROM ranked WHERE rk <= {k} GROUP BY query_id),
    idcg AS (SELECT query_id,
                    sum(((1 << rel) - 1) * ({disc})[rk]) AS _idcg
             FROM ideal WHERE rk <= {k} GROUP BY query_id),
    nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
             FROM scored GROUP BY query_id)
    SELECT query_id, n_relevant,
           round(CAST(_dcg AS DOUBLE), 6) AS dcg,
           round(CAST(_idcg AS DOUBLE), 6) AS idcg,
           CASE WHEN _idcg > 0
                THEN round(CAST(_dcg AS DOUBLE)
                           / CAST(_idcg AS DOUBLE), 6) END AS ndcg
    FROM nrel JOIN dcg USING (query_id) JOIN idcg USING (query_id)"""
