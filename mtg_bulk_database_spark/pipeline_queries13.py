"""Registry entries, round 8 (cont.): the curation-PLANNING layer —
the queries a data team runs BEFORE committing a training mix, each as
a hash-checked gate over the same deployed-artifact discipline as the
serving gates (q217/q221/q223/q230/q232-q236):

- q237: cross-source overlap matrix from MERGED MinHash signatures —
  the mergeable-sketch estimate of pairwise source Jaccard (which
  sources are re-crawls/mirrors of each other), portable md5 family.
- q238: tokenizer fertility per source under the FROZEN BPE merge
  table (q234's artifact) — the rollout QA table for a tokenizer
  change (tokens/word by domain).
- q239: one exponentiated-gradient step of DoReMi-style domain
  reweighting from the corpus bigram-LM excess loss — the mixture
  update a reweighting run would apply, integer-exact up to one
  floored exp per source.
- q240: UniMax-style epoch-capped token-budget allocation
  (waterfilling) — closed-form via one bounded window, pure integer.
- q241: IVF nprobe→recall@10 sweep against the brute-force oracle —
  the tuning table an ANN deployment reads to pick its probe width.

House exactness rules throughout: integer accumulation with single
final double divisions; the only transcendental (q239's exp) follows
the q121 floor-to-micro discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .functions.text import sql_tokens, tokens
from .registry import query

_TOKS = sql_tokens("text")


# ---------------------------------------------------------------------------
# q237 — cross-source overlap matrix from merged MinHash signatures.
# ---------------------------------------------------------------------------
_Q237_NUM_PERM = 64
_Q237_SEED = 13


def _q237_oracle() -> str:
    from .operators.dedup import _MERSENNE_31, _perm_params

    p = _MERSENNE_31
    mins = ",\n             ".join(
        f"min(({a}::BIGINT * h + {b}) % {p}) AS m{i}"
        for i, (a, b) in enumerate(
            _perm_params(_Q237_NUM_PERM, _Q237_SEED)
        )
    )
    match_sum = "\n               + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)"
        for i in range(_Q237_NUM_PERM)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS t FROM documents
    ), sh AS (
      SELECT source,
             list_distinct(list_transform(range(1, len(t)-1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
               AS shingles
      FROM toks WHERE len(t) >= 3
    ), hx AS (
      SELECT source,
             ('0x' || substr(md5(s),1,15))::BIGINT % {p} AS h
      FROM (SELECT source, unnest(shingles) AS s FROM sh)
    ), sig AS (
      SELECT source,
             {mins}
      FROM hx GROUP BY source
    )
    SELECT source_a, source_b, n_match,
           CAST(n_match AS DOUBLE) / {_Q237_NUM_PERM}.0 AS est_jaccard
    FROM (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST({match_sum} AS BIGINT) AS n_match
      FROM sig a JOIN sig b ON a.source < b.source) t"""


@query("q237_source_overlap_minhash", _q237_oracle())
def q237(spark, sf_dir):
    """Pairwise source-overlap estimation from MERGED MinHash
    signatures: each source's signature slot i is the min of
    perm_i(h(shingle)) over every shingle in the source — and because
    min(union) = min(minima), the per-source signature is a MERGEABLE
    sketch (the register-MAX argument of the HLL family, with min):
    per-document or per-partition signatures fold into the source
    signature with an elementwise min, never re-reading text.  The
    estimated Jaccard between two sources is the matching-slot
    fraction — the standard MinHash estimator, here over source-level
    shingle sets, answering "which sources are mirrors / re-crawls of
    each other" before committing a training mix.

    Exactness: the md5-derived portable hash family (q177's), so
    signatures are bit-identical across engines; n_match is integer
    and n_match/64 is an EXACT binary division (64 = 2^6) — no
    rounding seam anywhere.

    100 TB shape: one pass over the shingle table (shared, prebuilt —
    the same artifact q32/q95/q177/q233 read) into a |sources|-key
    partial-aggregated min — map-side combine reduces every partition
    to ≤ |sources| rows × 64 slots before the shuffle; the pairwise
    matrix is a self-join of a |sources|-row broadcast frame.  The
    all-pairs work is |sources|², never |docs|²."""
    from .operators.dedup import _MERSENNE_31, _perm_params, md5_60
    from .pipeline_queries import shingle_prebuilt_table

    p = _MERSENNE_31
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    sh = shingle_prebuilt_table(spark, sf_dir).join(docs, "doc_id")
    hx = sh.select(
        "source", F.explode("shingles").alias("s")
    ).select(
        "source", F.pmod(md5_60(F.col("s")), F.lit(p)).alias("h")
    )
    sig = hx.groupBy("source").agg(
        *[
            F.min(
                F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(p))
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(
                _perm_params(_Q237_NUM_PERM, _Q237_SEED)
            )
        ]
    )
    arr = F.array(*[f"m{i}" for i in range(_Q237_NUM_PERM)])
    sigs = sig.select("source", arr.alias("sig"))
    sa = sigs.select(
        F.col("source").alias("source_a"), F.col("sig").alias("sig_a")
    )
    sb = sigs.select(
        F.col("source").alias("source_b"), F.col("sig").alias("sig_b")
    )
    pairs = sa.join(
        F.broadcast(sb), F.col("source_a") < F.col("source_b")
    )
    n_match = F.aggregate(
        F.zip_with(
            "sig_a",
            "sig_b",
            lambda x, y: (x == y).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return pairs.select(
        "source_a",
        "source_b",
        n_match.alias("n_match"),
        (n_match.cast("double") / F.lit(float(_Q237_NUM_PERM))).alias(
            "est_jaccard"
        ),
    )


# ---------------------------------------------------------------------------
# q238 — tokenizer fertility per source under the frozen BPE merges.
# ---------------------------------------------------------------------------
def _q238_oracle() -> str:
    from .pipeline_queries12 import _q234_merge_chain

    chain = _q234_merge_chain(
        "(' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ')"
    )
    return f"""
    WITH w AS (
      SELECT source, unnest({_TOKS}) AS word FROM documents),
    wf AS (SELECT source, word, count(*) AS freq
           FROM w GROUP BY source, word),
    enc AS (
      SELECT source, freq,
             len(string_split(trim({chain}), ' ')) AS n_pieces
      FROM wf)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(sum(freq) AS BIGINT) AS n_words,
           CAST(sum(freq * n_pieces) AS BIGINT) AS n_subwords,
           CAST(sum(freq * n_pieces) AS DOUBLE)
             / CAST(sum(freq) AS DOUBLE) AS fertility
    FROM enc GROUP BY source"""


@query("q238_tokenizer_fertility", _q238_oracle())
def q238(spark, sf_dir):
    """Tokenizer-rollout QA: fertility (subword tokens per word) by
    source under the FROZEN BPE merge table — q234's deployed artifact
    applied per domain.  A tokenizer change ships with exactly this
    table: domains whose fertility jumps are the ones the new vocab
    serves badly (code, non-Latin transliterations), and the corpus
    token budget for q240 re-derives from n_subwords.

    Exactness: the merge fold is q234's static expression tree
    (literal replaces, identical in both engines); the census sums are
    integer, and fertility is ONE double division of two BIGINTs.

    100 TB shape: the fold runs over the (source, word) frequency
    relation — vocabulary-sized per source, Zipf-bounded, orders of
    magnitude smaller than the corpus — with zero Python and zero
    extra shuffle beyond the two map-side-combinable groupBys."""
    from .pipeline_queries12 import _q234_merge_chain

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select("source", F.explode(tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("freq"))
    )
    chain = _q234_merge_chain(
        "concat(' ', regexp_replace(word, '(.)', '$1 '), '</w> ')"
    )
    enc = wf.selectExpr(
        "source",
        "freq",
        f"size(split(trim({chain}), ' ')) AS n_pieces",
    )
    return enc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_distinct_words"),
        F.sum("freq").cast("long").alias("n_words"),
        F.sum(F.col("freq") * F.col("n_pieces"))
        .cast("long")
        .alias("n_subwords"),
        (
            F.sum(F.col("freq") * F.col("n_pieces")).cast("double")
            / F.sum("freq").cast("double")
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# q239 — one exponentiated-gradient step of domain reweighting.
# ---------------------------------------------------------------------------
#: EG step size; the update argument is eta * excess-loss (in nats) =
#: excess_micro / 1e7, computed as ONE double division.
_Q239_ETA = 0.1


def _q239_oracle() -> str:
    return f"""
    WITH tok AS (SELECT source, {_TOKS} AS l FROM documents),
    bg AS (
      SELECT source,
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
      SELECT b.source,
             CAST(floor(ln((c.c2 + 1.0) / (u.c1 + v.vocab))
                        * 1000000.0) AS BIGINT) AS term_micro
      FROM bg b
      JOIN bgc c USING (bg)
      JOIN unic u ON u.t = string_split(b.bg, ' ')[1]
      CROSS JOIN v),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(term_micro) AS BIGINT) AS s_micro
      FROM terms GROUP BY source),
    tot AS (
      SELECT CAST(sum(n_bigrams) AS BIGINT) AS n_tot,
             CAST(sum(s_micro) AS BIGINT) AS s_tot
      FROM g),
    e AS (
      SELECT source, n_bigrams,
             (-s_micro) // n_bigrams AS nll_micro,
             (-s_micro) // n_bigrams - (-s_tot) // n_tot AS excess_micro
      FROM g CROSS JOIN tot),
    u AS (
      SELECT source, n_bigrams, nll_micro, excess_micro,
             CAST(floor(1000000.0
                        * exp(CAST(excess_micro AS DOUBLE) / 10000000.0))
                  AS BIGINT) AS u_micro
      FROM e),
    tu AS (SELECT CAST(sum(u_micro) AS BIGINT) AS total_u FROM u)
    SELECT source, n_bigrams, nll_micro, excess_micro,
           (u_micro * 1000000) // total_u AS w_micro,
           CAST((u_micro * 1000000) // total_u AS DOUBLE)
             / 1000000.0 AS w_new
    FROM u CROSS JOIN tu"""


@query("q239_domain_reweight_eg", _q239_oracle())
def q239(spark, sf_dir):
    """One exponentiated-gradient step of DoReMi-style domain
    reweighting, hash-checked: each source's excess loss is its mean
    bigram-LM NLL minus the corpus mean (the q110 corpus-trained
    model, micro-nat floors), and the mixture update is
    w_i ∝ exp(eta·excess_i) from the uniform prior — upweight domains
    the reference LM finds hard, exactly the multiplicative-weights
    update a reweighting run applies between proxy-model rounds.

    Exactness: per-source NLL is integer (BIGINT sums of the floored
    micro-nat terms, then integer division — both operands
    non-negative, so Spark's truncating DIV and DuckDB's flooring //
    agree); the single transcendental follows the q121 discipline (ONE
    identical double as exp input, output floored to micro-integers —
    a divergence needs the true value within one ulp of a micro
    boundary), and normalization is pure integer division of micro
    weights, so Σw_micro ≤ 1e6 with the floor remainders dropped
    deterministically.

    100 TB shape: the LM is the q110 aggregate-table pair (corpus
    ingest artifacts at scale); scoring is the posting join q110
    already runs, and everything after ``g`` is |sources|-row algebra
    behind two 1-row broadcasts.  Sources with zero bigrams carry no
    loss signal and drop out of the mixture (both engines, by inner
    aggregation)."""
    # ONE fanned-out tokenize pass (r11b, guide §2.3): the previous
    # shape re-tokenized the corpus once per consumer — the bigram
    # stream feeds bgc AND terms, the unigram stream unic AND vocab,
    # so FOUR full tokenize scans ran per action, each serialized on
    # the local table's single row-group.  The checkpointed token
    # table is the persist-the-token-relation-between-stages
    # discipline the dedup family already uses; at 100 TB the corpus
    # text is read exactly once.  A/B at sf0.1: 1.95 → 1.60 s wall,
    # rows identical (everything downstream is integer algebra).
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select("source", tokens("text").alias("_l")).localCheckpoint(
        eager=False
    )
    # staged projections + explode_outer + null filter: the
    # InferFiltersFromGenerate re-evaluation trap documented in
    # text_analysis._bigrams — same shape here
    bg_arr = F.when(
        F.size("_l") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_l") - 2),
            lambda i: F.concat(
                F.get("_l", i), F.lit(" "), F.get("_l", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = toks.select("source", bg_arr.alias("_bg_arr"))
    bg = staged.select(
        "source", F.explode_outer("_bg_arr").alias("bg")
    ).filter(F.col("bg").isNotNull())

    uni = toks.select(F.explode("_l").alias("t"))
    unic = uni.groupBy("t").agg(F.count("*").alias("c1"))
    vocab = uni.agg(F.count_distinct("t").alias("vocab"))
    bgc = bg.groupBy("bg").agg(F.count("*").alias("c2"))
    terms = (
        bg.join(bgc, "bg")
        .withColumn("_w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(unic.withColumnRenamed("t", "_w1"), "_w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "term_micro",
            F.floor(
                F.log(
                    (F.col("c2") + F.lit(1.0))
                    / (F.col("c1") + F.col("vocab"))
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    g = terms.groupBy("source").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("term_micro").cast("long").alias("s_micro"),
    )
    tot = g.agg(
        F.sum("n_bigrams").cast("long").alias("n_tot"),
        F.sum("s_micro").cast("long").alias("s_tot"),
    )
    e = g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_bigrams",
        F.expr("(-s_micro) DIV n_bigrams").alias("nll_micro"),
        F.expr(
            "(-s_micro) DIV n_bigrams - (-s_tot) DIV n_tot"
        ).alias("excess_micro"),
    )
    u = e.select(
        "source",
        "n_bigrams",
        "nll_micro",
        "excess_micro",
        F.floor(
            F.lit(1000000.0)
            * F.exp(F.col("excess_micro").cast("double") / F.lit(1e7))
        )
        .cast("long")
        .alias("u_micro"),
    )
    tu = u.agg(F.sum("u_micro").cast("long").alias("total_u"))
    return u.crossJoin(F.broadcast(tu)).select(
        "source",
        "n_bigrams",
        "nll_micro",
        "excess_micro",
        F.expr("(u_micro * 1000000) DIV total_u").alias("w_micro"),
        (
            F.expr("(u_micro * 1000000) DIV total_u").cast("double")
            / F.lit(1000000.0)
        ).alias("w_new"),
    )


# ---------------------------------------------------------------------------
# q240 — UniMax-style epoch-capped token-budget allocation.
# ---------------------------------------------------------------------------
_Q240_CAP_EPOCHS = 2
#: budget = (39 * corpus_tokens) DIV 20 — 1.95× the corpus, so on a
#: near-uniform source mix roughly half the sources hit the 2-epoch
#: cap and the rest split the remainder (a non-degenerate waterline).
_Q240_BUDGET_NUM, _Q240_BUDGET_DEN = 39, 20


from .functions.exact import guarded_micro_ratio_sql as epochs_micro_sql  # noqa: E501  (re-export: the overflow-safe micro-ratio lives in functions.exact, a leaf module, so pipeline_queries10/14 can import it without circular edges)


def _q240_alloc_chain(counts_body: str) -> str:
    """CTE chain ``counts -> ... -> alloc`` (the closed-form
    waterfilling) over an arbitrary ``counts_body`` producing
    ``(source, n_tokens)`` — shared by q240 (whitespace tokens), q248
    (manifest materialization) and q249 (subword-count twin) so the
    allocation algebra exists exactly once on the oracle side, the
    way :func:`epoch_capped_allocation` is the one Spark body."""
    c = _Q240_CAP_EPOCHS
    return f"""counts AS ({counts_body}),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_src
      FROM counts),
    f AS (
      SELECT source, n_tokens, total, n_src,
             ({_Q240_BUDGET_NUM} * total) // {_Q240_BUDGET_DEN} AS budget,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(sum({c} * n_tokens) OVER (ORDER BY n_tokens, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM counts CROSS JOIN tot
      WINDOW w AS (ORDER BY n_tokens, source)),
    p AS (
      SELECT *,
             CASE WHEN {c} * n_tokens * (n_src - i + 1)
                       <= budget - (cum - {c} * n_tokens)
                  THEN 1 ELSE 0 END AS pred
      FROM f),
    m AS (
      SELECT CAST(max(CASE WHEN pred = 1 THEN i ELSE 0 END) AS BIGINT)
               AS m,
             CAST(max(CASE WHEN pred = 1 THEN cum ELSE 0 END) AS BIGINT)
               AS cum_m
      FROM p),
    alloc AS (
      SELECT source, n_tokens,
             CASE WHEN i <= m THEN {c} * n_tokens
                  ELSE (budget - cum_m) // (n_src - m)
                       + CASE WHEN i - m <= (budget - cum_m)
                                            % (n_src - m)
                              THEN 1 ELSE 0 END
             END AS alloc_tokens,
             CASE WHEN i <= m THEN 1 ELSE 0 END AS capped
      FROM p CROSS JOIN m)"""


_Q240_COUNTS_BODY = f"""
      SELECT source,
             CAST(sum(coalesce(len({_TOKS}), 0)) AS BIGINT) AS n_tokens
      FROM documents WHERE source IS NOT NULL GROUP BY source"""


def _q240_oracle() -> str:
    return f"""
    WITH {_q240_alloc_chain(_Q240_COUNTS_BODY)}
    SELECT source, n_tokens, alloc_tokens, capped,
           {epochs_micro_sql("alloc_tokens", "n_tokens", "//")}
             AS epochs_micro,
           CAST({epochs_micro_sql("alloc_tokens", "n_tokens", "//")}
                AS DOUBLE) / 1000000.0 AS epochs
    FROM alloc"""


def source_token_counts(docs) -> "DataFrame":  # noqa: F821
    """Per-source whitespace-token totals — q240's corpus-wide input,
    and the SUM-mergeable state the streaming fold persists (see
    streaming.ingest.stream_fold_source_token_counts): per-batch
    partial sums merge to the corpus total by one more SUM."""
    return (
        docs.where(F.col("source").isNotNull())
        .select(
            "source",
            F.coalesce(F.size(tokens("text")), F.lit(0)).alias("nt"),
        )
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )


def epoch_capped_allocation(counts) -> "DataFrame":  # noqa: F821
    """The q240 waterfilling tail over an already-built (source,
    n_tokens) relation — shared verbatim by the batch gate and the
    streamed-state leg so streamed ≡ batch is the same expression
    tree, not a reimplementation."""
    from pyspark.sql import Window

    c = _Q240_CAP_EPOCHS
    tot = counts.agg(
        F.sum("n_tokens").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_src"),
    )
    w = Window.orderBy("n_tokens", "source")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "budget",
            F.expr(
                f"({_Q240_BUDGET_NUM} * total) DIV {_Q240_BUDGET_DEN}"
            ),
        )
        .withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum",
            F.sum(F.lit(c) * F.col("n_tokens")).over(wsum).cast("long"),
        )
    )
    p = f.withColumn(
        "pred",
        F.when(
            F.lit(c) * F.col("n_tokens") * (F.col("n_src") - F.col("i") + 1)
            <= F.col("budget") - (F.col("cum") - F.lit(c) * F.col("n_tokens")),
            1,
        ).otherwise(0),
    )
    m = p.agg(
        F.max(F.when(F.col("pred") == 1, F.col("i")).otherwise(0))
        .cast("long")
        .alias("m"),
        F.max(F.when(F.col("pred") == 1, F.col("cum")).otherwise(0))
        .cast("long")
        .alias("cum_m"),
    )
    alloc = p.crossJoin(F.broadcast(m)).select(
        "source",
        "n_tokens",
        F.expr(
            f"""CASE WHEN i <= m THEN {c} * n_tokens
                ELSE (budget - cum_m) DIV (n_src - m)
                     + CASE WHEN i - m <= (budget - cum_m)
                                          % (n_src - m)
                            THEN 1 ELSE 0 END
                END"""
        ).alias("alloc_tokens"),
        F.when(F.col("i") <= F.col("m"), 1).otherwise(0).alias("capped"),
    )
    epochs_micro = F.expr(
        epochs_micro_sql("alloc_tokens", "n_tokens", "DIV")
    )
    return alloc.select(
        "source",
        "n_tokens",
        "alloc_tokens",
        "capped",
        epochs_micro.alias("epochs_micro"),
        (epochs_micro.cast("double") / F.lit(1000000.0)).alias("epochs"),
    )


@query("q240_epoch_capped_allocation", _q240_oracle())
def q240(spark, sf_dir):
    """UniMax-style epoch-capped token-budget allocation, closed-form:
    given per-source token counts, a total budget of 1.95× the corpus
    and a 2-epoch repeat cap, give every source a uniform share except
    where the cap binds — the waterfilling solution, computed without
    iteration.  Sorted ascending by size, a source caps iff giving it
    and every larger source the cap-level share still fits the
    remaining budget (cap·n_i·(N−i+1) ≤ B − cum_{i−1}); the predicate
    is prefix-closed under that order, so the waterline m is one MAX
    and uncapped sources split (B − cum_m) by integer division, the
    remainder going one token each to the smallest uncapped sources —
    total allocation equals the budget EXACTLY, in pure BIGINT algebra
    (no floats anywhere; epochs_micro is one positive integer
    division).

    100 TB shape: the corpus-wide work is ONE map-side-combinable
    groupBy to count tokens per source (a SUM-mergeable ingest
    artifact — the streaming fold persists exactly this state);
    everything after is |sources|-row algebra — the running-sum window
    is over the source relation (bounded by source cardinality, NOT
    data volume; the q229 bounded-frame argument), behind two 1-row
    broadcasts.  NULL-source rows are excluded up front: an allocation
    row for "no source" is meaningless, and NULL orders differently
    across engines (the q229 NULLS FIRST/LAST seam)."""
    docs = load_table(spark, sf_dir, "documents")
    return epoch_capped_allocation(source_token_counts(docs))


# ---------------------------------------------------------------------------
# q241 — IVF nprobe→recall@10 sweep against the brute-force oracle.
# ---------------------------------------------------------------------------
_Q241_NPROBES = (1, 2, 4, 8)
_Q241_K = 10


def _q241_oracle() -> str:
    from .functions.vectors import sql_cosine, sql_indexable
    from .pipeline_queries10 import _Q217_CENTROIDS, _sql_cent

    cent_rows = ",\n        ".join(
        f"({i}, {_sql_cent(c)})" for i, c in enumerate(_Q217_CENTROIDS)
    )
    score_cols = ",\n             ".join(
        f"round({sql_cosine('embedding', _sql_cent(c))}, 6) AS s{i}"
        for i, c in enumerate(_Q217_CENTROIDS)
    )
    arr = "[" + ", ".join(f"s{i}" for i in range(len(_Q217_CENTROIDS))) + "]"
    probes = ",\n    ".join(
        f"""p{n} AS (
      SELECT vec_id FROM ac WHERE crank <= {n}
      ORDER BY qcos DESC, vec_id LIMIT {_Q241_K}),
    h{n} AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hit
      FROM p{n} JOIN exact USING (vec_id))"""
        for n in _Q241_NPROBES
    )
    legs = "\n      UNION ALL ".join(
        f"SELECT {n} AS nprobe, n_hit FROM h{n}" for n in _Q241_NPROBES
    )
    return f"""
    WITH q AS (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cents(idx, cent) AS (VALUES
        {cent_rows}),
    qs AS (
      SELECT idx, round({sql_cosine('cent', 'qv')}, 6) AS qscore
      FROM cents, q),
    cr AS (
      SELECT idx, CAST(row_number() OVER (ORDER BY qscore DESC, idx)
                       AS BIGINT) AS crank
      FROM qs),
    pool AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id <> 0 AND {sql_indexable('embedding')}),
    scored AS (
      SELECT vec_id, embedding,
             {score_cols}
      FROM pool),
    ac AS (
      SELECT s.vec_id,
             round({sql_cosine('s.embedding', 'q.qv')}, 4) AS qcos,
             c.crank
      FROM scored s JOIN cr c
        ON c.idx = CAST(list_position({arr}, list_aggregate({arr}, 'max'))
                        - 1 AS INT), q),
    exact AS (
      SELECT vec_id FROM ac ORDER BY qcos DESC, vec_id LIMIT {_Q241_K}),
    {probes}
    SELECT nprobe, n_hit,
           CAST(n_hit AS DOUBLE) / {_Q241_K}.0 AS recall
    FROM ({legs}) t"""


@query("q241_ivf_nprobe_sweep", _q241_oracle())
def q241(spark, sf_dir):
    """The IVF deployment-tuning table, hash-checked: recall@10 of the
    frozen-quantizer probe (q217 assignment + q221 probe) at nprobe ∈
    {1,2,4,8}, measured against the brute-force exact top-10 — the
    sweep an ANN rollout reads to pick the smallest probe width that
    clears its recall SLO, the q166 parameter-sweep pattern applied to
    the serving loop.

    Exactness: every score is the q221-proven float path (fold-exact
    cosines, rounded 6 dp for assignment / 4 dp for ranking, integer
    tie-breaks); recall is an integer intersection count over ONE
    final division.

    100 TB shape: the embedding column is scanned ONCE — assignment +
    query-cosine in one codegen'd projection against literal centroids
    (zero shuffles) — and the checkpointed (vec_id, qcos, crank) frame
    the sweep iterates over is three scalar columns; each sweep point
    is a TakeOrdered top-10 (no window, no re-scan of vectors) plus a
    10-row join.  Probe sets nest by construction (crank ≤ 1 ⊂ ≤ 2 ⊂
    ≤ 4 ⊂ ≤ 8), which is why ONE rank column serves all four points.
    At deployment scale the assigned table is list-partitioned at
    ingest (the q221 note), making each probe point a partition-pruned
    read — this gate keeps the self-contained inline form."""
    from .functions.vectors import indexable_vector, lit_cosine_scores
    from .pipeline_queries10 import _Q217_CENTROIDS, _cos_total

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    cents = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(_Q217_CENTROIDS)],
        "idx int, cent array<double>",
    )
    qs = cents.crossJoin(F.broadcast(qrow)).select(
        "idx",
        F.round(_cos_total(F.col("cent"), F.col("qv")), 6).alias("qscore"),
    )
    # rank of each centroid among the 8 without a window (TakeOrdered
    # can't label ranks): count strictly-better rows in an 8×8
    # broadcast self-join — metadata-scale
    better = qs.select(
        F.col("idx").alias("idx2"), F.col("qscore").alias("qscore2")
    )
    crank = (
        qs.join(
            F.broadcast(better),
            (F.col("qscore2") > F.col("qscore"))
            | (
                (F.col("qscore2") == F.col("qscore"))
                & (F.col("idx2") < F.col("idx"))
            ),
            "left",
        )
        .groupBy("idx")
        .agg((F.count("idx2") + 1).cast("long").alias("crank"))
        .select(F.col("idx").alias("list_id"), "crank")
    )
    pool = emb.where(
        (F.col("vec_id") != 0) & indexable_vector(F.col("embedding"))
    )
    # literal-codebook scores as one JVM-parsed SQL string (q217
    # discipline) — identical trees, ~1.2 s less construction per pass
    scores = lit_cosine_scores(
        "embedding", _Q217_CENTROIDS, round_dp=6, total=True
    )
    assigned = pool.crossJoin(F.broadcast(qrow)).select(
        "vec_id",
        (F.array_position(scores, F.array_max(scores)) - 1)
        .cast("int")
        .alias("list_id"),
        F.round(_cos_total(F.col("embedding"), F.col("qv")), 4).alias(
            "qcos"
        ),
    )
    # one scan of the wide embedding column; the sweep below iterates
    # over this three-scalar-column frame only (eager checkpoint: five
    # consumers — exact + four probe points — must not re-run the scan)
    ac = (
        assigned.join(F.broadcast(crank), "list_id")
        .select("vec_id", "qcos", "crank")
        .localCheckpoint(eager=True)
    )
    exact = (
        ac.orderBy(F.col("qcos").desc(), "vec_id")
        .limit(_Q241_K)
        .select("vec_id")
    )
    out = None
    for n in _Q241_NPROBES:
        probe = (
            ac.where(F.col("crank") <= n)
            .orderBy(F.col("qcos").desc(), "vec_id")
            .limit(_Q241_K)
            .select("vec_id")
        )
        leg = (
            probe.join(exact, "vec_id")
            .agg(F.count("*").cast("long").alias("n_hit"))
            .select(
                F.lit(n).cast("int").alias("nprobe"),
                "n_hit",
                (F.col("n_hit").cast("double") / F.lit(float(_Q241_K))).alias(
                    "recall"
                ),
            )
        )
        out = leg if out is None else out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# q242 — dedup-adjusted source mix: the token share each source would
# actually contribute under soft dedup (duplicate clusters count once).
# ---------------------------------------------------------------------------
def _q242_oracle() -> str:
    from .functions.text import sql_ts_tokens

    return f"""
    WITH fp AS (
      SELECT doc_id, source,
             coalesce(len({_TOKS}), 0) AS nt,
             md5(coalesce(
               array_to_string(list_sort({sql_ts_tokens('text')}), ' '),
               '')) AS fingerprint
      FROM documents),
    wtd AS (
      SELECT source, nt,
             (nt * 1000000)
               // count(*) OVER (PARTITION BY fingerprint) AS eff_micro
      FROM fp),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(eff_micro) AS BIGINT) AS eff_tokens_micro
      FROM wtd GROUP BY source),
    tot AS (SELECT CAST(sum(eff_tokens_micro) AS BIGINT) AS te FROM g)
    SELECT source, n_docs, n_tokens, eff_tokens_micro,
           CASE WHEN te > 0
                THEN CAST(eff_tokens_micro AS DOUBLE) / CAST(te AS DOUBLE)
           END AS eff_share
    FROM g CROSS JOIN tot"""


def dedup_mix_state(docs) -> "DataFrame":  # noqa: F821
    """q242's SUM-mergeable state: ``(source, fingerprint, nt,
    n_docs)`` — the finest grain at which the dedup-adjusted mix is
    incrementally maintainable.  The grain must carry ``nt`` because
    the per-document discount ``(nt·10⁶) DIV n_copies`` floors PER
    DOCUMENT: two docs with the same content fingerprint can have
    different raw token counts (repeats/stopwords don't change the
    distinct-token fingerprint), and summing nt before the DIV would
    change the floor.  Counts at this grain merge by plain SUM —
    per-batch partials add — which is what makes the streaming fold
    (``streaming.ingest.stream_fold_dedup_mix``) exact.  State size is
    bounded by distinct (source, fingerprint, nt) triples — in the
    worst case document-scale but tiny per row (two ints + a 32-char
    hash), and exactly the state any incremental dedup ledger keeps."""
    from .operators.text_analysis import with_fingerprint

    return (
        with_fingerprint(docs)
        .select(
            "source",
            F.coalesce(F.size(tokens("text")), F.lit(0)).alias("nt"),
            "fingerprint",
        )
        .groupBy("source", "fingerprint", "nt")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def dedup_adjusted_mix_from_state(state) -> "DataFrame":  # noqa: F821
    """q242's output table derived from the (merged) state relation —
    the tail the streaming leg shares with the equivalence tests.
    Global copy counts come from ONE fingerprint groupBy over the
    state (map-side combinable), joined back by fingerprint; every
    discount is the same integer algebra as the batch gate, so
    streamed ≡ batch row-exactly (pinned in
    tests/test_streaming_dedup_mix.py)."""
    copies = state.groupBy("fingerprint").agg(
        F.sum("n_docs").cast("long").alias("_nc")
    )
    j = state.join(copies, "fingerprint")
    g = j.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum(F.col("nt").cast("long") * F.col("n_docs"))
        .cast("long")
        .alias("n_tokens"),
        F.sum(
            F.expr("(CAST(nt AS BIGINT) * 1000000 DIV _nc) * n_docs")
        )
        .cast("long")
        .alias("eff_tokens_micro"),
    )
    tot = g.agg(F.sum("eff_tokens_micro").cast("long").alias("te"))
    return g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "eff_tokens_micro",
        F.when(
            F.col("te") > 0,
            F.col("eff_tokens_micro").cast("double")
            / F.col("te").cast("double"),
        ).alias("eff_share"),
    )


@query("q242_dedup_adjusted_mix", _q242_oracle())
def q242(spark, sf_dir):
    """The source-mix table the planner should actually read: per
    source, the token mass that survives SOFT dedup — every document
    down-weighted by 1/n_copies of its canonical content fingerprint
    (q119's gradient-equivalence weights), with copies counted ACROSS
    sources, so a mirror site's tokens are split with its original
    rather than double-counted.  q93's raw mix over-feeds duplicated
    sources; q237 tells you WHICH sources overlap; this gate prices
    the overlap into the mix — the input q239/q240 would consume in a
    dedup-aware plan.

    Exactness: the per-doc discount is (n_tokens·10⁶) DIV n_copies —
    positive integer division (truncation = floor in both engines) —
    summed as BIGINT per source; the share is ONE guarded double
    division (NULL on an all-empty corpus rather than an engine-
    specific 0/0).

    100 TB shape: one window shuffle keyed by the uniform md5
    fingerprint (skew-free by construction — q119's audited shape),
    one |sources|-key partial agg, one 1-row broadcast.  NULL sources
    form their own group (no ordering anywhere, so no NULLS seam)."""
    from pyspark.sql import Window

    from .operators.text_analysis import with_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    fp = with_fingerprint(docs).select(
        "source",
        F.coalesce(F.size(tokens("text")), F.lit(0)).alias("nt"),
        "fingerprint",
    )
    n_copies = F.count("*").over(Window.partitionBy("fingerprint"))
    wtd = fp.select(
        "source",
        "nt",
        F.expr("CAST(nt AS BIGINT) * 1000000").alias("_ntm"),
        n_copies.alias("_nc"),
    ).select(
        "source", "nt", F.expr("_ntm DIV _nc").alias("eff_micro")
    )
    g = wtd.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.sum("eff_micro").cast("long").alias("eff_tokens_micro"),
    )
    tot = g.agg(F.sum("eff_tokens_micro").cast("long").alias("te"))
    return g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "eff_tokens_micro",
        F.when(
            F.col("te") > 0,
            F.col("eff_tokens_micro").cast("double")
            / F.col("te").cast("double"),
        ).alias("eff_share"),
    )


# ---------------------------------------------------------------------------
# q243 — quality-budget curve: the filter operating-point table.
# ---------------------------------------------------------------------------
_Q243_TAUS = (0, 250_000, 500_000, 750_000)


def _q243_grid_ctes() -> str:
    """CTE chain ``scored -> s -> g -> grid`` — the per-τ operating-
    point table (τ, n_docs, n_tokens, p_sum, tot_tok), shared by q243
    (the curve) and q252 (budget→threshold inversion)."""
    from .pipeline_queries9 import _q213_scored_cte

    per_tau = ",\n        ".join(
        f"""CAST(coalesce(sum(CASE WHEN p_micro >= {t} THEN 1 END), 0)
             AS BIGINT) AS n{i},
        CAST(coalesce(sum(CASE WHEN p_micro >= {t}
                          THEN coalesce(n_tok, 0) END), 0)
             AS BIGINT) AS t{i},
        CAST(coalesce(sum(CASE WHEN p_micro >= {t} THEN p_micro END), 0)
             AS BIGINT) AS s{i}"""
        for i, t in enumerate(_Q243_TAUS)
    )
    legs = "\n      UNION ALL ".join(
        f"SELECT {t} AS tau_micro, n{i} AS n_docs, t{i} AS n_tokens,"
        f" s{i} AS p_sum, tot_tok FROM g"
        for i, t in enumerate(_Q243_TAUS)
    )
    return f"""{_q213_scored_cte()},
    s AS (
      SELECT n_tok, p_micro FROM scored WHERE p_micro IS NOT NULL),
    g AS (
      SELECT
        {per_tau},
        CAST(coalesce(sum(coalesce(n_tok, 0)), 0) AS BIGINT) AS tot_tok
      FROM s),
    grid AS ({legs})"""


def _q243_oracle() -> str:
    return f"""
    WITH {_q243_grid_ctes()}
    SELECT tau_micro, n_docs, n_tokens,
           CASE WHEN n_docs > 0 THEN p_sum // n_docs END AS mean_p_micro,
           CASE WHEN tot_tok > 0
                THEN CAST(n_tokens AS DOUBLE) / CAST(tot_tok AS DOUBLE)
           END AS tok_share
    FROM grid"""


def quality_budget_grid(docs) -> "DataFrame":  # noqa: F821
    """The per-τ operating-point grid (tau_micro, n_docs, n_tokens,
    p_sum, tot_tok) — ONE single-row aggregate of literal CASE arms
    over the q213 scoring projection, stacked to |τ| rows.  The Spark
    twin of ``_q243_grid_ctes``; shared by q243 and q252."""
    from .pipeline_queries9 import q213_scored

    s = q213_scored(docs).where(F.col("p_micro").isNotNull())
    aggs = []
    for i, t in enumerate(_Q243_TAUS):
        kept = F.col("p_micro") >= t
        aggs += [
            F.coalesce(F.sum(F.when(kept, 1)), F.lit(0))
            .cast("long")
            .alias(f"n{i}"),
            F.coalesce(
                F.sum(F.when(kept, F.coalesce(F.col("n_tok"), F.lit(0)))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"t{i}"),
            F.coalesce(F.sum(F.when(kept, F.col("p_micro"))), F.lit(0))
            .cast("long")
            .alias(f"s{i}"),
        ]
    aggs.append(
        F.coalesce(F.sum(F.coalesce(F.col("n_tok"), F.lit(0))), F.lit(0))
        .cast("long")
        .alias("tot_tok")
    )
    g = s.agg(*aggs)
    stack_args = ", ".join(
        f"{t}, n{i}, t{i}, s{i}" for i, t in enumerate(_Q243_TAUS)
    )
    return g.selectExpr(
        f"stack({len(_Q243_TAUS)}, {stack_args})"
        " AS (tau_micro, n_docs, n_tokens, p_sum)",
        "tot_tok",
    )


@query("q243_quality_budget_curve", _q243_oracle())
def q243(spark, sf_dir):
    """The quality filter's operating-point table: for each candidate
    threshold τ over the DEPLOYED model's score (q213's trained
    artifact), the surviving document count, surviving token budget,
    its share of the scored corpus, and the mean score of the kept
    set — the curve a curation run reads to pick where to cut (keep
    60% of tokens at mean quality 0.8, or 30% at 0.9?).  Completes
    the quality family's planner edge the way q241 does for ANN:
    q213 scores, q229 evaluates, q236 retrains, THIS picks the
    deployment threshold.

    Exactness: the per-τ sums are integer (micro scores, token
    counts); the mean is a positive integer division and the share is
    ONE guarded double division.  NULL-scored docs (NULL text) are
    excluded on both sides — p_micro ≥ τ is NULL-false in Spark and
    the SQL CASE falls through — and the τ = 0 row anchors the whole
    scored corpus.

    100 TB shape: ONE codegen'd scan (the q213 scoring projection)
    into ONE aggregate row of 13 partial sums — no shuffle wider than
    a single row, the sweep is literal CASE arms, and the 4-row stack
    is driver-free constant fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_budget_grid(docs).select(
        "tau_micro",
        "n_docs",
        "n_tokens",
        F.when(
            F.col("n_docs") > 0, F.expr("p_sum DIV n_docs")
        ).alias("mean_p_micro"),
        F.when(
            F.col("tot_tok") > 0,
            F.col("n_tokens").cast("double")
            / F.col("tot_tok").cast("double"),
        ).alias("tok_share"),
    )


# ---------------------------------------------------------------------------
# q244 — multi-query IVF recall: the serving eval over a query WORKLOAD.
# ---------------------------------------------------------------------------
_Q244_QUERY_IDS = (1, 2, 3, 4)
_Q244_NPROBE = 4
_Q244_K = 10


def _q244_oracle() -> str:
    from .functions.vectors import sql_cosine, sql_indexable
    from .pipeline_queries10 import _Q217_CENTROIDS, _sql_cent

    cent_rows = ",\n        ".join(
        f"({i}, {_sql_cent(c)})" for i, c in enumerate(_Q217_CENTROIDS)
    )
    score_cols = ",\n             ".join(
        f"round({sql_cosine('embedding', _sql_cent(c))}, 6) AS s{i}"
        for i, c in enumerate(_Q217_CENTROIDS)
    )
    arr = "[" + ", ".join(f"s{i}" for i in range(len(_Q217_CENTROIDS))) + "]"
    qids = ", ".join(str(i) for i in _Q244_QUERY_IDS)
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id IN ({qids}) AND {sql_indexable('embedding')}),
    cents(idx, cent) AS (VALUES
        {cent_rows}),
    qs AS (
      SELECT query_id, idx,
             round({sql_cosine('cent', 'qv')}, 6) AS qscore
      FROM cents, q),
    probe AS (
      SELECT query_id, idx AS list_id FROM (
        SELECT query_id, idx,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qscore DESC, idx) AS crank
        FROM qs) WHERE crank <= {_Q244_NPROBE}),
    pool AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id > {max(_Q244_QUERY_IDS)} AND vec_id <> 0
        AND {sql_indexable('embedding')}),
    scored AS (
      SELECT vec_id, embedding,
             {score_cols}
      FROM pool),
    base AS (
      SELECT q.query_id, s.vec_id,
             CAST(list_position({arr}, list_aggregate({arr}, 'max')) - 1
                  AS INT) AS list_id,
             round({sql_cosine('s.embedding', 'q.qv')}, 4) AS qcos
      FROM scored s, q),
    exact10 AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qcos DESC, vec_id) AS rn
        FROM base) WHERE rn <= {_Q244_K}),
    probe10 AS (
      SELECT query_id, vec_id FROM (
        SELECT b.query_id, b.vec_id,
               row_number() OVER (PARTITION BY b.query_id
                                  ORDER BY b.qcos DESC, b.vec_id) AS rn
        FROM base b JOIN probe p
          ON b.query_id = p.query_id AND b.list_id = p.list_id)
      WHERE rn <= {_Q244_K}),
    hits AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM probe10 JOIN exact10 USING (query_id, vec_id)
      GROUP BY query_id),
    res AS (
      SELECT q.query_id,
             CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
             CAST(coalesce(h.n_hit, 0) AS DOUBLE) / {_Q244_K}.0 AS recall
      FROM q LEFT JOIN hits h USING (query_id))
    SELECT query_id, n_hit, recall FROM res
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS query_id,
           CAST(sum(n_hit) AS BIGINT) AS n_hit,
           CAST(sum(n_hit) AS DOUBLE)
             / ({_Q244_K}.0 * count(*)) AS recall
    FROM res HAVING count(*) > 0"""


@query("q244_ivf_workload_recall", _q244_oracle())
def q244(spark, sf_dir):
    """IVF recall over a query WORKLOAD, hash-checked: q241 tunes
    nprobe on one query; this evaluates the frozen quantizer at the
    deployed nprobe across a query set — per query, recall@10 of the
    probe against that query's own brute-force top-10 — the per-query
    report an ANN rollout reads for tail behaviour (macro-recall is
    the ``query_id = -1`` row — Σ n_hit / (k·|Q|), identically the
    mean of the per-query recalls; a query whose probe misses
    entirely still reports 0.0 via the left join rather than
    vanishing, and drags the macro row down accordingly).

    Exactness: the q221-proven float path per (query, vector) pair;
    every ranking window is partitioned BY query_id (the q222
    discipline — compiles to partial+final WindowGroupLimit, pinned),
    ties break on vec_id, and recall is an integer count over one
    division.  Queries are the indexable vectors with the designated
    ids; the pool excludes them, so self-matches can't inflate recall.

    100 TB shape: ONE scan of the embedding column computes the
    query-independent list assignment and all |Q| query cosines in a
    single codegen'd projection against broadcast literals; the
    checkpointed sweep frame carries only (query_id, vec_id, qcos,
    in_probe) — the wide vectors never move — and both top-k windows
    forward at most k rows per query per map task."""
    from .functions.vectors import indexable_vector, lit_cosine_scores
    from .pipeline_queries10 import _Q217_CENTROIDS, _cos_total
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.where(
        F.col("vec_id").isin(list(_Q244_QUERY_IDS))
        & indexable_vector(F.col("embedding"))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    )
    cents = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(_Q217_CENTROIDS)],
        "idx int, cent array<double>",
    )
    qs = cents.crossJoin(F.broadcast(qset)).select(
        "query_id",
        "idx",
        F.round(_cos_total(F.col("cent"), F.col("qv")), 6).alias("qscore"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), "idx"
    )
    probe = (
        qs.withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= _Q244_NPROBE)
        .select("query_id", F.col("idx").alias("list_id"))
    )
    pool = emb.where(
        (F.col("vec_id") > max(_Q244_QUERY_IDS))
        & (F.col("vec_id") != 0)
        & indexable_vector(F.col("embedding"))
    )
    # literal-codebook scores as one JVM-parsed SQL string (q217
    # discipline) — identical trees, ~1.2 s less construction per pass
    scores = lit_cosine_scores(
        "embedding", _Q217_CENTROIDS, round_dp=6, total=True
    )
    base = pool.crossJoin(F.broadcast(qset)).select(
        "query_id",
        "vec_id",
        (F.array_position(scores, F.array_max(scores)) - 1)
        .cast("int")
        .alias("list_id"),
        F.round(_cos_total(F.col("embedding"), F.col("qv")), 4).alias(
            "qcos"
        ),
    )
    flagged = (
        base.join(
            F.broadcast(probe.withColumn("in_probe", F.lit(1))),
            ["query_id", "list_id"],
            "left",
        )
        # wide vectors are gone; |Q|·|pool| rows of four scalars feed
        # both top-k windows (the q241 one-scan contract)
        .select("query_id", "vec_id", "qcos", "in_probe")
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), "vec_id"
    )
    exact10 = (
        flagged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q244_K)
        .select("query_id", "vec_id")
    )
    probe10 = (
        flagged.where(F.col("in_probe") == 1)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q244_K)
        .select("query_id", "vec_id")
    )
    # both top-k frames are ≤ |Q|·k rows — broadcast, never sort-merge
    hits = probe10.join(
        F.broadcast(exact10), ["query_id", "vec_id"]
    ).groupBy("query_id").agg(F.count("*").cast("long").alias("n_hit"))
    res = qset.select("query_id").join(
        F.broadcast(hits), "query_id", "left"
    ).select(
        "query_id",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        (
            F.coalesce("n_hit", F.lit(0)).cast("double")
            / F.lit(float(_Q244_K))
        ).alias("recall"),
    )
    # macro-recall row (r9): query_id = -1 carries the workload mean,
    # Σ n_hit / (k·|Q|) == mean of the per-query recalls — one extra
    # aggregate over the ≤|Q|-row result, emitted only when the
    # workload is non-empty (an empty query set stays empty)
    macro = (
        res.agg(
            F.sum("n_hit").cast("long").alias("n_hit"),
            F.count("*").alias("_nq"),
        )
        .where(F.col("_nq") > 0)
        .select(
            F.lit(-1).cast("long").alias("query_id"),
            "n_hit",
            (
                F.col("n_hit").cast("double")
                / (F.lit(float(_Q244_K)) * F.col("_nq"))
            ).alias("recall"),
        )
    )
    return res.unionByName(macro)
