"""Registry entries, round 8: the deployed-artifact oracle pattern
(q217/q221/q223/q230) extended to three more serving loops —

- q232: SemDeDup's SERVING half over the frozen IVF quantizer — the
  affinity-plateau keep/drop screen a curation run applies after the
  (rows-only) k-means training of q108.
- q233: PageRank's SERVING half — a fixed-3-iteration power step with
  frozen damping over the near-dup graph, unrolled to static joins in
  exact micro-integer arithmetic (q117's convergence loop stays
  rows-only).
- q234: BPE ENCODE with a frozen merge table — the fixed-depth,
  priority-ordered merge fold (q107's trainer stays rows-only), the
  merge list trained ONCE at sf0.01 by ``operators.bpe.bpe_train`` and
  frozen to literals exactly like the q217 centroid artifact.

Every gate is pure literal algebra + window/join/agg — fully
hash-checkable against the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .functions.text import tokens
from .operators import dedup
from .registry import query

# ---------------------------------------------------------------------------
# q232 — SemDeDup serving gate over the deployed coarse quantizer.
# ---------------------------------------------------------------------------
#: plateau gap in micro-cosine units: two consecutively-ranked vectors
#: in a cluster closer than this to each other are treated as
#: semantically identical for the keep/drop screen (1e-4 cosine).
_Q232_EPS_MICRO = 100


def _q232_oracle() -> str:
    from .pipeline_queries10 import _q217_oracle

    return f"""
    WITH assign AS ({_q217_oracle()}),
    m AS (
      SELECT vec_id, list_id AS cluster_id,
             CAST(floor(affinity * 1000000.0) AS BIGINT) AS aff_micro
      FROM assign),
    flagged AS (
      SELECT vec_id, cluster_id, aff_micro,
             CASE WHEN lag(aff_micro) OVER w IS NULL
                  OR lag(aff_micro) OVER w - aff_micro
                     >= {_Q232_EPS_MICRO}
                  THEN 1 ELSE 0 END AS new_plateau
      FROM m
      WINDOW w AS (PARTITION BY cluster_id
                   ORDER BY aff_micro DESC, vec_id)),
    p AS (
      SELECT vec_id, cluster_id, aff_micro,
             CAST(SUM(new_plateau) OVER (PARTITION BY cluster_id
                                         ORDER BY aff_micro DESC, vec_id)
                  AS BIGINT) AS plateau_id
      FROM flagged)
    SELECT vec_id, cluster_id, aff_micro, plateau_id,
           CASE WHEN row_number() OVER (PARTITION BY cluster_id, plateau_id
                                        ORDER BY aff_micro DESC, vec_id) = 1
                THEN 1 ELSE 0 END AS keep
    FROM p"""


@query("q232_semdedup_serving_portable", _q232_oracle())
def q232(spark, sf_dir):
    """SemDeDup's serving half over the DEPLOYED coarse quantizer
    (VERDICT r7 directive #4): every vector lands in its frozen-
    centroid cluster (q217's assignment, literal algebra), ranks
    within the cluster by micro-quantized cosine-to-centroid, and the
    keep/drop screen drops every row whose affinity sits on the same
    plateau as a better-ranked row — consecutive gaps < eps chain into
    one plateau (gap-sessionization, the q24 pattern, applied to
    affinity instead of time) and only the plateau head survives.

    Exactness: the centroid cosine is pure IEEE mul/add/sqrt/divide
    against literals (bit-identical across engines, see
    _Q217_CENTROIDS), quantized by floor to micro-integers, so the
    lag-gap test, the running plateau sum and the row_number pick are
    all integer algebra — no float comparison anywhere past the floor.

    100 TB shape: one codegen'd scan (centroids fold in as literals,
    zero shuffles to assign) + two windows partitioned BY cluster —
    per-cluster state only, linear in rows; the whole screen is the
    map-then-window pass a curation run applies after training, which
    is why the training loop (q108) can stay iterative while THIS is
    the hash-checked artifact."""
    from .pipeline_queries10 import q217

    assign = q217(spark, sf_dir)
    m = assign.select(
        "vec_id",
        F.col("list_id").alias("cluster_id"),
        F.floor(F.col("affinity") * 1_000_000.0)
        .cast("long")
        .alias("aff_micro"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("aff_micro").desc(), "vec_id"
    )
    flagged = m.withColumn(
        "new_plateau",
        F.when(
            F.lag("aff_micro").over(w).isNull()
            | (
                F.lag("aff_micro").over(w) - F.col("aff_micro")
                >= _Q232_EPS_MICRO
            ),
            1,
        ).otherwise(0),
    )
    p = flagged.withColumn(
        "plateau_id", F.sum("new_plateau").over(w).cast("long")
    ).drop("new_plateau")
    wp = Window.partitionBy("cluster_id", "plateau_id").orderBy(
        F.col("aff_micro").desc(), "vec_id"
    )
    return p.withColumn(
        "keep",
        F.when(F.row_number().over(wp) == 1, 1).otherwise(0),
    )


# ---------------------------------------------------------------------------
# q233 — fixed-iteration PageRank, unrolled to static joins.
# ---------------------------------------------------------------------------
_Q233_ITERS = 3
_Q233_DAMP_PCT = 85  # damping 0.85, held as an integer percentage


def _q233_oracle() -> str:
    from .pipeline_queries import _jaccard_oracle

    # one CTE pair (contribution sum -> new rank) per unrolled
    # iteration: contrib = rank // deg (exact integer division), new
    # rank = (1-d) + d * sum(contrib), all in micro-integer units so
    # BOTH engines run the identical integer recurrence (the q110/q111
    # floor-micro discipline) — no float accumulates across iterations.
    steps = []
    prev = "r0"
    for i in range(1, _Q233_ITERS + 1):
        steps.append(
            f"""c{i} AS (
      SELECT s.dst AS node,
             CAST(sum({prev}.r // d.deg) AS BIGINT) AS s
      FROM sym s JOIN {prev} ON s.src = {prev}.node
      JOIN deg d ON s.src = d.node
      GROUP BY s.dst),
    r{i} AS (
      SELECT node,
             {(100 - _Q233_DAMP_PCT) * 10_000}
             + ({_Q233_DAMP_PCT} * s) // 100 AS r
      FROM c{i})"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (SELECT id_a, id_b FROM ({_jaccard_oracle(0.6)})),
    sym AS (
      -- UNION ALL: pairs are unique with id_a < id_b, so the
      -- symmetrized edges are duplicate-free by construction
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            FROM sym GROUP BY src),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
    {chain}
    SELECT node AS doc_id, r AS rank_micro,
           CAST(r AS DOUBLE) / 1000000.0 AS rank
    FROM {prev}
    ORDER BY r DESC, node LIMIT 20"""


@query("q233_pagerank_unrolled", _q233_oracle())
def q233(spark, sf_dir):
    """PageRank's SERVING half (VERDICT r7 directive #5): the
    3-iteration power step with frozen damping over the q117 near-dup
    graph (n-gram Jaccard at 0.6), unrolled to three static
    join+aggregate stages.  Ranks live in micro-integer units and every
    step is exact integer arithmetic — contribution = rank DIV degree,
    new rank = 150000 + (85·Σcontrib) DIV 100 — so Spark and DuckDB run
    the literally identical recurrence and the top-20 hash-checks
    (q117's float fixpoint with convergence probing stays rows-only).

    100 TB shape: identical to graph.pagerank's audited iteration —
    degrees pre-joined once, each unrolled step is one |E| equi-join +
    one partial-agg shuffle keyed by target; symmetrized dup graphs
    have no dangling nodes so mass conservation needs no extra term.
    Three fixed iterations is the production screen for canonical-
    representative picking (rank moves little after 3 rounds on
    template-family components, which are near-cliques)."""
    from .pipeline_queries import shingle_prebuilt_table

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.6,
        shingles_df=shingle_prebuilt_table(spark, sf_dir),
    ).select("id_a", "id_b")
    fwd = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    # pair output is unique (id_a < id_b, grouped) so the symmetrized
    # doubling is duplicate-free BY CONSTRUCTION — no distinct.  Checkpoint
    # the edge list EAGERLY: both the degree table and the rank init
    # hang off it, and an uncached lineage re-runs the whole posting
    # join once per consumer (measured 7.7 s → the pair join's 3.1 s
    # exactly once after the barrier).  Pair-scale rows, cheap to pin.
    # r11: both directions come from ONE evaluation of the pair lineage
    # (graph._both_directions) — the former self-union ran the posting
    # join twice inside the eager checkpoint itself.
    from .operators.graph import _both_directions

    sym = _both_directions(fwd).localCheckpoint(eager=True)
    deg = sym.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    # degrees are loop-invariant — pre-join once (graph.pagerank's shape)
    edges_w = sym.join(deg, on="src")
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    base = (100 - _Q233_DAMP_PCT) * 10_000
    for _ in range(_Q233_ITERS):
        contribs = edges_w.join(
            ranks, edges_w["src"] == ranks["node"]
        ).select(
            F.col("dst").alias("node"),
            F.expr("r DIV deg").alias("c"),
        )
        ranks = contribs.groupBy("node").agg(
            F.expr(
                f"{base} + ({_Q233_DAMP_PCT} * sum(c)) DIV 100"
            ).alias("r")
        )
    return (
        ranks.orderBy(F.col("r").desc(), "node")
        .limit(20)
        .select(
            F.col("node").alias("doc_id"),
            F.col("r").alias("rank_micro"),
            (F.col("r").cast("double") / 1_000_000.0).alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# q234 — BPE encode with a frozen merge table (fixed-depth fold).
# ---------------------------------------------------------------------------
#: Deployed tokenizer artifact: ``operators.bpe.bpe_train`` on the
#: sf0.01 documents sample (n_merges=24, deterministic hash sample,
#: lexicographic tie-break), frozen to literals — the same
#: train-once/serve-forever split as the IVF/PQ quantizers.
_Q234_MERGES = (
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
)


def _q234_merge_chain(inner: str) -> str:
    """Nest one literal ``replace`` per merge rule, priority order.

    Tokens are single-space separated with a leading/trailing space,
    so the pattern ``' x y '`` matches exactly the adjacent token pair
    (never a substring inside a longer token), and both engines'
    ``replace`` consume matches leftmost non-overlapping, continuing
    AFTER the replacement — i.e. per-rule greedy left-to-right merging,
    identical semantics in Spark and DuckDB."""
    e = inner
    for a, b in _Q234_MERGES:
        e = f"replace({e}, ' {a} {b} ', ' {a}{b} ')"
    return e


def _q234_oracle() -> str:
    from .functions.text import sql_tokens

    chain = _q234_merge_chain(
        "(' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ')"
    )
    return f"""
    WITH w AS (
      SELECT unnest({sql_tokens('text')}) AS word FROM documents),
    wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
    enc AS (
      SELECT word, freq,
             string_split(trim({chain}), ' ') AS pieces
      FROM wf),
    ex AS (SELECT word, freq, unnest(pieces) AS subword FROM enc)
    SELECT subword,
           CAST(sum(freq) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM ex GROUP BY subword"""


@query("q234_bpe_encode_frozen", _q234_oracle())
def q234(spark, sf_dir):
    """BPE ENCODE with the frozen merge table (VERDICT r7 directive
    #7): the fixed-depth, priority-ordered merge fold — each of the 24
    frozen rules is one literal ``replace`` over the space-delimited
    symbol string, nested in rank order, so the whole encoder is ONE
    static expression tree built identically in both engines.  The
    output is the corpus subword census under that tokenizer: per
    subword, total token occurrences (word-frequency-weighted) and
    distinct words using it — the vocabulary-usage table a tokenizer
    rollout reads (dead merges, coverage, fertility all fall out of
    it).

    Semantics note: this is the single-pass-per-rule fold (apply rule
    k once, leftmost non-overlapping, then rule k+1) — the fixed-depth
    serving variant; ``operators.bpe._encode_word``'s iterative
    best-pair loop can differ on words where a late merge re-enables
    an earlier rule, which is why q107 (the iterative encoder +
    trainer) stays rows-only with its own property tests and THIS
    fixed fold is the hash-checked twin.

    100 TB shape: the census runs over the DISTINCT-word relation
    (vocabulary-sized, Zipf-bounded — orders of magnitude smaller than
    the corpus), the fold is codegen'd string ops with zero Python and
    zero shuffle, and the only wide ops are the word-frequency groupBy
    and the final subword groupBy, both map-side-combinable."""
    # fan_out (r11b, guide §2.6): the tokenize+explode map side of the
    # word census is the query's dominant cost and the local table
    # scans as one row-group — the guarded repartition parallelizes it
    # (no-op at production scale).  A/B at sf0.1: 1.59 → 0.38 s wall,
    # rows identical (census sums are integers).
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    wf = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    chain = _q234_merge_chain(
        "concat(' ', regexp_replace(word, '(.)', '$1 '), '</w> ')"
    )
    enc = wf.selectExpr(
        "word", "freq", f"split(trim({chain}), ' ') AS pieces"
    )
    return (
        enc.select("word", "freq", F.explode("pieces").alias("subword"))
        .groupBy("subword")
        .agg(
            F.sum("freq").cast("long").alias("n_tokens"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
    )


# ---------------------------------------------------------------------------
# q235 — ONE Lloyd step of the coarse quantizer, from the frozen
# centroids: the training-side twin of q217's serving assignment.
# ---------------------------------------------------------------------------
def _q235_oracle() -> str:
    from .pipeline_queries10 import _q217_oracle

    return f"""
    WITH assign AS ({_q217_oracle()}),
    j AS (
      SELECT a.list_id, e.embedding
      FROM assign a JOIN embeddings e USING (vec_id)),
    ex AS (
      SELECT list_id,
             unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(embedding) AS x
      FROM j),
    st AS (
      SELECT CAST(list_id AS INT) AS list_id,
             CAST(dim AS BIGINT) AS dim,
             CAST(count(*) AS BIGINT) AS n_members,
             -- exact micro-integer sum of the 6dp-rounded components
             CAST(sum(CAST(round(x::DOUBLE, 6) AS DECIMAL(18,6)))
                  * 1000000 AS BIGINT) AS s_micro
      FROM ex GROUP BY list_id, dim)
    SELECT list_id, dim, n_members,
           -- floor-at-1e-6 mean via INTEGER division; the +1e7 shift
           -- keeps the numerator positive so truncating and flooring
           -- division agree (round(double,6) after the division is
           -- engine-divergent when a small-n mean lands exactly on a
           -- half-micro — caught by the single-member edge corpus)
           CAST((s_micro + n_members * 10000000) // n_members
                - 10000000 AS DOUBLE) / 1000000.0 AS mean_x
    FROM st"""


@query("q235_kmeans_step_portable", _q235_oracle())
def q235(spark, sf_dir):
    """ONE Lloyd iteration of the coarse quantizer, hash-checked: the
    frozen-centroid assignment (q217's literal algebra) followed by
    the per-(cluster, dimension) member MEAN — the exact update step
    q108's k-means training loops over, unrolled once from the
    deployed artifact.  For SPHERICAL k-means the unnormalized mean IS
    the full step: cosine is invariant to positive scaling, so the
    next assignment induced by these means is identical whether or not
    they are re-normalized (normalization is a deploy-time cosmetic).
    With q232 (serving screen) and q217 (assignment), only the
    multi-iteration LOOP of the family remains rows-only (q108).

    Portability: q228's per-dimension recipe — components 6 dp-rounded
    then DECIMAL-summed (order-independent), ONE final double division
    per (cluster, dim).  Scale: one codegen'd scan assigns (centroid
    literals, zero shuffles), posexplode fans out 64 dims, and the
    groupBy is partial-aggregated on ≤ 8·64 keys — output is
    centroid-table-sized however large the corpus."""
    from .functions.vectors import indexable_vector, lit_cosine_scores
    from .pipeline_queries10 import _Q217_CENTROIDS

    emb = load_table(spark, sf_dir, "embeddings").where(
        (F.col("vec_id") != 0) & indexable_vector(F.col("embedding"))
    )
    # literal-codebook scores as one JVM-parsed SQL string (q217
    # discipline) — identical trees, ~1.2 s less construction per pass
    scores = lit_cosine_scores("embedding", _Q217_CENTROIDS, round_dp=6)
    assigned = emb.select(
        F.col("embedding").cast("array<double>").alias("e"),
        scores.alias("sc"),
    ).select(
        (F.array_position("sc", F.array_max("sc")) - 1)
        .cast("int")
        .alias("list_id"),
        "e",
    )
    ex = assigned.select(
        "list_id", F.posexplode("e").alias("pos", "x")
    ).select("list_id", (F.col("pos") + 1).cast("long").alias("dim"), "x")
    st = ex.groupBy("list_id", "dim").agg(
        F.count("*").cast("long").alias("n_members"),
        (F.sum(F.round(F.col("x"), 6).cast("decimal(18,6)")) * 1_000_000)
        .cast("long")
        .alias("s_micro"),
    )
    # floor-at-1e-6 mean via integer division (positive-shifted so
    # truncation == floor) — see the oracle's comment; the decimal sum
    # times 1e6 is an exact integral value, so the cast is lossless
    return st.select(
        "list_id",
        "dim",
        "n_members",
        (
            F.expr(
                "(s_micro + n_members * 10000000) DIV n_members"
                " - 10000000"
            ).cast("double")
            / 1_000_000.0
        ).alias("mean_x"),
    )


# ---------------------------------------------------------------------------
# q236 — ONE gradient-descent step of the quality classifier, from the
# frozen deployed weights: the training-side twin of q213's scoring.
# ---------------------------------------------------------------------------
_Q236_FEATURES = ("n_words", "alpha_frac", "stop_frac", "mean_word_len")
_Q236_LR = 2.0  # classifier.train_logreg's default step size


def _q236_oracle() -> str:
    from .pipeline_queries3 import _SQL_QUALITY
    from .pipeline_queries5 import _Q121_FEATS_CTE, _QCLF, QCLF_W

    # widths: 24,6 × 14,6 → 38,12 — forces DuckDB onto the int128
    # decimal path (18,6 × 18,6 overflows its int64 multiply on real
    # micro-residual × n_words products) while Spark promotes the same
    # product to DECIMAL(38,12); the values are identical integers
    # either way
    r = "CAST(p_micro - label * 1000000 AS DECIMAL(24,6))"
    gsums = ",\n        ".join(
        [f"sum({r}) AS g0"]
        + [
            f"sum({r} * CAST(round({f}::DOUBLE, 6) AS DECIMAL(14,6)))"
            f" AS g{i + 1}"
            for i, f in enumerate(_Q236_FEATURES)
        ]
    )
    legs = "\n      UNION ALL ".join(
        # CAST: a bare -2.0 literal is DECIMAL in DuckDB, DOUBLE in
        # Spark — the union would carry the decimal type to the output
        f"SELECT '{name}' AS feature, CAST({w} AS DOUBLE) AS w_old,"
        f" CAST(g{i} AS DOUBLE) / (n * 1000000.0) AS graw FROM g"
        for i, (name, w) in enumerate(
            zip(("bias",) + _Q236_FEATURES, QCLF_W)
        )
    )
    return f"""
    WITH feats AS ({_Q121_FEATS_CTE}),
    scored AS (
      SELECT doc_id, n_words, alpha_frac, stop_frac, mean_word_len,
             CAST(floor(1000000.0 / (1.0 + exp(-{_QCLF}))) AS BIGINT)
                 AS p_micro
      FROM feats),
    lab AS (
      SELECT doc_id,
             CASE WHEN {_SQL_QUALITY} >= 0.5 THEN 1 ELSE 0 END AS label
      FROM documents),
    j AS (
      SELECT s.*, l.label FROM scored s JOIN lab l USING (doc_id)
      WHERE s.p_micro IS NOT NULL),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        {gsums}
      FROM j)
    SELECT feature, w_old, round(graw, 6) AS grad,
           round(w_old - {_Q236_LR} * graw, 6) AS w_new
    FROM ({legs}) t"""


@query("q236_logreg_step_portable", _q236_oracle())
def q236(spark, sf_dir):
    """ONE full-batch gradient-descent step of the quality classifier
    from the DEPLOYED weights, hash-checked: the mean-log-loss
    gradient (1/n)·Σ(σ(w·x) − y)·x — exactly classifier.train_logreg's
    iteration body — evaluated once at QCLF_W with the trainer's
    default step size.  With q213 (scoring), q229 (eval) and this,
    only the multi-iteration GD LOOP of the family remains rows-only
    (q200).  The continual-pretraining story: an ingest round folds
    new weak labels into the deployed model by exactly this step, and
    the gate proves both engines would take the IDENTICAL step.

    Portability: the residual is p_micro − y·10⁶ (the q121
    micro-floored sigmoid — already integer-exact), each feature
    6 dp-rounded; their DECIMAL products sum order-independently, and
    the gradient is ONE double division per weight, rounded 6 dp after
    the weight update.  Scale: one scan, one 5-column aggregate (the
    same shape the trainer runs per iteration — |features|+1 partial
    sums, no shuffle wider than one row)."""
    from .operators.text_analysis import (
        with_gopher_quality,
        with_quality_score,
    )
    from .pipeline_queries5 import QCLF_W, qclf_z

    # fan_out (r11b, guide §2.6): the fused feature projection is the
    # whole cost of this one-scan query and the local table is one
    # row-group — the guarded repartition spreads it (decimal/integer
    # aggregate sums are order-independent, values unchanged).
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    # one fused projection over one scan (r8) — both operators are
    # withColumn-style, so features, score and weak label need no join
    both = with_quality_score(with_gopher_quality(docs))
    j = both.select(
        *_Q236_FEATURES,
        F.floor(F.lit(1000000.0) / (F.lit(1.0) + F.exp(-qclf_z())))
        .cast("long")
        .alias("p_micro"),
        F.when(F.col("quality_score") >= 0.5, 1).otherwise(0).alias("label"),
    ).where(F.col("p_micro").isNotNull())
    r = (F.col("p_micro") - F.col("label") * 1_000_000).cast(
        "decimal(24,6)"
    )
    g = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(r).alias("g0"),
        *[
            F.sum(
                r * F.round(F.col(f).cast("double"), 6).cast("decimal(14,6)")
            ).alias(f"g{i + 1}")
            for i, f in enumerate(_Q236_FEATURES)
        ],
    )
    stack_args = ", ".join(
        f"'{name}', CAST({w!r} AS DOUBLE),"
        f" CAST(g{i} AS DOUBLE) / (n * 1000000.0)"
        for i, (name, w) in enumerate(
            zip(("bias",) + _Q236_FEATURES, QCLF_W)
        )
    )
    return g.selectExpr(
        f"stack(5, {stack_args}) AS (feature, w_old, graw)"
    ).select(
        "feature",
        "w_old",
        F.round("graw", 6).alias("grad"),
        F.round(
            F.col("w_old") - F.lit(_Q236_LR) * F.col("graw"), 6
        ).alias("w_new"),
    )
