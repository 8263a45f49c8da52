"""Registry entries, round 10: the durable-artifact serving path and
the two composition gaps VERDICT r9 named.  Six gates:

- q254: incremental paragraph near-dup — a NEW document batch joined
  against the PREBUILT corpus posting index (task #2's durable
  artifact) without rescanning the corpus side: the everyday operation
  of a continuously-ingesting pipeline, q112's novel-against-corpus at
  paragraph/near-dup grain.
- q255: shortfall reallocation — q253 reports the tokens a plan loses
  to decontamination but lets the freed budget vanish; a real planner
  re-waterfills it over the under-capped clean sources.  One more
  closed-form waterfilling pass (the q240 kernel generalized to
  explicit per-source caps and an explicit budget), with the
  budget-closure identity (realloc_total == min(residual, headroom))
  carried IN the output so the external hash pins it.
- q256: structural paragraph splitter — the swap-in the paragraph
  family promised (``pipeline_queries14`` module docstring): a
  double-newline ``regexp_split`` splitter behind the same
  ``(doc_id, para_idx, p_text, n_ptok)`` contract, exercised on a
  corpus WITH separators (derived in-query, deterministically on both
  engines, by re-joining each document's token windows with blank
  lines) and run through the UNCHANGED q245 downstream algebra
  (``paragraph_occurrences`` + ``paragraph_dedup_stats`` — the shared
  bodies, not copies).
- q257: the durable artifact round-trip under the driver — q245's
  stats computed FROM the ledger-backed paragraph artifact
  (``ingest.artifacts``) while the oracle recomputes from the raw
  documents table: external hash-proof that what ingest persisted is
  what a fresh session serves.
- q258: incremental EXACT paragraph dedup — the arriving batch
  classified against the durable per-fingerprint keeper state (the
  streaming fold's MIN/SUM-mergeable state made durable): per batch
  document, how much arriving text is corpus-duplicate,
  batch-internal duplicate, and novel.
- q259: near-dup paragraph REWRITE — q246's pairs closed transitively
  (q61's connected-components operator; the oracle runs the same
  closure as a recursive CTE), one keeper per cluster, per-document
  surviving text: the corpus a boilerplate-stripping pass emits.

Round 11 additions (this module hosts the gates that share the
paragraph/artifact machinery; q262 lives in ``pipeline_queries16``):

- q260: the END-TO-END ingest-admission gate — q258's exact
  classification + q254's near-dup screen composed into the one
  per-batch decision a continuously-ingesting pipeline makes, with
  the transactional fold in ``ingest.admission.admit_and_refresh``.
- q261: the STRUCTURAL-splitter durable-artifact round-trip — q257's
  proof for the other paragraph definition, served from a root built
  with ``splitter="structural"``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F

from .catalog import load_table
from .functions.text import sql_tokens
from .ingest.artifacts import (
    ARTIFACT_FORMAT,
    _paragraph_rows,
    _paragraph_shingle_rows,
    artifacts_exist,
    build_document_artifacts,
    read_paragraph_dedup_state,
    read_paragraph_hot_shingles,
    read_paragraph_shingles,
    read_paragraphs,
)
from .pipeline_queries14 import (
    _PARA_DF_CAP,
    _PARA_TAU,
    _SQL_PKEY,
    _keeper_mark_cte,
    _para_cte,
    _q245_oracle,
    decon_allocc_chain,
    decon_allocc_frames,
    paragraph_dedup_stats,
    paragraph_occurrences,
    paragraph_table,
)
from .registry import query


# ---------------------------------------------------------------------------
# Durable-artifact accessor: build-once per corpus under a
# content-signature-keyed root, then serve any number of sessions.
# ---------------------------------------------------------------------------
def documents_artifact_root(spark, sf_dir: str, subset: str = "all") -> str:
    """Resolve (building if absent) the durable document-artifact root
    for a corpus.  The root is keyed by the documents file's
    (size, mtime) signature so a regenerated corpus can never serve a
    stale index, and by ``subset``:

    - ``"all"``: the full corpus (q257's round-trip gate).
    - ``"corpus90"``: documents with ``doc_id % 10 != 0`` — the
      pre-existing corpus in q254's incremental scenario, where the
      ``% 10 == 0`` docs play the newly-arriving batch.  The index is
      built WITHOUT them, exactly like a real ingest ledger before the
      batch lands.
    - ``"structsep"`` (r11): the derived separator corpus (each
      document's token-window paragraphs re-joined with blank lines —
      q256's deterministic derivation) built with the STRUCTURAL
      splitter — the artifact variant a corpus with real ``\\n\\n``
      separators persists (q261's round-trip gate).  The splitter
      rides the root name AND the root's recorded meta, so the two
      variants can never serve each other.

    The build is ingest-time work (bench runs it in the untimed
    artifact block); under the driver the first invocation per corpus
    pays it once and every later gate reads parquet from the ledger.
    The key hashes the corpus's ABSOLUTE path alongside size+mtime —
    two different corpora whose files coincide in basename/size/mtime
    (two generated test dirs in the same second — the concurrent
    full-suite collision that motivated this) can never share a root,
    and the build itself is race-tolerant (see
    ``build_document_artifacts``) for true same-root concurrency.

    Roots live under the configurable WAREHOUSE
    (``ingest.artifact_catalog.warehouse_root`` —
    ``$SPARK_GRAFT_ARTIFACT_WAREHOUSE``, defaulting to the OS temp
    dir) and every build registers in the warehouse CATALOG so
    ``gc_artifacts`` can reclaim roots whose corpus signature no
    longer resolves (r11, VERDICT r10 #5)."""
    import hashlib

    from .ingest.artifact_catalog import (
        register_artifact_root,
        warehouse_root,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path_h = hashlib.md5(
        os.path.abspath(sf_dir).encode("utf-8")
    ).hexdigest()[:10]
    # st_mtime_ns, not int(st_mtime) (r10 ADVICE): a corpus regenerated
    # in place within the same SECOND at identical byte size would have
    # silently served the stale index under the coarser signature
    sig = f"{path_h}_{st.st_size}_{st.st_mtime_ns}_v{ARTIFACT_FORMAT}"
    root = os.path.join(
        warehouse_root(),
        f"{os.path.basename(os.path.normpath(sf_dir))}_{sig}_{subset}",
    )
    if not artifacts_exist(root):
        if subset == "structsep":
            from .pipeline_queries14 import paragraph_prebuilt_table

            splitter = "structural"
            docs = separator_corpus(
                paragraph_prebuilt_table(spark, sf_dir)
            )
            build_document_artifacts(spark, docs, root, splitter=splitter)
        else:
            splitter = "window"
            docs = load_table(spark, sf_dir, "documents", fan_out=True)
            if subset == "corpus90":
                docs = docs.filter(F.col("doc_id") % 10 != 0)
            build_document_artifacts(spark, docs, root)
        register_artifact_root(
            root,
            source_path=src,
            source_size=st.st_size,
            source_mtime_ns=st.st_mtime_ns,
            fmt=ARTIFACT_FORMAT,
            subset=subset,
            splitter=splitter,
        )
    return root


# ---------------------------------------------------------------------------
# q254 — incremental paragraph near-dup: new batch vs the prebuilt
# corpus posting index.
# ---------------------------------------------------------------------------
def _q254_oracle() -> str:
    return f"""WITH {_para_cte()},
    sh AS (
      SELECT doc_id, para_idx,
             list_distinct(list_transform(range(1, len(pt) - 1),
               i -> pt[i] || ' ' || pt[i+1] || ' ' || pt[i+2]))
               AS shingles
      FROM para WHERE len(pt) >= 3),
    exc0 AS (SELECT doc_id, para_idx, unnest(shingles) AS s FROM sh
             WHERE doc_id % 10 <> 0),
    hot AS (SELECT s FROM exc0 GROUP BY s
            HAVING count(*) > {_PARA_DF_CAP}),
    exc AS (SELECT doc_id, para_idx, s FROM exc0
            WHERE s NOT IN (SELECT s FROM hot)),
    exb0 AS (SELECT doc_id, para_idx, unnest(shingles) AS s FROM sh
             WHERE doc_id % 10 = 0),
    exb AS (SELECT doc_id, para_idx, s FROM exb0
            WHERE s NOT IN (SELECT s FROM hot)),
    pairs AS (
      SELECT b.doc_id AS doc_new, b.para_idx AS para_new,
             c.doc_id AS doc_corpus, c.para_idx AS para_corpus,
             CAST(count(*) AS BIGINT) AS common
      FROM exb b JOIN exc c ON b.s = c.s
      GROUP BY 1, 2, 3, 4),
    sized AS (
      SELECT p.doc_new, p.para_new, p.doc_corpus, p.para_corpus,
             p.common, CAST(sb.n AS BIGINT) AS n_new,
             CAST(sc.n AS BIGINT) AS n_corpus
      FROM pairs p
      JOIN (SELECT doc_id, para_idx, len(shingles) AS n FROM sh) sb
        ON sb.doc_id = p.doc_new AND sb.para_idx = p.para_new
      JOIN (SELECT doc_id, para_idx, len(shingles) AS n FROM sh) sc
        ON sc.doc_id = p.doc_corpus AND sc.para_idx = p.para_corpus)
    SELECT doc_new, para_new, doc_corpus, para_corpus,
           common::DOUBLE / (n_new + n_corpus - common) AS jaccard
    FROM sized
    WHERE common::DOUBLE / (n_new + n_corpus - common) >= {_PARA_TAU}"""


@query("q254_incremental_paragraph_near_dup", _q254_oracle())
def q254(spark, sf_dir):
    """Near-dup an ARRIVING batch against the existing corpus's
    PREBUILT paragraph posting index — the continuously-ingesting
    pipeline's everyday gate (which arriving paragraphs duplicate
    boilerplate the corpus already holds?).  q246 is the offline
    full-corpus pass; this is the online increment: the corpus side
    never re-shingles and never re-scans documents — it reads the
    durable ledger artifact (``ingest.artifacts``, built without the
    batch docs, exactly like a real index before the batch lands) —
    while only the batch (``doc_id % 10 == 0``, micro-batch-sized by
    construction) shingles fresh.  Batch-internal pairs are NOT
    emitted (the regular batch pass owns those); output is strictly
    increment × corpus.

    Scale shape: the stop-shingle head comes from the index's
    MAINTAINED DF statistic (a filter over the vocabulary-sized count
    table, not a corpus pass) and caps hot-key fanout on BOTH sides as
    broadcast anti-joins; the posting join's cost is then batch-side
    posting fanout — independent of corpus size given the index, which
    is the whole point.  Same integer-count Jaccard as q246: bit-exact
    across engines, threshold {_PARA_TAU}.  Plan pin
    (tests/test_plans.py): every documents scan carries the pushed
    batch filter (the corpus is NEVER read from the documents table)
    and the corpus side's input files all live under the artifact
    root."""
    root = documents_artifact_root(spark, sf_dir, subset="corpus90")
    corp_sh = read_paragraph_shingles(spark, root)
    hot = read_paragraph_hot_shingles(spark, root, _PARA_DF_CAP)

    batch_docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") % 10 == 0
    )
    # two consumers (postings + sizes) ⇒ two scans of the BATCH — both
    # carry the pushed batch filter (plan-pinned), so the cost is 2×
    # the micro-batch, never 2× the corpus; a checkpoint here would
    # hide the documents scan from the plan pin for no real win at
    # batch scale
    batch_sh = _paragraph_shingle_rows(_paragraph_rows(batch_docs))

    exc = corp_sh.select(
        "doc_id", "para_idx", F.explode("shingles").alias("s")
    ).join(F.broadcast(hot), "s", "left_anti")
    exb = batch_sh.select(
        "doc_id", "para_idx", F.explode("shingles").alias("s")
    ).join(F.broadcast(hot), "s", "left_anti")

    pairs = (
        exb.select(
            F.col("doc_id").alias("doc_new"),
            F.col("para_idx").alias("para_new"),
            "s",
        )
        .join(
            exc.select(
                F.col("doc_id").alias("doc_corpus"),
                F.col("para_idx").alias("para_corpus"),
                "s",
            ),
            "s",
        )
        .groupBy("doc_new", "para_new", "doc_corpus", "para_corpus")
        .agg(F.count("*").cast("long").alias("common"))
    )
    # sizes come from the artifact's stored |shingles| column, so this
    # second corpus-side scan prunes to three scalar columns and never
    # re-reads the wide shingle arrays
    n_b = batch_sh.select(
        F.col("doc_id").alias("doc_new"),
        F.col("para_idx").alias("para_new"),
        F.col("n_shingles").alias("n_new"),
    )
    n_c = corp_sh.select(
        F.col("doc_id").alias("doc_corpus"),
        F.col("para_idx").alias("para_corpus"),
        F.col("n_shingles").alias("n_corpus"),
    )
    sized = pairs.join(n_b, ["doc_new", "para_new"]).join(
        n_c, ["doc_corpus", "para_corpus"]
    )
    jac = F.col("common").cast("double") / (
        F.col("n_new") + F.col("n_corpus") - F.col("common")
    )
    return sized.select(
        "doc_new", "para_new", "doc_corpus", "para_corpus",
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= _PARA_TAU)


# ---------------------------------------------------------------------------
# q255 — shortfall reallocation: re-waterfill the decontamination
# residual over the under-capped clean sources.
# ---------------------------------------------------------------------------
def _waterfill_chain(caps_body: str, budget_body: str) -> str:
    """CTE chain ``caps -> ... -> wf_alloc``: allocate an explicit
    BIGINT budget over per-source caps — q240's closed-form
    waterfilling (``pipeline_queries13._q240_alloc_chain``) generalized
    from (cap = c·n_tokens, budget = 1.95·total) to arbitrary caps and
    budget, which is what composition needs: sorted ascending by cap,
    a source saturates iff granting it and every larger source its own
    cap still fits (prefix-closed predicate ⇒ the waterline is one
    MAX); uncapped sources split the remainder by integer division,
    the remainder's units going one each to the smallest.  Total
    granted == min(budget, Σcaps) EXACTLY, in pure BIGINT algebra.
    ``caps_body`` yields (source, cap_tokens > 0); ``budget_body``
    yields one row (budget >= 0)."""
    return f"""caps AS ({caps_body}),
    budgetr AS ({budget_body}),
    wtot AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM caps),
    wf AS (
      SELECT source, cap_tokens, budget, n_src,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(sum(cap_tokens) OVER (ORDER BY cap_tokens, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM caps CROSS JOIN budgetr CROSS JOIN wtot
      WINDOW w AS (ORDER BY cap_tokens, source)),
    wfp AS (
      SELECT *,
             CASE WHEN cap_tokens * (n_src - i + 1)
                       <= budget - (cum - cap_tokens)
                  THEN 1 ELSE 0 END AS pred
      FROM wf),
    wfm AS (
      SELECT CAST(coalesce(max(CASE WHEN pred = 1 THEN i END), 0)
                  AS BIGINT) AS m,
             CAST(coalesce(max(CASE WHEN pred = 1 THEN cum END), 0)
                  AS BIGINT) AS cum_m
      FROM wfp),
    wf_alloc AS (
      SELECT source, cap_tokens,
             CASE WHEN i <= m THEN cap_tokens
                  ELSE (budget - cum_m) // (n_src - m)
                       + CASE WHEN i - m <= (budget - cum_m)
                                            % (n_src - m)
                              THEN 1 ELSE 0 END
             END AS extra_tokens
      FROM wfp CROSS JOIN wfm)"""


def waterfill_caps(caps: DataFrame, budget: DataFrame) -> DataFrame:
    """Spark twin of :func:`_waterfill_chain` — ``caps`` is
    ``(source, cap_tokens)`` with positive caps, ``budget`` a 1-row
    ``(budget)`` frame; returns ``(source, cap_tokens, extra_tokens)``.
    The window runs over the |sources|-row relation (same audited
    shape as ``epoch_capped_allocation``); everything else is
    broadcast 1-row algebra."""
    w = Window.orderBy("cap_tokens", "source")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ntot = caps.agg(F.count("*").cast("long").alias("n_src"))
    f = (
        caps.crossJoin(F.broadcast(budget))
        .crossJoin(F.broadcast(ntot))
        .withColumn("i", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum", F.sum("cap_tokens").over(wsum).cast("long")
        )
    )
    p = f.withColumn(
        "pred",
        F.when(
            F.col("cap_tokens") * (F.col("n_src") - F.col("i") + 1)
            <= F.col("budget") - (F.col("cum") - F.col("cap_tokens")),
            1,
        ).otherwise(0),
    )
    m = p.agg(
        F.coalesce(
            F.max(F.when(F.col("pred") == 1, F.col("i"))), F.lit(0)
        )
        .cast("long")
        .alias("m"),
        F.coalesce(
            F.max(F.when(F.col("pred") == 1, F.col("cum"))), F.lit(0)
        )
        .cast("long")
        .alias("cum_m"),
    )
    return p.crossJoin(F.broadcast(m)).select(
        "source",
        "cap_tokens",
        F.expr(
            """CASE WHEN i <= m THEN cap_tokens
               ELSE (budget - cum_m) DIV (n_src - m)
                    + CASE WHEN i - m <= (budget - cum_m)
                                         % (n_src - m)
                           THEN 1 ELSE 0 END
               END"""
        ).alias("extra_tokens"),
    )


def _q255_oracle() -> str:
    from .pipeline_queries13 import _Q240_CAP_EPOCHS, epochs_micro_sql

    c = _Q240_CAP_EPOCHS
    caps_body = (
        "SELECT source, headroom AS cap_tokens FROM sfall "
        "WHERE headroom > 0"
    )
    budget_body = "SELECT budget FROM rb"
    fin = "(j.src_alloc_clean + j.realloc_extra)"
    return f"""
    WITH {decon_allocc_chain()},
    sfall AS (
      SELECT source, alloc_tokens AS src_alloc, clean_t,
             alloc_clean AS src_alloc_clean,
             CAST(alloc_tokens - alloc_clean AS BIGINT) AS src_shortfall,
             CAST({c} * clean_t - alloc_clean AS BIGINT) AS headroom
      FROM allocc),
    rb AS (SELECT CAST(coalesce(sum(src_shortfall), 0) AS BIGINT)
                    AS budget FROM sfall),
    {_waterfill_chain(caps_body, budget_body)},
    j AS (
      SELECT f.source, f.src_alloc, f.src_alloc_clean, f.src_shortfall,
             f.headroom, f.clean_t,
             CAST(coalesce(w.extra_tokens, 0) AS BIGINT) AS realloc_extra
      FROM sfall f LEFT JOIN wf_alloc w ON f.source = w.source),
    tj AS (SELECT CAST(sum(realloc_extra) AS BIGINT) AS realloc_total
           FROM j)
    SELECT j.source, j.src_alloc, j.src_alloc_clean, j.src_shortfall,
           j.headroom, j.realloc_extra,
           CAST(j.src_alloc_clean + j.realloc_extra AS BIGINT)
             AS final_alloc,
           {epochs_micro_sql(fin, "j.clean_t", "//")}
             AS final_epochs_micro,
           rb.budget AS residual_budget,
           tj.realloc_total AS realloc_total
    FROM j CROSS JOIN rb CROSS JOIN tj"""


@query("q255_shortfall_reallocation", _q255_oracle())
def q255(spark, sf_dir):
    """Close q253's loop: the tokens decontamination removed from
    over-contaminated sources (``src_shortfall``) do not vanish — the
    planner re-waterfills the residual budget over the sources whose
    CLEAN mass still has epoch-cap headroom (``headroom = cap·clean_t
    - alloc_clean``), so the run trains on its full token budget
    whenever the clean corpus can absorb it.

    Composition, not reimplementation: the decontaminated allocation
    is q253's shared ``decon_allocc_frames``/``decon_allocc_chain``
    body, and the refill is ONE more pass of the q240 waterfilling
    kernel generalized to explicit caps + budget
    (:func:`waterfill_caps` / :func:`_waterfill_chain` — the closed
    form composes, as the r9 verdict predicted).  The budget-closure
    identity is carried in the OUTPUT (``residual_budget``,
    ``realloc_total`` on every row), so the external hash pins
    ``realloc_total == min(residual_budget, Σ headroom)`` — a planner
    bug that leaked or double-spent budget would flip the driver red,
    not just a local assert.

    100 TB shape: everything after the (shared, prebuilt-index-backed)
    contamination screen is |sources|-row broadcast algebra; the two
    windows run over the |sources|-row relation.  All integer BIGINT
    algebra; the only division is the house guarded micro-ratio."""
    from .pipeline_queries13 import _Q240_CAP_EPOCHS, epochs_micro_sql

    _, allocc = decon_allocc_frames(spark, sf_dir)
    sfall = allocc.select(
        "source",
        F.col("orig_alloc").alias("src_alloc"),
        F.col("src_tokens").alias("clean_t"),
        F.col("alloc_tokens").alias("src_alloc_clean"),
        (F.col("orig_alloc") - F.col("alloc_tokens"))
        .cast("long")
        .alias("src_shortfall"),
        (
            F.lit(_Q240_CAP_EPOCHS) * F.col("src_tokens")
            - F.col("alloc_tokens")
        )
        .cast("long")
        .alias("headroom"),
    ).localCheckpoint(eager=False)  # three consumers: caps, budget, join
    rb = sfall.agg(
        F.coalesce(F.sum("src_shortfall"), F.lit(0))
        .cast("long")
        .alias("budget")
    )
    wf = waterfill_caps(
        sfall.filter(F.col("headroom") > 0).select(
            "source", F.col("headroom").alias("cap_tokens")
        ),
        rb,
    )
    j = sfall.join(
        wf.select("source", "extra_tokens"), "source", "left"
    ).select(
        "source",
        "src_alloc",
        "src_alloc_clean",
        "src_shortfall",
        "headroom",
        "clean_t",
        F.coalesce("extra_tokens", F.lit(0))
        .cast("long")
        .alias("realloc_extra"),
    )
    tj = j.agg(
        F.sum("realloc_extra").cast("long").alias("realloc_total")
    )
    fin = "(src_alloc_clean + realloc_extra)"
    return (
        j.crossJoin(F.broadcast(rb))
        .crossJoin(F.broadcast(tj))
        .select(
            "source",
            "src_alloc",
            "src_alloc_clean",
            "src_shortfall",
            "headroom",
            "realloc_extra",
            (F.col("src_alloc_clean") + F.col("realloc_extra"))
            .cast("long")
            .alias("final_alloc"),
            F.expr(epochs_micro_sql(fin, "clean_t", "DIV")).alias(
                "final_epochs_micro"
            ),
            F.col("budget").alias("residual_budget"),
            "realloc_total",
        )
    )


# ---------------------------------------------------------------------------
# q256 — structural paragraph splitter behind the same contract.
# (The splitter itself moved to ``pipeline_queries14`` in r11 so the
# durable-artifact builder can persist either variant; re-exported
# here for existing importers.)
# ---------------------------------------------------------------------------
from .pipeline_queries14 import paragraph_table_structural  # noqa: E402


def separator_corpus(para: DataFrame) -> DataFrame:
    """Derive a corpus WITH structural separators from a paragraph
    relation: each document's paragraphs re-joined with blank lines,
    in ``para_idx`` order — deterministic on both engines, which is
    what lets q256 exercise the structural splitter against the
    synthetic single-line corpus."""
    return para.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("para_idx", "p_text"))
                ),
                lambda x: x["p_text"],
            ),
            "\n\n",
        ).alias("text")
    )


def _q256_oracle() -> str:
    seg_toks = sql_tokens("parts[i]")
    return f"""WITH {_para_cte()},
    sep AS (
      SELECT doc_id,
             string_agg(p_text, chr(10) || chr(10) ORDER BY para_idx)
               AS text2
      FROM para GROUP BY doc_id),
    px AS (SELECT doc_id, string_split_regex(text2, '\\n{{2,}}') AS parts
           FROM sep),
    spl AS (SELECT doc_id, parts,
                   unnest(range(1, len(parts) + 1)) AS i
            FROM px),
    tk AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS para_idx,
                  {seg_toks} AS t
           FROM spl),
    sp AS (SELECT doc_id, para_idx,
                  array_to_string(t, ' ') AS p_text,
                  CAST(len(t) AS BIGINT) AS n_ptok
           FROM tk WHERE len(t) > 0),
    fp AS (
      SELECT doc_id, n_ptok, length(p_text) AS n_pchars,
             md5(p_text) AS fpr,
             {_SQL_PKEY} AS pkey
      FROM sp),
    {_keeper_mark_cte("f.doc_id, f.n_ptok, f.n_pchars")},
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_paras,
             CAST(sum(dropped) AS BIGINT) AS n_dropped,
             CAST(sum(CASE WHEN dropped = 0 THEN n_ptok ELSE 0 END)
                  AS BIGINT) AS tok_kept,
             CAST(sum(CASE WHEN dropped = 1 THEN n_ptok ELSE 0 END)
                  AS BIGINT) AS tok_dropped,
             CAST(sum(CASE WHEN dropped = 0 THEN n_pchars ELSE 0 END)
                  AS BIGINT) AS chars_kept
      FROM mark GROUP BY doc_id)
    SELECT doc_id, n_paras, n_dropped, tok_kept, tok_dropped,
           chars_kept, (n_dropped * 1000000) // n_paras AS drop_micro
    FROM agg"""


@query("q256_structural_paragraph_dedup", _q256_oracle())
def q256(spark, sf_dir):
    """q245's exact cross-document paragraph dedup with the
    STRUCTURAL (double-newline) splitter in place of the token-window
    proxy, on a corpus that actually HAS separators (derived in-query:
    each document's token windows re-joined with blank lines — byte-
    deterministic on both engines, so the gate is fully oracled).

    What this pins: (1) the swap-in splitter honors the
    ``(doc_id, para_idx, p_text, n_ptok)`` contract; (2) the
    downstream algebra is UNCHANGED — the Spark body calls the same
    ``paragraph_occurrences`` + ``paragraph_dedup_stats`` shared
    bodies q245 registers, and the local invariant test pins that on
    the derived corpus the structural stats equal q245's token-window
    stats row-exactly (the derivation makes the two splitters
    coincide by construction).  At 100 TB the splitter is one
    codegen'd regexp + posexplode per document — the same shuffle-free
    expansion as the window splitter."""
    from .pipeline_queries14 import paragraph_prebuilt_table

    sep = separator_corpus(paragraph_prebuilt_table(spark, sf_dir))
    return paragraph_dedup_stats(
        paragraph_occurrences(paragraph_table_structural(sep))
    )


# ---------------------------------------------------------------------------
# q257 — the durable artifact round-trip under the driver.
# ---------------------------------------------------------------------------
@query("q257_artifact_paragraph_stats", _q245_oracle())
def q257(spark, sf_dir):
    """q245's per-document dedup stats computed FROM the durable
    ledger artifact (``ingest.artifacts.read_paragraphs``) while the
    oracle recomputes everything from the raw documents table — the
    external hash-proof that what ingest persisted (and what a fresh
    session serves with zero corpus re-scan; see
    ``tests/test_artifacts.py``) is exactly the relation the
    recompute defines.  Shares q245's oracle verbatim: same algebra,
    different physical source.  The artifact builds once per corpus
    signature (``documents_artifact_root``); every later invocation —
    this driver run, the next round's, a new session's — reads only
    ledger parquet."""
    root = documents_artifact_root(spark, sf_dir, subset="all")
    para = read_paragraphs(spark, root).select(
        "doc_id", "para_idx", "p_text", "n_ptok"
    )
    return paragraph_dedup_stats(paragraph_occurrences(para))


# ---------------------------------------------------------------------------
# q258 — incremental EXACT paragraph dedup: an arriving batch
# classified against the durable per-fingerprint keeper state.
# ---------------------------------------------------------------------------
def _q258_oracle() -> str:
    return f"""WITH {_para_cte()},
    fp AS (
      SELECT doc_id, n_ptok, md5(p_text) AS fpr,
             {_SQL_PKEY} AS pkey
      FROM para),
    corpusf AS (SELECT DISTINCT fpr FROM fp WHERE doc_id % 10 <> 0),
    b AS (
      SELECT doc_id, n_ptok, fpr, pkey,
             CASE WHEN fpr IN (SELECT fpr FROM corpusf)
                  THEN 1 ELSE 0 END AS dup_corpus
      FROM fp WHERE doc_id % 10 = 0),
    g AS (SELECT fpr, min(pkey) AS keeper FROM b
          WHERE dup_corpus = 0 GROUP BY fpr),
    m AS (
      SELECT b.doc_id, b.n_ptok, b.dup_corpus,
             CASE WHEN b.dup_corpus = 0 AND b.pkey <> g.keeper
                  THEN 1 ELSE 0 END AS dup_batch
      FROM b LEFT JOIN g ON b.fpr = g.fpr)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(dup_corpus) AS BIGINT) AS n_dup_corpus,
           CAST(sum(dup_batch) AS BIGINT) AS n_dup_batch,
           CAST(sum(CASE WHEN dup_corpus = 0 AND dup_batch = 0
                         THEN n_ptok ELSE 0 END) AS BIGINT) AS tok_kept,
           CAST(sum(CASE WHEN dup_corpus = 1 OR dup_batch = 1
                         THEN n_ptok ELSE 0 END) AS BIGINT)
             AS tok_dropped,
           CAST(((count(*) - sum(dup_corpus) - sum(dup_batch))
                 * 1000000) // count(*) AS BIGINT) AS novel_micro
    FROM m GROUP BY doc_id"""


@query("q258_incremental_paragraph_dedup", _q258_oracle())
def q258(spark, sf_dir):
    """q245's exact dedup as the INCREMENT operation: each arriving
    paragraph classifies against the corpus's durable per-fingerprint
    keeper state (``ingest.artifacts.PARAGRAPH_DEDUP_STATE`` — the
    streaming fold's MIN/SUM-mergeable occurrence state made durable)
    and, for fingerprints the corpus has never seen, against the
    batch's own first-occurrence-wins rule.  Per batch document the
    gate reports how much arriving text is corpus-duplicate,
    batch-internal duplicate, and novel — the keep/drop decision a
    continuously-ingesting pipeline makes per micro-batch.

    Scale shape: the batch side tokenizes/fingerprints only itself;
    the corpus side is ONE fingerprint-keyed equi-join against the
    state table — distinct-fingerprint-sized, no paragraph text, no
    posting lists, and maintained in O(batch) on append (see
    ``refresh_documents``).  The batch-internal keeper is the q245
    partial-agg GROUP BY at batch scale.  All stats BIGINT; the
    novel ratio is the house integer-micro division."""
    root = documents_artifact_root(spark, sf_dir, subset="corpus90")
    state = read_paragraph_dedup_state(spark, root).select("fpr")

    batch_docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") % 10 == 0
    )
    occ = paragraph_occurrences(paragraph_table(batch_docs))
    b = occ.join(
        state.withColumn("_in_c", F.lit(1)), "fpr", "left"
    ).select(
        "doc_id",
        "n_ptok",
        "fpr",
        "pkey",
        F.coalesce("_in_c", F.lit(0)).alias("dup_corpus"),
    )
    g = (
        b.filter(F.col("dup_corpus") == 0)
        .groupBy("fpr")
        .agg(F.min("pkey").alias("keeper"))
    )
    m = b.join(g, "fpr", "left").select(
        "doc_id",
        "n_ptok",
        "dup_corpus",
        F.when(
            (F.col("dup_corpus") == 0) & (F.col("pkey") != F.col("keeper")),
            1,
        )
        .otherwise(0)
        .alias("dup_batch"),
    )
    kept = (F.col("dup_corpus") == 0) & (F.col("dup_batch") == 0)
    return m.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"),
        F.sum("dup_corpus").cast("long").alias("n_dup_corpus"),
        F.sum("dup_batch").cast("long").alias("n_dup_batch"),
        F.sum(F.when(kept, F.col("n_ptok")).otherwise(0))
        .cast("long")
        .alias("tok_kept"),
        F.sum(F.when(~kept, F.col("n_ptok")).otherwise(0))
        .cast("long")
        .alias("tok_dropped"),
        F.expr(
            "((count(*) - sum(dup_corpus) - sum(dup_batch)) * 1000000)"
            " DIV count(*)"
        ).alias("novel_micro"),
    )


# ---------------------------------------------------------------------------
# q259 — near-dup paragraph REWRITE: q246's pairs closed transitively,
# one keeper per cluster, surviving text per document.
# ---------------------------------------------------------------------------
def _sql_pkey_of(doc: str, para: str) -> str:
    return (
        f"lpad(CAST({doc} AS VARCHAR), 19, '0') || ':' || "
        f"lpad(CAST({para} AS VARCHAR), 19, '0')"
    )


def _q259_oracle() -> str:
    from .pipeline_queries14 import q246_pairs_chain

    return f"""WITH RECURSIVE {q246_pairs_chain()},
    edges AS (
      SELECT {_sql_pkey_of('doc_a', 'para_a')} AS src,
             {_sql_pkey_of('doc_b', 'para_b')} AS dst
      FROM jpairs
      UNION
      SELECT {_sql_pkey_of('doc_b', 'para_b')},
             {_sql_pkey_of('doc_a', 'para_a')}
      FROM jpairs),
    reach AS (
      SELECT src AS node, dst AS r FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e
        ON reach.r = e.src),
    comp AS (
      SELECT node, least(node, min(r)) AS component
      FROM reach GROUP BY node),
    dropped_keys AS (SELECT node FROM comp WHERE node <> component),
    marked AS (
      SELECT doc_id, para_idx, p_text,
             CASE WHEN {_SQL_PKEY} IN (SELECT node FROM dropped_keys)
                  THEN 1 ELSE 0 END AS dropped
      FROM para)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(count(*) - sum(dropped) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN dropped = 0 THEN p_text END,
                               ' ' ORDER BY para_idx), '') AS kept_text
    FROM marked GROUP BY doc_id"""


@query("q259_paragraph_near_dup_rewrite", _q259_oracle())
def q259(spark, sf_dir):
    """The near-dup analog of q250's rewrite: q246's paragraph pair
    relation is closed transitively (a cluster of mutually-similar
    boilerplate variants is ONE duplicate group even when distant
    members fall below τ pairwise), the minimum ``(doc_id, para_idx)``
    member of each cluster survives, and every document's kept text is
    reassembled in original order — the corpus a boilerplate-stripping
    pass actually emits.  Exact copies are near-dup pairs at J=1.0, so
    this subsumes q250 on shingled paragraphs; sub-3-token paragraphs
    carry no shingles, never pair, and always survive (q250's exact
    pass owns those — both facts deterministic on both engines).

    Composition: ``paragraph_near_dup_pairs`` (q246, off the persisted
    posting index) → ``connected_components`` (q61's operator — the
    oracle runs the same closure as a recursive CTE) → q250's
    reassembly aggregate.  The fixed-width pkeys feed the component
    solve DIRECTLY as string node ids (r11: ``connected_components``
    is type-aware), so there is no dense-id remap — the r10 version's
    ``row_number`` over an UNPARTITIONED window pushed every pair
    endpoint through one task, a job-killer once a boilerplate-heavy
    corpus makes the duplicate population corpus-proportional.  The
    keeper = component = lexicographic min pkey, identical to the
    oracle's ``least`` closure.  The drop-marker join back onto the
    paragraph table is a plain pkey equi-join (high-cardinality,
    unskewed — broadcast would ship the whole duplicate population to
    every executor; AQE may still choose to at small SF, from runtime
    sizes, which is exactly the right division of labor).  The
    corpus-scale work is q246's capped posting join plus one per-doc
    reassembly groupBy."""
    from .operators.graph import connected_components
    from .pipeline_queries14 import (
        _pkey_col,
        keeper_marked,  # noqa: F401  (doc cross-ref: q250's exact twin)
        paragraph_hot_shingles_prebuilt,
        paragraph_near_dup_pairs,
        paragraph_prebuilt_table,
        paragraph_shingles_prebuilt,
    )

    pairs = paragraph_near_dup_pairs(
        paragraph_shingles_prebuilt(spark, sf_dir),
        hot_df=paragraph_hot_shingles_prebuilt(spark, sf_dir),
    )

    def pk(doc: str, para: str):
        return F.concat(
            F.lpad(F.col(doc).cast("string"), 19, "0"),
            F.lit(":"),
            F.lpad(F.col(para).cast("string"), 19, "0"),
        )

    ed = pairs.select(
        pk("doc_a", "para_a").alias("pk_a"),
        pk("doc_b", "para_b").alias("pk_b"),
    )
    comp = connected_components(ed, id_a="pk_a", id_b="pk_b")
    dropped = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("pkey"), F.lit(1).alias("_d")
    )
    mark = (
        paragraph_prebuilt_table(spark, sf_dir)
        .select("doc_id", "para_idx", "p_text", _pkey_col().alias("pkey"))
        .join(dropped, "pkey", "left")
        .select(
            "doc_id",
            "para_idx",
            "p_text",
            F.coalesce("_d", F.lit(0)).alias("dropped"),
        )
    )
    kept_struct = F.when(
        F.col("dropped") == 0, F.struct("para_idx", "p_text")
    )
    return mark.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"),
        (F.count("*") - F.sum("dropped")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["p_text"],
            ),
            " ",
        ).alias("kept_text"),
    )


# ---------------------------------------------------------------------------
# q260 — end-to-end ingest admission: the transactional increment gate
# (r11, VERDICT r10 #3).
# ---------------------------------------------------------------------------
def _q260_oracle() -> str:
    return f"""WITH {_para_cte()},
    fp AS (
      SELECT doc_id, para_idx, n_ptok, md5(p_text) AS fpr,
             {_SQL_PKEY} AS pkey
      FROM para),
    corpusf AS (SELECT DISTINCT fpr FROM fp WHERE doc_id % 10 <> 0),
    sh AS (
      SELECT doc_id, para_idx,
             list_distinct(list_transform(range(1, len(pt) - 1),
               i -> pt[i] || ' ' || pt[i+1] || ' ' || pt[i+2]))
               AS shingles
      FROM para WHERE len(pt) >= 3),
    exc0 AS (SELECT doc_id, para_idx, unnest(shingles) AS s FROM sh
             WHERE doc_id % 10 <> 0),
    hot AS (SELECT s FROM exc0 GROUP BY s
            HAVING count(*) > {_PARA_DF_CAP}),
    exc AS (SELECT doc_id, para_idx, s FROM exc0
            WHERE s NOT IN (SELECT s FROM hot)),
    exb0 AS (SELECT doc_id, para_idx, unnest(shingles) AS s FROM sh
             WHERE doc_id % 10 = 0),
    exb AS (SELECT doc_id, para_idx, s FROM exb0
            WHERE s NOT IN (SELECT s FROM hot)),
    prs AS (
      SELECT b.doc_id AS doc_new, b.para_idx AS para_new,
             c.doc_id AS doc_c, c.para_idx AS para_c,
             CAST(count(*) AS BIGINT) AS common
      FROM exb b JOIN exc c ON b.s = c.s
      GROUP BY 1, 2, 3, 4),
    szd AS (
      SELECT p.doc_new, p.para_new, p.common,
             CAST(sb.n AS BIGINT) AS n_new, CAST(sc.n AS BIGINT) AS n_c
      FROM prs p
      JOIN (SELECT doc_id, para_idx, len(shingles) AS n FROM sh) sb
        ON sb.doc_id = p.doc_new AND sb.para_idx = p.para_new
      JOIN (SELECT doc_id, para_idx, len(shingles) AS n FROM sh) sc
        ON sc.doc_id = p.doc_c AND sc.para_idx = p.para_c),
    nearp AS (
      SELECT DISTINCT doc_new AS doc_id, para_new AS para_idx
      FROM szd
      WHERE common::DOUBLE / (n_new + n_c - common) >= {_PARA_TAU}),
    b AS (
      SELECT doc_id, para_idx, n_ptok, fpr, pkey,
             CASE WHEN fpr IN (SELECT fpr FROM corpusf)
                  THEN 1 ELSE 0 END AS dup_corpus
      FROM fp WHERE doc_id % 10 = 0),
    g AS (SELECT fpr, min(pkey) AS keeper FROM b
          WHERE dup_corpus = 0 GROUP BY fpr),
    m AS (
      SELECT b.doc_id, b.para_idx, b.n_ptok, b.dup_corpus,
             CASE WHEN b.dup_corpus = 0 AND b.pkey <> g.keeper
                  THEN 1 ELSE 0 END AS dup_batch
      FROM b LEFT JOIN g ON b.fpr = g.fpr),
    mn AS (
      SELECT m.doc_id, m.n_ptok, m.dup_corpus, m.dup_batch,
             CASE WHEN m.dup_corpus = 0 AND m.dup_batch = 0
                       AND n.para_idx IS NOT NULL
                  THEN 1 ELSE 0 END AS near_dup
      FROM m LEFT JOIN nearp n
        ON m.doc_id = n.doc_id AND m.para_idx = n.para_idx)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(dup_corpus) AS BIGINT) AS n_dup_corpus,
           CAST(sum(dup_batch) AS BIGINT) AS n_dup_batch,
           CAST(sum(near_dup) AS BIGINT) AS n_near_dup,
           CAST(sum(n_ptok) AS BIGINT) AS tok_total,
           CAST(sum(CASE WHEN dup_corpus = 0 AND dup_batch = 0
                              AND near_dup = 0
                         THEN n_ptok ELSE 0 END) AS BIGINT) AS tok_novel,
           CASE WHEN sum(CASE WHEN dup_corpus = 0 AND dup_batch = 0
                                   AND near_dup = 0
                              THEN n_ptok ELSE 0 END) * 2
                     >= sum(n_ptok)
                THEN 1 ELSE 0 END AS admitted
    FROM mn GROUP BY doc_id"""


@query("q260_ingest_admission", _q260_oracle())
def q260(spark, sf_dir):
    """The end-to-end ingest-admission gate: each arriving document
    (``doc_id % 10 == 0``) classifies every paragraph against the
    durable corpus artifacts — exact vs the per-fingerprint keeper
    STATE (q258's join), batch-internal first-occurrence-wins, then a
    near-dup screen of the exact-novel remainder against the PREBUILT
    posting index (q254's join) — and is admitted when at least half
    its token mass is novel (integer compare, no division).  This is
    the operation a continuously-ingesting pipeline runs per
    micro-batch; ``ingest.admission.admit_and_refresh`` chains the
    fold of the admitted docs into the same artifacts, with
    admit-then-refresh ≡ rebuild pinned locally
    (tests/test_admission.py) — the gate itself is read-only so the
    shared corpus90 root stays stable under the driver.

    Scale shape: both corpus probes are index reads
    (distinct-fingerprint-sized state; read-pruned posting parquet
    with the stop-shingle head from the maintained DF statistic); the
    batch tokenizes only itself.  Classification precedence
    (corpus-exact > batch-exact > near-dup > novel) is pure CASE
    algebra — deterministic in both engines."""
    from .ingest.admission import classify_batch

    root = documents_artifact_root(spark, sf_dir, subset="corpus90")
    batch = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("doc_id") % 10 == 0
    )
    return classify_batch(spark, root, batch, _PARA_TAU, _PARA_DF_CAP)


# ---------------------------------------------------------------------------
# q261 — structural-splitter durable artifact round-trip (r11,
# VERDICT r10 #4).
# ---------------------------------------------------------------------------
@query("q261_structural_artifact_stats", _q256_oracle())
def q261(spark, sf_dir):
    """q256's structural-splitter dedup stats served FROM the durable
    ledger artifact built with ``splitter="structural"`` over the
    derived separator corpus, while the oracle recomputes everything
    from the raw documents table — q257's round-trip proof for the
    OTHER splitter variant: what a real ``\\n\\n``-separated corpus
    persists at ingest is exactly the relation the recompute defines.
    The variant lives under its own root (splitter in the root name
    AND the recorded meta), so the window- and structural-variant
    artifacts can never serve each other; shares q256's oracle
    verbatim — same algebra, different physical source."""
    root = documents_artifact_root(spark, sf_dir, subset="structsep")
    para = read_paragraphs(spark, root).select(
        "doc_id", "para_idx", "p_text", "n_ptok"
    )
    return paragraph_dedup_stats(paragraph_occurrences(para))
