"""Registry entries, round 11: the IVF maintenance honesty gate
(VERDICT r10 #6).

The frozen-centroid contract (FAISS convention: train once, ``add``
forever) is right for serving, but nothing measured what accumulating
increments DO to the index: as drifted vectors pile into lists trained
on yesterday's distribution, per-list balance skews (hot lists slow
every probe touching them) and quantization error grows (recall at
fixed nprobe decays).  q262 reports both, per list, after each
refresh step, FROM the durable artifacts — with a documented retrain
policy and thresholds, so the operational decision ("retrain the
coarse quantizer?") is a query, not a guess.

Retrain policy (the documented thresholds the report's ``retrain``
flag encodes): a list wants retraining when its cumulative mean
quantization error has drifted more than ``_DRIFT_ERR_MICRO`` (5000
micro = 0.005 cosine distance) above its base-build mean, or when its
share of all vectors exceeds ``_SHARE_MICRO_CAP`` (375000 micro = 3x
the balanced 1/8 share — the imbalance FAISS's own guidance flags).
Retraining is the separate offline ``build_vector_artifacts`` rebuild;
this gate is the monitor that schedules it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from .catalog import load_table
from .functions.vectors import (
    indexable_vector,
    lit_cosine_scores,
    sql_cosine,
    sql_indexable,
)
from .ingest.artifacts import (
    ARTIFACT_FORMAT,
    build_vector_artifacts,
    read_ivf_assignments,
    refresh_vectors,
)
from .pipeline_queries10 import _Q217_CENTROIDS
from .registry import query

#: element-wise shifts applied to refresh step 1 / step 2 vectors —
#: simulated distribution drift, deterministic in both engines (pure
#: per-element IEEE double adds, no cross-row float order anywhere)
_Q262_SHIFT1, _Q262_SHIFT2 = 0.05, 0.10

#: retrain thresholds (micro units) — see module docstring
_DRIFT_ERR_MICRO = 5000
_SHARE_MICRO_CAP = 375_000

#: gate-local completion marker: the drift root is final only after
#: the base build AND both refresh steps landed (a crash in between
#: must rebuild, not serve a half-refreshed history)
_DRIFT_READY = "_DRIFT_READY"


def ivf_drift_root(spark, sf_dir: str) -> str:
    """Resolve (building if absent) the drift scenario's durable
    vector artifacts: base vectors (``vec_id % 10 != 0``) assigned to
    the PORTABLE frozen centroids (q217's deployed codebook — what
    keeps the whole gate oracle-able), then two ``refresh_vectors``
    increments of progressively SHIFTED vectors (``% 20 == 0`` at
    +0.05, the rest of ``% 10 == 0`` at +0.10).  Embeddings are cast
    to double before the first write so the merged ledger schema never
    mixes float/double across increments."""
    import hashlib

    from .ingest.artifact_catalog import (
        register_artifact_root,
        warehouse_root,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    path_h = hashlib.md5(
        os.path.abspath(sf_dir).encode("utf-8")
    ).hexdigest()[:10]
    sig = f"{path_h}_{st.st_size}_{st.st_mtime_ns}_v{ARTIFACT_FORMAT}"
    root = os.path.join(
        warehouse_root(),
        f"{os.path.basename(os.path.normpath(sf_dir))}_{sig}_ivfdrift",
    )
    marker = os.path.join(root, _DRIFT_READY)
    if not os.path.exists(marker):
        emb = (
            load_table(spark, sf_dir, "embeddings")
            .where(
                (F.col("vec_id") != 0)
                & indexable_vector(F.col("embedding"))
            )
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"),
            )
        )
        cents = [list(c) for c in _Q217_CENTROIDS]
        build_vector_artifacts(
            spark,
            emb.filter(F.col("vec_id") % 10 != 0),
            root,
            centroids=cents,
        )
        def _shift(d: float):
            # single-arg closure: a two-parameter lambda would be taken
            # as F.transform's (element, index) form and silently add
            # the INDEX instead of the default-bound delta
            return lambda x: x + F.lit(d)

        for pred, delta in (
            (F.col("vec_id") % 20 == 0, _Q262_SHIFT1),
            ((F.col("vec_id") % 10 == 0) & (F.col("vec_id") % 20 != 0),
             _Q262_SHIFT2),
        ):
            inc = emb.filter(pred).select(
                "vec_id",
                F.transform("embedding", _shift(delta)).alias("embedding"),
            )
            refresh_vectors(spark, root, inc)
        register_artifact_root(
            root,
            source_path=src,
            source_size=st.st_size,
            source_mtime_ns=st.st_mtime_ns,
            fmt=ARTIFACT_FORMAT,
            subset="ivfdrift",
            splitter="n/a",
        )
        with open(marker, "a", encoding="utf-8"):
            pass
    return root


def ivf_drift_report(
    asg: DataFrame,
    centroids: list[list[float]],
    err_threshold_micro: int = _DRIFT_ERR_MICRO,
    share_cap_micro: int | None = None,
) -> DataFrame:
    """The drift report over an assignment frame ``(vec_id, list_id,
    embedding, step)``: for each refresh step r and each list, the
    CUMULATIVE (over steps ≤ r) vector count, share, mean quantization
    error (floor-micro of ``1 - cosine(v, centroid[list_id])`` — the
    STORED list_id, so a corrupted assignment surfaces as error, and
    under q262's oracle as a hash mismatch), the error drift vs the
    base build, and the retrain flag.

    Scale shape: one scan of the assignment table computes per-row
    err_micro with the centroid table folded in as literals (the q217
    selectExpr discipline is unnecessary at 8 centroids); the
    triangular step≤r join multiplies only the |steps|x|lists| GRID,
    not the data — the cumulative aggregate is a single groupBy whose
    per-(step,list) partials are |steps|x|lists|-row algebra."""
    spark = asg.sparkSession
    n_lists = len(centroids)
    if share_cap_micro is None:
        # 3x the balanced 1/n_lists share (== _SHARE_MICRO_CAP at the
        # portable 8-centroid codebook)
        share_cap_micro = 3_000_000 // n_lists
    # literal-centroid scores as one JVM-parsed SQL string (q217
    # discipline) — identical trees, ~1 s less construction per call
    sc = lit_cosine_scores("embedding", centroids)
    err = (
        asg.select("step", "list_id", sc.alias("_sc"))
        .select(
            "step",
            "list_id",
            F.floor(
                (
                    F.lit(1.0)
                    - F.element_at(
                        "_sc", (F.col("list_id") + 1).cast("int")
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("err_micro"),
        )
    )
    grid = (
        spark.range(3)
        .select(F.col("id").cast("long").alias("step"))
        .crossJoin(
            spark.range(n_lists).select(
                F.col("id").cast("long").alias("list_id")
            )
        )
    )
    cum = (
        grid.join(
            err.select(
                F.col("step").alias("_s"),
                F.col("list_id").alias("_l"),
                "err_micro",
            ),
            (F.col("_l") == F.col("list_id"))
            & (F.col("_s") <= F.col("step")),
            "left",
        )
        .groupBy("step", "list_id")
        .agg(
            F.count("err_micro").cast("long").alias("n_vecs"),
            F.coalesce(F.sum("err_micro"), F.lit(0))
            .cast("long")
            .alias("err_sum"),
        )
    )
    tot = cum.groupBy("step").agg(
        F.sum("n_vecs").cast("long").alias("total")
    )
    stats = cum.join(tot, "step").select(
        "step",
        "list_id",
        "n_vecs",
        F.expr(
            "CASE WHEN n_vecs > 0 THEN err_sum DIV n_vecs ELSE -1 END"
        ).alias("mean_err_micro"),
        F.expr(
            "CASE WHEN total > 0 THEN (n_vecs * 1000000) DIV total "
            "ELSE 0 END"
        ).alias("share_micro"),
    )
    base = stats.filter(F.col("step") == 0).select(
        F.col("list_id"),
        F.col("n_vecs").alias("_n0"),
        F.col("mean_err_micro").alias("_m0"),
    )
    return stats.join(base, "list_id").select(
        "step",
        "list_id",
        "n_vecs",
        "share_micro",
        "mean_err_micro",
        F.expr(
            "CASE WHEN n_vecs > 0 AND _n0 > 0 "
            "THEN mean_err_micro - _m0 ELSE 0 END"
        ).alias("err_drift_micro"),
        F.expr(
            f"CASE WHEN n_vecs > 0 AND ("
            f"(CASE WHEN n_vecs > 0 AND _n0 > 0 "
            f"THEN mean_err_micro - _m0 ELSE 0 END) > {err_threshold_micro}"
            f" OR share_micro > {share_cap_micro}) THEN 1 ELSE 0 END"
        ).alias("retrain"),
    )


def _q262_oracle() -> str:
    def cent(c) -> str:
        return "([" + ", ".join(repr(v) for v in c) + "]::DOUBLE[])"

    n_lists = len(_Q217_CENTROIDS)
    score_cols = ",\n             ".join(
        f"{sql_cosine('emb', cent(c))} AS s{i}"
        for i, c in enumerate(_Q217_CENTROIDS)
    )
    arr = "[" + ", ".join(f"s{i}" for i in range(n_lists)) + "]"
    return f"""WITH pool AS (
      SELECT vec_id, embedding,
             CASE WHEN vec_id % 10 <> 0 THEN 0
                  WHEN vec_id % 20 = 0 THEN 1 ELSE 2 END AS step
      FROM embeddings
      WHERE vec_id <> 0 AND {sql_indexable('embedding')}),
    shifted AS (
      SELECT vec_id, CAST(step AS BIGINT) AS step,
             CASE step
               WHEN 0 THEN list_transform(embedding, x -> x::DOUBLE)
               WHEN 1 THEN list_transform(embedding,
                                          x -> x::DOUBLE + {_Q262_SHIFT1})
               ELSE list_transform(embedding,
                                   x -> x::DOUBLE + {_Q262_SHIFT2})
             END AS emb
      FROM pool),
    scored AS (
      SELECT vec_id, step,
             {score_cols}
      FROM shifted),
    arrd AS (SELECT vec_id, step, {arr} AS sc FROM scored),
    asg AS (
      SELECT vec_id, step,
             CAST(list_position(sc, list_aggregate(sc, 'max')) - 1
                  AS BIGINT) AS list_id,
             CAST(floor((1 - list_aggregate(sc, 'max')) * 1000000)
                  AS BIGINT) AS err_micro
      FROM arrd),
    grid AS (
      SELECT r.step, l.list_id
      FROM (SELECT CAST(unnest(range(0, 3)) AS BIGINT) AS step) r
      CROSS JOIN (SELECT CAST(unnest(range(0, {n_lists})) AS BIGINT)
                    AS list_id) l),
    cum AS (
      SELECT g.step, g.list_id,
             CAST(count(a.vec_id) AS BIGINT) AS n_vecs,
             CAST(coalesce(sum(a.err_micro), 0) AS BIGINT) AS err_sum
      FROM grid g LEFT JOIN asg a
        ON a.list_id = g.list_id AND a.step <= g.step
      GROUP BY 1, 2),
    tot AS (SELECT step, CAST(sum(n_vecs) AS BIGINT) AS total
            FROM cum GROUP BY step),
    stats AS (
      SELECT c.step, c.list_id, c.n_vecs,
             CASE WHEN c.n_vecs > 0 THEN c.err_sum // c.n_vecs
                  ELSE -1 END AS mean_err_micro,
             CASE WHEN t.total > 0 THEN (c.n_vecs * 1000000) // t.total
                  ELSE 0 END AS share_micro
      FROM cum c JOIN tot t USING (step)),
    base AS (SELECT list_id, n_vecs AS n0, mean_err_micro AS m0
             FROM stats WHERE step = 0)
    SELECT s.step, s.list_id, s.n_vecs, s.share_micro, s.mean_err_micro,
           CASE WHEN s.n_vecs > 0 AND b.n0 > 0
                THEN s.mean_err_micro - b.m0 ELSE 0 END
             AS err_drift_micro,
           CASE WHEN s.n_vecs > 0 AND (
                  (CASE WHEN s.n_vecs > 0 AND b.n0 > 0
                        THEN s.mean_err_micro - b.m0 ELSE 0 END)
                    > {_DRIFT_ERR_MICRO}
                  OR s.share_micro > {_SHARE_MICRO_CAP})
                THEN 1 ELSE 0 END AS retrain
    FROM stats s JOIN base b ON s.list_id = b.list_id"""


@query("q262_ivf_drift_report", _q262_oracle())
def q262(spark, sf_dir):
    """IVF maintenance honesty (VERDICT r10 #6): per-list assignment
    balance and mean quantization error FROM the durable artifacts,
    after each of two refreshes of progressively shifted vectors, with
    the documented retrain thresholds encoded as the ``retrain`` flag
    (module docstring: >0.005 cosine-distance drift over the base
    build, or >3x the balanced share).

    The Spark side reads the maintained assignment table (base build
    on the portable frozen centroids + two ``refresh_vectors``
    increments, all committed through the ledger) and recomputes each
    vector's error against its STORED list's centroid; the oracle
    recomputes assignment AND error from the raw embeddings table —
    so a drifted/corrupted durable assignment shows up as an external
    hash mismatch, not just a bigger number.  All report arithmetic is
    floor-micro BIGINT (per-row floor of deterministic per-element
    double math — no cross-row float sums)."""
    root = ivf_drift_root(spark, sf_dir)
    step = (
        F.when(F.col("vec_id") % 10 != 0, 0)
        .when(F.col("vec_id") % 20 == 0, 1)
        .otherwise(2)
        .cast("long")
    )
    asg = read_ivf_assignments(spark, root).select(
        "vec_id",
        F.col("list_id").cast("long").alias("list_id"),
        "embedding",
        step.alias("step"),
    )
    return ivf_drift_report(asg, [list(c) for c in _Q217_CENTROIDS])


# ---------------------------------------------------------------------------
# q263 — epoch shard plan: materialize the mix manifest into hash-
# sharded, deterministically shuffled training shards.
# ---------------------------------------------------------------------------
#: shard fanout for the epoch plan — at production scale this is the
#: number of output files per epoch (thousands); 64 keeps the gate's
#: report readable while exercising the identical plan shape
_Q263_SHARDS = 64


def _q263_oracle() -> str:
    from .pipeline_queries13 import _Q240_COUNTS_BODY, _q240_alloc_chain
    from .pipeline_queries14 import _TOKS

    n = _Q263_SHARDS
    return f"""WITH {_q240_alloc_chain(_Q240_COUNTS_BODY)},
    d AS (
      SELECT doc_id, source,
             coalesce(len({_TOKS}), 0) AS nt,
             md5(CAST(doc_id AS VARCHAR)) AS ordkey
      FROM documents WHERE source IS NOT NULL),
    cumt AS (
      SELECT doc_id, source, nt,
             CAST(sum(nt) OVER (PARTITION BY source
                  ORDER BY ordkey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM d WHERE nt > 0),
    man AS (
      SELECT c.doc_id, c.nt,
             CASE WHEN a.n_tokens > 0
                  THEN a.alloc_tokens // a.n_tokens ELSE 0 END
             + CASE WHEN c.cum - c.nt <
                       (CASE WHEN a.n_tokens > 0
                             THEN a.alloc_tokens % a.n_tokens ELSE 0 END)
                    THEN 1 ELSE 0 END AS n_repeats
      FROM cumt c JOIN alloc a ON c.source = a.source),
    inst AS (
      SELECT doc_id, nt, unnest(range(n_repeats)) AS rep_idx
      FROM man WHERE n_repeats > 0),
    keyed AS (
      SELECT doc_id, nt, CAST(rep_idx AS BIGINT) AS rep_idx,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                 CAST(rep_idx AS VARCHAR)), 1, 15))::BIGINT
               AS h60
      FROM inst),
    lagged AS (
      SELECT h60 % {n} AS shard, doc_id, nt,
             CASE WHEN lag(doc_id) OVER (
                    PARTITION BY h60 % {n}
                    ORDER BY h60, doc_id, rep_idx) = doc_id
                  THEN 1 ELSE 0 END AS adj
      FROM keyed),
    per AS (
      SELECT shard,
             CAST(count(*) AS BIGINT) AS n_inst,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS tok_sum,
             CAST(sum(adj) AS BIGINT) AS n_adjacent_same_doc
      FROM lagged GROUP BY shard),
    gtot AS (SELECT CAST(sum(tok_sum) AS BIGINT) AS total FROM per)
    SELECT p.shard, p.n_inst, p.n_docs, p.tok_sum, p.n_adjacent_same_doc,
           CAST((p.tok_sum * 1000000) // t.total AS BIGINT)
             AS tok_share_micro
    FROM per p CROSS JOIN gtot t"""


@query("q263_epoch_shard_plan", _q263_oracle())
def q263(spark, sf_dir):
    """Epoch shard plan: the missing planning->execution edge BELOW
    q248.  q240 chooses the per-source token allocation and q248 turns
    it into a per-document repeat manifest; this gate materializes
    that manifest into the thing a trainer actually consumes — a
    DETERMINISTIC GLOBAL SHUFFLE of the repeat-expanded instance
    stream, hash-partitioned into balanced shards — and reports, per
    shard: instance count, distinct docs, token mass, token share
    (floor-micro), and the shuffle-quality metric ``n_adjacent_same_doc``
    (instances of the same document landing adjacent in the within-
    shard order — what a bad epoch shuffle produces and a uniform hash
    key makes rare).

    Determinism: the shuffle key is ``md5_60(doc_id ':' rep_idx)`` —
    the engine-portable 60-bit md5 prefix (`operators/dedup.md5_60`),
    so the shard assignment AND the within-shard order are pure
    functions of the manifest, reproducible across engines, runs and
    cluster sizes (no ``rand()``, no partition-index dependence).

    100 TB shape: the manifest kernel is shared with q248 (one
    per-source cumulative window); the repeat expansion is a narrow
    ``explode(sequence(...))`` bounded by the epoch cap (2 full epochs
    + at most one prefix repeat, so <= 3x corpus instances, no
    shuffle); then ONE hash-partition exchange on ``shard`` with a
    per-shard sort — which is not overhead but the physical plan of
    WRITING the shuffled training shards (repartition(shard) +
    sortWithinPartitions(h60) ahead of a partitioned write).  Shards
    are balanced by construction (uniform 60-bit key), so the
    per-shard sort has no skewed partition; the report itself is a
    map-side-combinable aggregate to |shards| rows.

    The expansion/keying/report bodies live ONCE in
    ``operators/shards.py`` (`manifest_instances` / `shard_report`),
    shared with the executable sink ``write_epoch_shards`` — the gate
    reports on exactly the stream the sink writes."""
    from .functions.text import tokens
    from .operators.shards import manifest_instances, shard_report
    from .pipeline_queries13 import epoch_capped_allocation
    from .pipeline_queries14 import greedy_manifest

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    # ONE tokenize pass (r11, guide §1.2/§8): the allocation counts are
    # the groupBy-sum of the SAME (doc_id, source, nt) relation the
    # manifest window consumes — deriving them from a checkpointed
    # narrow proxy (3 scalar columns, |docs| rows) replaces the second
    # full tokenize scan of the corpus that building them from `docs`
    # again cost (source_token_counts(docs) ≡ d.groupBy(source).sum(nt)
    # by construction — same NULL-source filter, same nt expression).
    # At sf0.1 the local delta is within noise (tokenizing 5k docs is
    # trivial; stash A/B measured 3.2 → 3.0 executor-CPU-s/run and
    # 26 → 22 stages/run) — the change is motivated by the corpus-scan
    # COUNT: at 100 TB the tokenize projection is the dominant map
    # cost, and this plan runs it once instead of twice.
    d = (
        docs.where(F.col("source").isNotNull())
        .select(
            "doc_id",
            "source",
            F.coalesce(F.size(tokens("text")), F.lit(0)).alias("nt"),
        )
        .localCheckpoint(eager=False)
    )
    counts = d.groupBy("source").agg(
        F.sum("nt").cast("long").alias("n_tokens")
    )
    alloc = epoch_capped_allocation(counts).select(
        "source",
        F.col("n_tokens").alias("src_tokens"),
        "alloc_tokens",
    )
    man = greedy_manifest(d, alloc)
    inst = manifest_instances(man, _Q263_SHARDS)
    return shard_report(inst)


# ---------------------------------------------------------------------------
# q264 — takedown round-trip: the removal maintenance externally
# hash-proved from the durable artifacts.
# ---------------------------------------------------------------------------
#: every doc_id divisible by this leaves the corpus in the takedown
#: scenario — deterministic in both engines, ~1/6 of the corpus, and
#: guaranteed to hit shared-fingerprint keepers at sf0.01
_Q264_MOD = 6

#: gate-local completion marker: the scenario root is final only after
#: the full build AND the removal landed (a crash in between must
#: rebuild, not serve a half-removed corpus)
_TAKEDOWN_READY = "_TAKEDOWN_READY"


def takedown_artifact_root(spark, sf_dir: str) -> str:
    """Resolve (building if absent) the takedown scenario's durable
    artifacts: the FULL corpus built first, then ``remove_documents``
    for every ``doc_id % _Q264_MOD == 0`` — the maintained index a
    real pipeline holds after serving a removal request, never a
    rebuild.  Root keyed like every scenario root (path hash + size +
    mtime_ns + format version) and registered in the warehouse
    catalog."""
    import hashlib

    from .ingest.artifact_catalog import (
        register_artifact_root,
        warehouse_root,
    )
    from .ingest.artifacts import (
        build_document_artifacts,
        remove_documents,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    path_h = hashlib.md5(
        os.path.abspath(sf_dir).encode("utf-8")
    ).hexdigest()[:10]
    sig = f"{path_h}_{st.st_size}_{st.st_mtime_ns}_v{ARTIFACT_FORMAT}"
    root = os.path.join(
        warehouse_root(),
        f"{os.path.basename(os.path.normpath(sf_dir))}_{sig}_takedown",
    )
    marker = os.path.join(root, _TAKEDOWN_READY)
    if not os.path.exists(marker):
        import shutil
        import uuid

        from .ingest.artifacts import artifacts_exist
        from .pipeline_queries15 import documents_artifact_root

        # seed the scenario by COPYING the full-corpus root (built
        # once for q257) instead of re-deriving every table — the
        # removal then runs against an index built elsewhere, exactly
        # the production shape, and the driver's ingest block pays one
        # full build, not two.  Ledger manifests hold root-relative
        # paths, so a directory copy is a valid root; staged-via-temp
        # + rename so a racing copier loses atomically.
        if not artifacts_exist(root):
            all_root = documents_artifact_root(spark, sf_dir, subset="all")
            tmp = f"{root}.tmp_{uuid.uuid4().hex}"
            shutil.copytree(all_root, tmp)
            try:
                os.rename(tmp, root)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # lost the race
        docs = load_table(spark, sf_dir, "documents", fan_out=True)
        # the batch_id stamp makes the removal idempotent if two
        # processes race this root before the marker lands: the
        # loser's re-application sees the per-table applied stamps
        # and skips instead of double-subtracting the DF deltas
        remove_documents(
            spark,
            root,
            docs.filter(F.col("doc_id") % _Q264_MOD == 0).select(
                "doc_id"
            ),
            batch_id="q264-takedown",
        )
        register_artifact_root(
            root,
            source_path=src,
            source_size=st.st_size,
            source_mtime_ns=st.st_mtime_ns,
            fmt=ARTIFACT_FORMAT,
            subset="takedown",
            splitter="window",
        )
        with open(marker, "a", encoding="utf-8"):
            pass
    return root


def _q264_oracle() -> str:
    from .pipeline_queries14 import _q245_oracle

    return _q245_oracle(
        src=f"(SELECT * FROM documents WHERE doc_id % {_Q264_MOD} <> 0)"
    )


@query("q264_takedown_artifact_stats", _q264_oracle())
def q264(spark, sf_dir):
    """Takedown round-trip (the q257 pattern applied to REMOVAL):
    q245's per-document dedup stats served FROM durable artifacts
    that were maintained through ``remove_documents`` — full-corpus
    build, then every ``doc_id % 6 == 0`` removed in O(batch) — while
    the oracle recomputes everything from the raw documents table
    MINUS the removed ids.  The external hash pins the whole removal
    path: document-grain deletes, signed DF subtraction, keeper-loss
    rebase to surviving copies, vanished wholly-owned fingerprints —
    any ghost row or stale keeper is a mismatch, not a bigger number.

    Spark side reads ONLY ledger parquet under the scenario root
    (zero documents scans — plan-pinned like q257); the scenario
    builds once per corpus signature and is maintenance, not query,
    cost thereafter."""
    from .ingest.artifacts import read_paragraphs
    from .pipeline_queries14 import (
        paragraph_dedup_stats,
        paragraph_occurrences,
    )

    root = takedown_artifact_root(spark, sf_dir)
    para = read_paragraphs(spark, root).select(
        "doc_id", "para_idx", "p_text", "n_ptok"
    )
    return paragraph_dedup_stats(paragraph_occurrences(para))


# ---------------------------------------------------------------------------
# q265 — epoch-shard churn: which shards must be rewritten when the
# corpus grows under a PINNED plan-of-record allocation.
# ---------------------------------------------------------------------------
#: arriving-batch predicate for the churn scenario: doc_id % 7 == 0.
#: 7 is COPRIME to the testdata's source pattern (source tracks
#: doc_id % 20), so the batch lands inside EVERY planned source — a
#: mod-10 split would align with whole sources and make the batch
#: 100% unplanned (zero churn by construction; caught by the
#: conservation-identity test, not the cross-engine hash, which
#: matched the trivial report just fine)
_Q265_MOD = 7


def _q265_oracle() -> str:
    from .pipeline_queries13 import _q240_alloc_chain
    from .pipeline_queries14 import _TOKS

    n = _Q263_SHARDS
    counts90 = f"""
      SELECT source,
             CAST(sum(coalesce(len({_TOKS}), 0)) AS BIGINT) AS n_tokens
      FROM documents
      WHERE source IS NOT NULL AND doc_id % {_Q265_MOD} <> 0
      GROUP BY source"""

    def man(tag: str, where: str) -> str:
        return f"""d{tag} AS (
      SELECT doc_id, source,
             coalesce(len({_TOKS}), 0) AS nt,
             md5(CAST(doc_id AS VARCHAR)) AS ordkey
      FROM documents WHERE source IS NOT NULL{where}),
    cumt{tag} AS (
      SELECT doc_id, source, nt,
             CAST(sum(nt) OVER (PARTITION BY source
                  ORDER BY ordkey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM d{tag} WHERE nt > 0),
    man{tag} AS (
      SELECT c.doc_id,
             CASE WHEN a.n_tokens > 0
                  THEN a.alloc_tokens // a.n_tokens ELSE 0 END
             + CASE WHEN c.cum - c.nt <
                       (CASE WHEN a.n_tokens > 0
                             THEN a.alloc_tokens % a.n_tokens ELSE 0 END)
                    THEN 1 ELSE 0 END AS n_repeats
      FROM cumt{tag} c JOIN alloc a ON c.source = a.source),
    inst{tag} AS (
      SELECT doc_id, unnest(range(n_repeats)) AS rep_idx
      FROM man{tag} WHERE n_repeats > 0),
    keyed{tag} AS (
      SELECT doc_id, CAST(rep_idx AS BIGINT) AS rep_idx,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                 CAST(rep_idx AS VARCHAR)), 1, 15))::BIGINT
               % {n} AS shard
      FROM inst{tag})"""

    return f"""WITH {_q240_alloc_chain(counts90)},
    {man("0", f" AND doc_id % {_Q265_MOD} <> 0")},
    {man("1", "")},
    j AS (
      SELECT coalesce(o.shard, nw.shard) AS shard,
             CASE WHEN o.doc_id IS NOT NULL AND nw.doc_id IS NOT NULL
                  THEN 1 ELSE 0 END AS kept,
             CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END AS added,
             CASE WHEN nw.doc_id IS NULL THEN 1 ELSE 0 END AS removed
      FROM keyed0 o FULL OUTER JOIN keyed1 nw
        ON o.doc_id = nw.doc_id AND o.rep_idx = nw.rep_idx),
    grid AS (SELECT CAST(unnest(range(0, {n})) AS BIGINT) AS shard)
    SELECT g.shard,
           CAST(coalesce(sum(j.kept), 0) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(j.added), 0) AS BIGINT) AS n_added,
           CAST(coalesce(sum(j.removed), 0) AS BIGINT) AS n_removed,
           CAST(CASE WHEN coalesce(sum(j.added), 0)
                          + coalesce(sum(j.removed), 0) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS touched
    FROM grid g LEFT JOIN j ON j.shard = g.shard
    GROUP BY g.shard"""


@query("q265_epoch_shard_churn", _q265_oracle())
def q265(spark, sf_dir):
    """Epoch-shard churn under corpus growth — the operational
    question after q263's sink exists: WHEN the corpus changes, which
    shard files must be rewritten?  Scenario (q254's split): the
    allocation is the PLAN OF RECORD, computed when the corpus was
    ``doc_id % 10 != 0``; the batch then arrives and the pipeline
    re-materializes shards for the full corpus UNDER THE PINNED plan
    (trainers pin manifests per run — re-planning is a separate,
    deliberate act).  Because shard assignment is a pure function of
    ``(doc_id, rep_idx)``, unchanged scheduled instances land in the
    SAME shard both times; churn is exactly the arriving docs'
    instances plus the remainder-prefix boundary shifts the new docs
    cause inside each source's md5 order (reported honestly — a
    pinned-plan world still moves the greedy prefix).  Per shard:
    kept/added/removed instance counts and the rewrite flag.  A
    source that exists only in the batch has no plan row and is not
    scheduled (inner join against the allocation) — unplanned
    sources are a re-plan, not a shard rewrite.

    100 TB shape: two manifest windows (per-source, the q248 kernel)
    + one narrow expansion each + ONE full-outer equi-join on the
    instance key, hash-partitioned — the join IS the rewrite plan's
    cost, bounded by the two instance streams; the report aggregates
    map-side to |shards| rows anchored on a literal shard grid so
    untouched shards report zeros rather than vanishing."""
    from .functions.text import tokens
    from .operators.shards import manifest_instances
    from .pipeline_queries13 import epoch_capped_allocation
    from .pipeline_queries14 import greedy_manifest

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    # ONE tokenize pass for all three consumers (r11, q263's
    # restructure): the corpus tokenizes once into a checkpointed
    # narrow (doc_id, source, nt) proxy; the plan-of-record side is a
    # FILTER of it (the batch filter commutes with the NULL-source
    # filter and the nt projection), and the allocation counts are its
    # groupBy-sum — the previous shape ran the full tokenize scan
    # three times (counts + old manifest + new manifest).  Local delta
    # at sf0.1 is within noise (see q263's note); the motivation is
    # the 100 TB corpus-scan count, 3 → 1.
    nt_all = (
        docs.where(F.col("source").isNotNull())
        .select(
            "doc_id",
            "source",
            F.coalesce(F.size(tokens("text")), F.lit(0)).alias("nt"),
        )
        .localCheckpoint(eager=False)
    )
    nt90 = nt_all.filter(F.col("doc_id") % _Q265_MOD != 0)
    alloc = epoch_capped_allocation(
        nt90.groupBy("source").agg(
            F.sum("nt").cast("long").alias("n_tokens")
        )
    ).select(
        "source",
        F.col("n_tokens").alias("src_tokens"),
        "alloc_tokens",
    )

    man_old = greedy_manifest(nt90, alloc)
    man_new = greedy_manifest(nt_all, alloc)
    old = manifest_instances(man_old, _Q263_SHARDS).select(
        "doc_id", "rep_idx", "shard", F.lit(1).alias("_o")
    )
    new = manifest_instances(man_new, _Q263_SHARDS).select(
        F.col("doc_id").alias("n_doc"),
        F.col("rep_idx").alias("n_rep"),
        F.col("shard").alias("n_shard"),
        F.lit(1).alias("_n"),
    )
    j = old.join(
        new,
        (F.col("doc_id") == F.col("n_doc"))
        & (F.col("rep_idx") == F.col("n_rep")),
        "full_outer",
    ).select(
        F.coalesce("shard", "n_shard").alias("shard"),
        F.when(F.col("_o").isNotNull() & F.col("_n").isNotNull(), 1)
        .otherwise(0)
        .alias("kept"),
        F.when(F.col("_o").isNull(), 1).otherwise(0).alias("added"),
        F.when(F.col("_n").isNull(), 1).otherwise(0).alias("removed"),
    )
    grid = spark.range(_Q263_SHARDS).select(
        F.col("id").cast("long").alias("shard")
    )
    agg = j.groupBy("shard").agg(
        F.sum("kept").cast("long").alias("k"),
        F.sum("added").cast("long").alias("a"),
        F.sum("removed").cast("long").alias("r"),
    )
    return grid.join(agg, "shard", "left").select(
        "shard",
        F.coalesce("k", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("a", F.lit(0)).cast("long").alias("n_added"),
        F.coalesce("r", F.lit(0)).cast("long").alias("n_removed"),
        F.when(
            F.coalesce("a", F.lit(0)) + F.coalesce("r", F.lit(0)) > 0, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("touched"),
    )
