"""End-to-end corpus curation — the composed pipeline a training-data
run executes, built entirely from this engine's operators:

    quality filter → repetition filter → fingerprint dedup →
    near-dup clustering (keep representatives) → deterministic split

Every stage is deterministic (min-id representatives, content-hash
split), so the WHOLE pipeline carries a DuckDB oracle (q71) — the
composition is differential-tested, not just the pieces.

Scale shape: two columnar projections (scores/fingerprint), one
hash-shuffle (fingerprint groupBy), the posting-list jaccard join (never
all-pairs), the per-round component shuffles on the (tiny) near-dup pair
set, and one broadcast-able join back. No collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text_analysis
from .graph import connected_components


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_top_token_ratio: float = 0.3,
    jaccard_threshold: float = 0.8,
    k_shingle: int = 3,
    shingles_df: DataFrame | None = None,
    shingles_k: int = 3,
) -> DataFrame:
    """Curated documents: one row per kept doc with its curation
    metadata (``n_tokens``, ``quality_score``, ``split``).

    Kept = passes quality/repetition gates AND is the min-doc_id
    representative of both its fingerprint group (exact/shuffled dups)
    and its near-dup cluster (transitive jaccard ≥ threshold).

    ``shingles_df``: the corpus-wide prebuilt ``(doc_id, shingles)``
    posting index (``shingle_prebuilt_table`` — the same ingest
    artifact q32/q224 read).  A document's shingles don't depend on
    the corpus, so the near-dup stage can semi-join the artifact down
    to the gate survivors instead of re-tokenizing them.  The r9
    interleaved A/B at sf0.1 measured a small win (mean 2.68 s →
    2.54 s warm; the survivor re-tokenize was NOT the dominant term —
    the gate-scoring HOF projection and the posting join are), so
    this is primarily the artifact-reuse discipline: at 100 TB the
    survivor re-tokenize is a full extra pass over kept text that the
    persisted index already paid for.  When absent, shingles build
    in-query as before.

    ``shingles_k`` declares the shingle width the artifact was BUILT
    with (the prebuilt tables are k=3); passing ``shingles_df`` with a
    mismatched ``k_shingle`` is rejected loudly — silently joining a
    k=3 index into a k=4 request would produce wrong pairs (ADVICE r9
    #1).  The artifact must also COVER ``docs``' doc_ids (it is
    semi-joined down, so survivors absent from the index would simply
    never pair): pass the index built from the same corpus."""
    if shingles_df is not None and k_shingle != shingles_k:
        raise ValueError(
            f"shingles_df was built with k={shingles_k} but "
            f"k_shingle={k_shingle} was requested — rebuild the "
            "artifact at the requested width or drop shingles_df"
        )
    scored = text_analysis.with_repetition_metrics(
        text_analysis.with_quality_score(docs)
    )
    scored = text_analysis.with_fingerprint(scored)
    gated = scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("top_token_ratio") <= max_top_token_ratio)
        # checkpoint: the dedup self-join consumes gated on BOTH sides
        # (group-mins + probe), and without a cut the scoring HOF
        # projection re-executes per branch — measured 3.5s → 0.3s at
        # sf0.1. Same for `exact` below, which feeds the jaccard join's
        # posting build AND the final representative join.
    ).localCheckpoint(eager=False)

    # fingerprint dedup: keep the min doc_id per canonical-token-set hash
    reps = gated.groupBy("fingerprint").agg(F.min("doc_id").alias("_keep_id"))
    exact = (
        gated.join(reps, on="fingerprint")
        .filter(F.col("doc_id") == F.col("_keep_id"))
        .drop("_keep_id")
        .localCheckpoint(eager=False)
    )

    # near-dup clusters over the survivors; drop non-representatives
    sh_sub = None
    if shingles_df is not None:
        sh_sub = shingles_df.join(
            exact.select("doc_id"), "doc_id", "semi"
        ).localCheckpoint(eager=False)
    pairs = dedup.ngram_jaccard_pairs(
        exact,
        "text",
        "doc_id",
        k=k_shingle,
        threshold=jaccard_threshold,
        shingles_df=sh_sub,
    )
    comp = connected_components(pairs)
    curated = (
        exact.join(comp, exact["doc_id"] == comp["node"], "left")
        .filter(F.col("node").isNull() | (F.col("component") == F.col("doc_id")))
        .drop("node", "component")
    )

    return text_analysis.with_train_split(curated).select(
        "doc_id", "source", "n_tokens", "quality_score", "split"
    )


def write_curated(
    df: DataFrame,
    path: str,
    partition_by: str = "split",
    files_per_partition: int = 8,
) -> None:
    """Materialize a curated corpus partitioned by split (train/val/test
    land in separate directories, so a training job reads its split with
    partition pruning — no full-corpus scan, no row filter).

    File-count control: shuffling on the partition column ALONE would
    hash a 3-value column into 3 tasks — one executor core writing ~90%
    of the corpus (the train split) serially. Adding a bounded row-hash
    subkey keeps ≤ ``files_per_partition`` coherent files per split
    while every one of them writes in parallel; size it so file count ×
    target file size ≈ split size at your scale.
    """
    subkey = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns if c != partition_by]),
        F.lit(files_per_partition),
    )
    (
        df.repartition(F.col(partition_by), subkey)
        .write.mode("overwrite")
        .partitionBy(partition_by)
        .parquet(path)
    )
