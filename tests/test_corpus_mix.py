"""Property tests for the statistical-LM / corpus-assembly operators:
bigram-LM scoring (q110), temperature mixing (q111), and ingest
novelty (q112). The value-level gate is the DuckDB parity suite; these
pin the operator INVARIANTS that parity alone wouldn't explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.functions.text import tokens
from mtg_bulk_database_spark.operators import sampling, text_analysis
from mtg_bulk_database_spark.registry import load_registry

QUERIES, _ = load_registry()
SF_DIR = "/root/testdata/sf0.01"


def test_bigram_lm_counts_and_sign(spark):
    """n_bigrams == max(0, n_tokens - 1) for every document; add-one
    smoothing keeps every probability ≤ 1 so log-prob sums are ≤ 0;
    short documents (< 2 tokens) score exactly 0."""
    docs = load_table(spark, SF_DIR, "documents")
    scored = text_analysis.bigram_lm_score(docs)
    joined = scored.join(
        docs.select("doc_id", F.size(tokens("text")).alias("n_tok")),
        "doc_id",
    )
    bad = joined.filter(
        (F.col("n_bigrams") != F.greatest(F.lit(0), F.col("n_tok") - 1))
        | (F.col("sum_logprob") > 0)
        | ((F.col("n_bigrams") == 0) & (F.col("avg_logprob") != 0.0))
    )
    assert bad.count() == 0
    assert scored.count() == docs.count()


def test_bigram_lm_repeated_text_scores_higher(spark):
    """A document repeating the corpus's own frequent bigrams must
    out-score one of corpus-unseen token pairs: the model really is
    trained on the corpus, not a constant."""
    docs = load_table(spark, SF_DIR, "documents")
    scored = text_analysis.bigram_lm_score(docs).filter(F.col("n_bigrams") > 0)
    row = scored.agg(
        F.max("avg_logprob").alias("hi"), F.min("avg_logprob").alias("lo")
    ).first()
    assert row.hi > row.lo  # non-degenerate spread
    assert row.hi <= 0.0


def test_temperature_mix_deterministic_and_budget(spark):
    """The mix is a pure function of content (partitioning-independent),
    never exceeds the global budget, and fills each source to exactly
    min(target, available)."""
    docs = load_table(spark, SF_DIR, "documents")
    kept = sampling.temperature_mix(docs)
    kept_repart = sampling.temperature_mix(docs.repartition(7))
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == sorted(r.doc_id for r in kept_repart.collect())

    n_total = docs.count()
    assert len(ids) <= n_total // 2

    per = kept.groupBy("source", "source_target").agg(
        F.count("*").alias("kept_n"), F.max("mix_rank").alias("max_rank")
    )
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    bad = (
        per.join(counts, "source")
        .filter(
            (F.col("kept_n") != F.least("source_target", "n_s"))
            | (F.col("max_rank") > F.col("source_target"))
        )
    )
    assert bad.count() == 0


def test_temperature_mix_flattens_head_sources(spark):
    """α = 0.5 keeps a LARGER fraction of smaller sources: the kept
    fraction must be non-increasing in source size (up to the ±1 doc
    floor slack)."""
    docs = load_table(spark, SF_DIR, "documents")
    kept = sampling.temperature_mix(docs)
    per = (
        kept.groupBy("source")
        .agg(F.count("*").alias("kept_n"))
        .join(docs.groupBy("source").agg(F.count("*").alias("n_s")), "source")
        .collect()
    )
    rows = sorted(per, key=lambda r: r.n_s)
    for small, large in zip(rows, rows[1:]):
        if small.n_s == large.n_s:
            continue
        frac_small = small.kept_n / small.n_s
        # +1 floor slack on the larger source's kept count
        frac_large_upper = (large.kept_n + 1) / large.n_s
        assert frac_small <= frac_large_upper or small.kept_n == small.n_s


def test_novelty_is_exact_set_difference(spark):
    """q112 returns exactly the incoming documents whose canonical
    fingerprint is absent from the reference (train) corpus."""
    docs = load_table(spark, SF_DIR, "documents")
    fp = text_analysis.with_fingerprint(text_analysis.with_train_split(docs))
    ref = {
        r.fingerprint
        for r in fp.filter("split = 'train'").select("fingerprint").collect()
    }
    inc = fp.filter("split <> 'train'").select("doc_id", "fingerprint").collect()
    expected = {r.doc_id for r in inc if r.fingerprint not in ref}

    result = QUERIES["q112_novel_against_corpus"](spark, SF_DIR).collect()
    got = {r.doc_id for r in result}
    assert got == expected
    assert not {r.fingerprint for r in result} & ref


def test_remove_boilerplate_conserves_and_orders_tokens(spark):
    """Removal accounting: kept + removed chunk counts equal the total
    chunk count per document, and every cleaned text is the original
    token sequence with whole removed chunks excised (order preserved,
    nothing invented)."""
    docs = load_table(spark, SF_DIR, "documents")
    chunks = text_analysis.chunk_documents(
        docs, chunk_tokens=16, overlap=0
    )
    total = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    out = text_analysis.remove_repeated_passages(docs)
    bad = (
        out.join(total, "doc_id", "left")
        .filter(
            F.col("n_kept_chunks") + F.col("n_removed_chunks")
            != F.coalesce("n_chunks", F.lit(0))
        )
    )
    assert bad.count() == 0
    # cleaned tokens are a subsequence of the original tokens
    sample = (
        out.filter(F.col("n_removed_chunks") > 0)
        .join(docs.select("doc_id", "text"), "doc_id")
        .limit(20)
        .collect()
    )
    assert sample, "expected some documents to lose chunks at sf0.01"
    for r in sample:
        orig = r.text.lower().split()
        clean = r.clean_text.split()
        it = iter(orig)
        assert all(tok in it for tok in clean), r.doc_id


def test_soft_dedup_weights_sum_to_cluster_count(spark):
    """Σ sample_weight == number of distinct fingerprints (each dup
    cluster contributes exactly one document's worth of weight)."""
    out = QUERIES["q119_soft_dedup_weights"](spark, SF_DIR)
    agg = out.agg(
        F.sum("sample_weight").alias("s"),
        F.count_distinct("fingerprint").alias("d"),
        F.min("sample_weight").alias("mn"),
        F.max("sample_weight").alias("mx"),
    ).first()
    assert abs(agg.s - agg.d) < 1e-9
    assert 0 < agg.mn <= agg.mx <= 1.0


def test_crosscorpus_lm_differs_from_selftrained_and_is_total(spark):
    """q120 trains on the train split only: every document (including
    ones with bigrams unseen in training — the left-join backoff) still
    gets a finite non-positive score, and the reference-trained model
    scores differently from the self-trained one."""
    docs = load_table(spark, SF_DIR, "documents")
    cross = QUERIES["q120_crosscorpus_lm_score"](spark, SF_DIR)
    assert cross.count() == docs.count()
    bad = cross.filter(
        (F.col("sum_logprob") > 0) | F.isnan("avg_logprob")
    )
    assert bad.count() == 0
    self_t = QUERIES["q110_bigram_lm_score"](spark, SF_DIR)
    diff = (
        cross.select("doc_id", F.col("avg_logprob").alias("a"))
        .join(self_t.select("doc_id", F.col("avg_logprob").alias("b")), "doc_id")
        .filter(F.col("a") != F.col("b"))
    )
    assert diff.count() > 0


# --- weighted A-ES sampling (q198) -----------------------------------------


def _py_aes_score(key: str, j: int) -> float:
    """Driver-side reference: same md5₆₀ uniform, same iterated sqrt."""
    import hashlib
    import math

    m = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    u = (m + 1) / float(1 << 60)
    for _ in range(max(0, min(j, sampling._MAX_WEIGHT_LOG2))):
        u = math.sqrt(u)
    return u


def test_aes_score_matches_python_reference_bitwise(spark):
    rows = [(f"k{i}", i % 5) for i in range(64)]
    df = spark.createDataFrame(rows, "key string, j int").withColumn(
        "s", sampling.aes_score(F.col("key"), F.col("j"))
    )
    for r in df.collect():
        assert r["s"] == _py_aes_score(r["key"], r["j"]), r["key"]


def test_weighted_topk_favors_heavy_class(spark):
    # 500 keys in class 0 (w=1) vs 500 in class 3 (w=8): among the top
    # 100 A-ES winners the heavy class must dominate (E[share] = 8/9).
    rows = [(f"d{i}", 0 if i < 500 else 3) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, j int")
    top = sampling.weighted_hash_topk(df, 100, "key", "j").collect()
    heavy = sum(1 for r in top if r["j"] == 3)
    assert heavy > 70, heavy


def test_weighted_topk_global_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(f"d{i}", i % 4) for i in range(100)], "key string, j int"
    )
    plan = sampling.weighted_hash_topk(df, 10, "key", "j")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_topk_excludes_null_keys_and_clamps(spark):
    df = spark.createDataFrame(
        [(None, 2), ("a", None), ("b", 99), ("c", -5)],
        "key string, j int",
    )
    out = sampling.weighted_hash_topk(df, 10, "key", "j").collect()
    keys = {r["key"] for r in out}
    assert keys == {"a", "b", "c"}  # NULL key dropped, others kept
    by_key = {r["key"]: r["aes_score"] for r in out}
    # j=99 clamps to the max class; j=-5 behaves as weight 1; NULL j
    # falls to the max-class ELSE arm (CASE semantics, both engines)
    assert by_key["b"] == _py_aes_score("b", sampling._MAX_WEIGHT_LOG2)
    assert by_key["c"] == _py_aes_score("c", 0)
    assert by_key["a"] == _py_aes_score("a", sampling._MAX_WEIGHT_LOG2)
