"""Tests for the round-2 curation operators: chunking, PII redaction,
deterministic sampling, winnowing fingerprints, embedding quantization,
decontamination, change-tracking shapes, and the approx-quantile sketch
bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.operators import dedup, sampling, similarity, text_analysis

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------
def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(20))
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    out = text_analysis.chunk_documents(df, chunk_tokens=8, overlap=2)
    rows = {r["chunk_idx"]: r for r in out.collect()}
    # stride 6 over 20 tokens → starts 0, 6, 12, 18
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert rows[1]["chunk_text"].split() == [f"t{i}" for i in range(6, 14)]
    assert rows[3]["chunk_text"].split() == ["t18", "t19"]  # short tail
    assert rows[3]["n_chunk_tokens"] == 2
    # overlap property: last 2 tokens of chunk i = first 2 of chunk i+1
    for i in range(3):
        assert (
            rows[i]["chunk_text"].split()[-2:]
            == rows[i + 1]["chunk_text"].split()[:2]
        )
    # empty document produced no chunks
    assert out.filter(F.col("doc_id") == 2).count() == 0


def test_chunk_documents_covers_every_token(docs):
    out = text_analysis.chunk_documents(docs, chunk_tokens=16, overlap=4)
    # chunk ends are monotone in start (slice truncates at n_tokens), so
    # max(start + len) == n_tokens ⟺ the windows cover [0, n); combined
    # with stride (12) < chunk (16) there are no interior gaps either
    from mtg_bulk_database_spark.functions.text import tokens

    n_tok = docs.select("doc_id", F.size(tokens("text")).alias("n")).filter(
        F.col("n") > 0
    )
    covered = out.groupBy("doc_id").agg(
        F.max(F.col("chunk_idx") * 12 + F.col("n_chunk_tokens")).alias("end")
    )
    j = covered.join(n_tok, on="doc_id", how="full")
    assert j.filter(
        F.col("end").isNull() | F.col("n").isNull() | (F.col("end") != F.col("n"))
    ).count() == 0


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text_analysis.chunk_documents(df, chunk_tokens=8, overlap=8)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
def test_pii_redaction_fixture(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk and carol@ex.io now"),
            (2, "server 10.0.255.3 called 192.168.1.1 twice"),
            (3, "call 555-123-4567 or 555.987.6543"),
            (4, "clean text, nothing to scrub"),
            (5, "alice@ex.io from 10.0.0.1 dialed 555-000-1111"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text_analysis.with_pii_redacted(df).collect()}
    assert out[1]["n_email"] == 2 and "<EMAIL>" in out[1]["redacted_text"]
    assert "bob" not in out[1]["redacted_text"]
    assert out[2]["n_ip"] == 2 and out[2]["redacted_text"].count("<IP>") == 2
    assert out[3]["n_phone"] == 2
    assert out[4]["redacted_text"] == out[4]["text"]
    assert (out[5]["n_email"], out[5]["n_ip"], out[5]["n_phone"]) == (1, 1, 1)
    assert out[5]["redacted_text"] == "<EMAIL> from <IP> dialed <PHONE>"


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------
def test_hash_sample_deterministic_and_sized(docs):
    s1 = sampling.hash_sample(docs, 0.3, "doc_id").select("doc_id")
    s2 = sampling.hash_sample(docs.repartition(7), 0.3, "doc_id").select("doc_id")
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2, "sample must not depend on partitioning"
    n = docs.count()
    assert 0.2 * n < len(ids1) < 0.4 * n, f"{len(ids1)}/{n} far from 30%"


def test_stratified_sample_respects_fractions(docs):
    mix = {"en": 1.0, "zh": 0.0}
    out = sampling.stratified_hash_sample(docs, "lang", mix, "doc_id")
    got = dict(
        (r["lang"], r["n"])
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    n_en = docs.filter(F.col("lang") == "en").count()
    assert got.get("en") == n_en, "fraction 1.0 must keep every row"
    assert "zh" not in got, "fraction 0.0 must drop the stratum"
    # unlisted strata use default_fraction=0.0
    assert set(got) == {"en"}


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------
def test_winnow_shared_substring_guarantee(spark):
    # winnowing guarantee: a shared (normalized) substring of length
    # ≥ k + window − 1 = 8 chars yields ≥1 common fingerprint
    shared = "abcdefghij"  # 10 chars ≥ 8
    df = spark.createDataFrame(
        [
            (1, f"xxqq {shared} zzpp"),
            (2, f"totally other {shared} words"),
            (3, "nothing in common here at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: set(r["winnow_fps"])
        for r in text_analysis.with_winnow_fingerprints(df).collect()
    }
    assert out[1] & out[2], "shared substring must share a fingerprint"
    # identical text → identical fingerprint sets regardless of id
    df2 = spark.createDataFrame(
        [(7, "xyz same words xyz"), (8, "xyz same words xyz")],
        "doc_id long, text string",
    )
    o2 = {
        r["doc_id"]: r["winnow_fps"]
        for r in text_analysis.with_winnow_fingerprints(df2).collect()
    }
    assert o2[7] == o2[8]


def test_winnow_short_and_empty_edge(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "abcdef")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["winnow_fps"]
        for r in text_analysis.with_winnow_fingerprints(df, k=5, window=4).collect()
    }
    assert out[1] == []  # no 5-grams at all
    assert out[2] == []  # still shorter than k
    assert len(out[3]) == 1  # 2 hashes < window → single min fingerprint


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------
def test_quantization_bounds_and_recall(emb):
    q = similarity.with_quantized_embedding(emb)
    # int8 range and per-element reconstruction error ≤ 0.5/scale
    bad = q.select(
        F.exists(
            "q_embedding", lambda v: (v > 127) | (v < -127)
        ).alias("oob")
    ).filter("oob")
    assert bad.count() == 0
    err = q.select(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            similarity.dequantize(F.col("q_embedding"), F.col("q_scale")),
            lambda a, b: F.abs(a - b) * F.col("q_scale"),
        ).alias("scaled_err")
    ).select(F.array_max("scaled_err").alias("m"))
    assert err.agg(F.max("m")).first()[0] <= 0.5 + 1e-9

    # ANN recall over dequantized vectors vs full precision
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    pool_full = emb.filter(F.col("vec_id") != 0)
    pool_q = q.filter(F.col("vec_id") != 0).select(
        "vec_id",
        similarity.dequantize(F.col("q_embedding"), F.col("q_scale")).alias(
            "embedding"
        ),
    )
    top_full = [
        r["vec_id"] for r in similarity.brute_force_topk(pool_full, qv, k=10).collect()
    ]
    top_q = [
        r["vec_id"] for r in similarity.brute_force_topk(pool_q, qv, k=10).collect()
    ]
    recall = len(set(top_full) & set(top_q)) / 10
    assert recall >= 0.8, f"int8 recall@10 {recall}"


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------
def test_benchmark_overlap_flags_duplicates(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (2, "quick brown fox said hello"),  # shares 'quick brown fox'
            (3, "completely unrelated content right here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_overlapping_ngrams"]
        for r in dedup.benchmark_ngram_overlap(
            train, bench, "text", "doc_id", n=3
        ).collect()
    }
    assert out[1] == 7  # all 7 trigrams of the 9-token doc
    assert out[2] == 1
    assert 3 not in out


# ---------------------------------------------------------------------------
# change tracking: SCD2 interval properties
# ---------------------------------------------------------------------------
def test_scd2_intervals_partition_timeline(spark):
    from mtg_bulk_database_spark.registry import load_registry

    Q, _ = load_registry()
    out = Q["q79_scd2_intervals"](spark, SF_DIR)
    # exactly one open (current) interval per key
    cur = out.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open")
    )
    assert cur.filter(F.col("n_open") != 1).count() == 0
    # closed intervals are well-formed and chain without gaps
    closed = out.filter(~F.col("is_current"))
    assert closed.filter(F.col("valid_from") > F.col("valid_to")).count() == 0


# ---------------------------------------------------------------------------
# binned range join
# ---------------------------------------------------------------------------
def test_binned_range_join_matches_naive_and_avoids_nested_loop(spark):
    from mtg_bulk_database_spark.operators.rangejoin import binned_range_join

    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 60 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    binned = binned_range_join(
        clicks, purchases, "click_ts", "start_ts", "end_ts", bin_width=3600
    )
    naive = clicks.join(
        purchases,
        (F.col("click_ts") >= F.col("start_ts"))
        & (F.col("click_ts") < F.col("end_ts")),
    )
    key = ["click_id", "purchase_id"]
    assert sorted(map(tuple, binned.select(key).collect())) == sorted(
        map(tuple, naive.select(key).collect())
    )
    # the whole point: no BroadcastNestedLoopJoin in the binned plan
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "NestedLoop" in naive._jdf.queryExecution().executedPlan().toString()


def test_binned_range_join_end_inclusive_and_guards(spark):
    from mtg_bulk_database_spark.operators.rangejoin import binned_range_join

    pts = spark.createDataFrame([(1, 10), (2, 20), (3, 25)], "pid long, v long")
    ivs = spark.createDataFrame([(100, 10, 20)], "iid long, lo long, hi long")
    half_open = binned_range_join(pts, ivs, "v", "lo", "hi", bin_width=7)
    assert sorted(r["pid"] for r in half_open.collect()) == [1]
    closed = binned_range_join(
        pts, ivs, "v", "lo", "hi", bin_width=7, end_inclusive=True
    )
    assert sorted(r["pid"] for r in closed.collect()) == [1, 2]
    with pytest.raises(ValueError, match="share column names"):
        binned_range_join(pts, pts, "v", "v", "v", bin_width=7)
    with pytest.raises(ValueError, match="bin_width"):
        binned_range_join(pts, ivs, "v", "lo", "hi", bin_width=0)


# ---------------------------------------------------------------------------
# approx quantiles: sketch error bound vs exact
# ---------------------------------------------------------------------------
def test_approx_quantiles_error_bound(docs):
    approx = docs.agg(
        F.percentile_approx("n_chars", [0.05, 0.5, 0.95], 10_000).alias("a")
    ).first()["a"]
    n = docs.count()
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    for q, got in zip([0.05, 0.5, 0.95], approx):
        # rank of the returned value must be within ±1% of the target
        lo = sum(1 for v in vals if v < got)
        hi = sum(1 for v in vals if v <= got)
        assert lo / n - 0.011 <= q <= hi / n + 0.011, (q, got, lo / n, hi / n)
