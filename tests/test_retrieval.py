"""Ranked-retrieval operator tests: BM25 semantics (idf ordering,
length normalization, candidate gating) and RRF fusion properties
(full-outer contribution, rank determinism). The exact cross-engine
value parity is covered by the q89/q94 DuckDB oracles; these tests pin
the *ranking behavior* the scores must induce."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.operators import retrieval

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, "vector vector vector index"),          # high tf, short
        (2, "vector " + "filler " * 200),           # tf=1, very long
        (3, "vector index structure"),              # tf=1, short
        (4, "nothing relevant at all here"),        # tf=0
        (5, "index index"),                         # rare-term only
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_gates_and_orders(toy):
    scores = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores(toy, ["vector", "index"]).collect()
    }
    # docs with no probe term are filtered out entirely
    assert 4 not in scores
    assert set(scores) == {1, 2, 3, 5}
    # higher tf on the same term family beats single occurrence
    assert scores[1] > scores[3]
    # length normalization: same tf=1 for 'vector', doc 2 is 50x longer
    assert scores[3] > scores[2]
    # every surviving score is positive (Lucene-style +1 idf never negative)
    assert all(s > 0 for s in scores.values())


def test_bm25_idf_favors_rarer_term(spark):
    # 'rare' appears in 1 of 20 docs, 'common' in all 20. A doc matching
    # only 'rare' must outscore a doc matching only 'common' (equal tf/dl).
    rows = [(0, "rare pad pad")] + [(i, "common pad pad") for i in range(1, 20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scores = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores(df, ["rare", "common"]).collect()
    }
    assert scores[0] > scores[1]
    # and the idf gap matches the closed form within rounding
    n, df_rare, df_common = 20, 1, 19
    idf_rare = round(math.log(1 + (n - df_rare + 0.5) / (df_rare + 0.5)), 6)
    idf_common = round(math.log(1 + (n - df_common + 0.5) / (df_common + 0.5)), 6)
    assert scores[0] / scores[1] == pytest.approx(idf_rare / idf_common, rel=1e-6)


def test_bm25_plan_stays_columnar(docs):
    plan = retrieval.bm25_scores(docs, ["vector", "merge"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan  # stats row broadcast, not shuffled


def test_rrf_full_outer_and_ties(spark):
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], ["doc_id", "s_a"]
    )
    b = spark.createDataFrame(
        [(3, 0.95), (4, 0.5)], ["doc_id", "s_b"]
    )
    fused = {
        r["doc_id"]: r["rrf"]
        for r in retrieval.rrf_fuse(a, b, "doc_id", "s_a", "s_b").collect()
    }
    # full outer: ids present in only one list still contribute
    assert set(fused) == {1, 2, 3, 4}
    assert fused[1] == pytest.approx(1 / 61, abs=1e-6)
    assert fused[4] == pytest.approx(1 / 62, abs=1e-6)
    # id 3: rank 3 in a, rank 1 in b
    assert fused[3] == pytest.approx(1 / 63 + 1 / 61, abs=1e-6)
    # present-in-both beats either single top contribution here
    assert fused[3] > fused[1]


def test_rrf_deterministic_under_score_ties(spark):
    # equal scores break ties by id ascending -> stable ranks across runs
    a = spark.createDataFrame(
        [(10, 0.5), (2, 0.5), (7, 0.5)], ["doc_id", "s_a"]
    )
    out1 = retrieval.rrf_fuse(a, a, "doc_id", "s_a", "s_a").collect()
    out2 = retrieval.rrf_fuse(
        a.repartition(5), a, "doc_id", "s_a", "s_a"
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    ranks = {r["doc_id"]: r["rrf"] for r in out1}
    assert ranks[2] > ranks[7] > ranks[10]


# --- TF-IDF keyword extraction (q199) ---------------------------------------


def test_tfidf_distinctive_term_outranks_common(spark):
    # "zebra" appears only in doc 1; "the" appears everywhere. Even at
    # equal in-doc counts the rarer term must rank first.
    rows = [
        (1, "the the zebra zebra cat"),
        (2, "the the dog"),
        (3, "the the bird"),
        (4, "the the fish"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = retrieval.tfidf_keywords(df, k=2).collect()
    top = {r["doc_id"]: r["term"] for r in out if r["kw_rank"] == 1}
    assert top[1] == "zebra"
    # idf("the") = round(ln(5/5)+1, 6) = 1.0 exactly; tf=2 → score 2.0
    the_scores = {r["term"]: r["tfidf"] for r in out if r["doc_id"] == 2}
    assert the_scores["the"] == 2.0


def test_tfidf_rank_bounded_and_tiebreak_lexicographic(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "z y x w v u t s")], "doc_id int, text string"
    )
    out = retrieval.tfidf_keywords(df, k=3)
    rows = out.collect()
    assert all(1 <= r["kw_rank"] <= 3 for r in rows)
    d1 = sorted(
        (r["kw_rank"], r["term"]) for r in rows if r["doc_id"] == 1
    )
    # all three terms tie on score (same tf, same idf) → term order
    assert d1 == [(1, "a"), (2, "b"), (3, "c")]


def test_tfidf_empty_and_null_text_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "word")], "doc_id int, text string"
    )
    out = retrieval.tfidf_keywords(df, k=5).collect()
    assert {r["doc_id"] for r in out} == {3}


# --- hard-negative mining (q201) --------------------------------------------


def test_hard_negatives_rank_lexical_overlap_semantic_distance(spark):
    # doc 1/2: same text (jaccard 1.0) but OPPOSITE embeddings → the
    # canonical hard negative. doc 1/3: same text AND same embedding →
    # excluded by cosine_max. doc 4 shares nothing → no pair.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma delta epsilon"),
            (4, "unrelated words entirely here now"),
        ],
        "doc_id int, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [-1.0, 0.0]),
            (3, [1.0, 0.0]),
            (4, [0.0, 1.0]),
        ],
        "vec_id int, embedding array<float>",
    )
    out = retrieval.hard_negative_pairs(
        docs, emb, k_top=10, jaccard_min=0.5, cosine_max=0.0
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert pairs == {(1, 2), (2, 3)}
    top = out[0]
    assert top["hn_score"] == pytest.approx(2.0)  # jaccard 1 − cos −1


def test_hard_negatives_stop_shingle_cap_bounds_fanout(spark):
    # every doc shares one ubiquitous shingle; with the cap below the
    # corpus size that shingle leaves the posting join, so no pair
    # reaches jaccard_min — the fanout bound is observable in results.
    docs = spark.createDataFrame(
        [(i, f"common shingle here tail{i} tail{i}x") for i in range(8)],
        "doc_id int, text string",
    )
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0] if i % 2 else [-1.0, 0.0]) for i in range(8)],
        "vec_id int, embedding array<float>",
    )
    capped = retrieval.hard_negative_pairs(
        docs, emb, k_top=100, jaccard_min=0.1, cosine_max=1.0,
        shingle_df_cap=4,
    )
    uncapped = retrieval.hard_negative_pairs(
        docs, emb, k_top=100, jaccard_min=0.1, cosine_max=1.0,
        shingle_df_cap=1000,
    )
    assert capped.count() == 0
    assert uncapped.count() == 28  # all C(8,2) pairs share the shingle


def test_hard_negatives_norm_hoist_bit_identical(spark):
    """r11 opt: the pair leg computes cosine as dot/(norm_a*norm_b)
    with the norms hoisted to per-VECTOR projections below the join.
    Pin that the hoisted form is BIT-identical (null-safe <=>) to the
    original per-pair ``cosine_similarity`` fold on awkward magnitudes
    — same IEEE ops in the same order, so no tolerance is needed."""
    from mtg_bulk_database_spark.functions.vectors import (
        cosine_similarity,
        dot,
        l2_norm,
    )

    vecs = spark.createDataFrame(
        [
            (1, [0.1, 0.2, 0.30000000000000004]),
            (2, [1e-8, -3.3333333333333335, 7.0]),
            (3, [123456789.123456, -0.1, 2.5e-17]),
            (4, [-1.0, -1.0, -1.0]),
            (5, [0.7071067811865476, 0.7071067811865475, 1e300]),
        ],
        "vid int, v array<double>",
    )
    a = vecs.select(
        F.col("vid").alias("ia"),
        F.col("v").alias("va"),
        l2_norm(F.col("v")).alias("na"),
    )
    b = vecs.select(
        F.col("vid").alias("ib"),
        F.col("v").alias("vb"),
        l2_norm(F.col("v")).alias("nb"),
    )
    pairs = a.crossJoin(b).select(
        cosine_similarity(F.col("va"), F.col("vb")).alias("per_pair"),
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
            "hoisted"
        ),
    )
    mismatches = pairs.filter(
        ~F.col("per_pair").eqNullSafe(F.col("hoisted"))
    ).count()
    assert mismatches == 0
