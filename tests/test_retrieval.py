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
