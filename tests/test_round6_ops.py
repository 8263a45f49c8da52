"""Invariant tests for the round-6 gates — semantic properties the
DuckDB twins cannot express (a twin proves both engines agree, not
that the number means what it claims; these pin the meaning)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.registry import load_registry

QUERIES, ORACLE_SQL = load_registry()

SF = "/root/testdata/sf0.01"


def test_q214_planted_ood_source_has_larger_kl(spark, tmp_path):
    """A source whose tokens are disjoint from the rest of the corpus
    must show strictly larger KL(source‖corpus) than a source drawn
    from the corpus's own distribution."""
    import pandas as pd

    rows = []
    for i in range(60):
        rows.append((i, "indist", "the quick brown fox jumps the lazy dog"))
    for i in range(60, 120):
        rows.append((i, "indist2", "the quick brown dog naps near the fox"))
    for i in range(120, 150):
        rows.append((i, "ood", "zzqx wvvk jjyy qqpp zzqx wvvk"))
    pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
        str(tmp_path / "documents.parquet"), index=False
    )
    out = {
        r["source"]: r
        for r in QUERIES["q214_source_token_kl"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["ood"]["kl"] > out["indist"]["kl"]
    assert out["ood"]["kl"] > out["indist2"]["kl"]
    # KL is non-negative up to the 6dp rounding of its two halves
    for r in out.values():
        assert r["kl"] >= -1e-5


def test_q215_flesch_orders_simple_above_dense(spark, tmp_path):
    """More syllables per word and longer sentences must lower the
    reading-ease score (the formula's whole point)."""
    import pandas as pd

    pd.DataFrame(
        [
            (1, "a", "The cat sat. The dog ran. We go now."),
            (
                2,
                "a",
                "Extraordinarily convoluted administrative "
                "contraindications necessitate organizational "
                "recalibration without intermediate punctuation or "
                "respite whatsoever",
            ),
        ],
        columns=["doc_id", "source", "text"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    rows = {
        r["doc_id"]: r
        for r in QUERIES["q215_readability"](spark, str(tmp_path)).collect()
    }
    assert rows[1]["flesch"] > rows[2]["flesch"]
    assert rows[2]["n_syllables"] / rows[2]["n_words"] > (
        rows[1]["n_syllables"] / rows[1]["n_words"]
    )


def test_q216_hll_intersection_tracks_exact_overlap(spark):
    """Inclusion–exclusion over the portable sketches must land within
    HLL's error envelope of the exact |purchasers ∩ viewers|. p=12 →
    σ ≈ 1.04/√4096 ≈ 1.6% per estimate; the intersection difference
    compounds three estimates, so allow 4σ·3 of the UNION size."""
    from mtg_bulk_database_spark.catalog import load_table

    out = QUERIES["q216_hll_set_algebra"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").where(
        F.col("user_id").isNotNull()
    )
    a = {r[0] for r in ev.where(F.col("event_type") == "purchase")
         .select("user_id").distinct().collect()}
    b = {r[0] for r in ev.where(F.col("event_type") == "view")
         .select("user_id").distinct().collect()}
    exact = len(a & b)
    union = len(a | b)
    tol = 3 * 4 * 1.04 / math.sqrt(4096) * union
    assert abs(out["est_intersection"] - exact) <= tol, (
        out["est_intersection"],
        exact,
        tol,
    )


def test_q217_assignment_matches_numpy_argmax(spark):
    """The frozen-centroid assignment must equal a straight numpy
    argmax-of-cosine over every indexable vector."""
    import numpy as np

    from mtg_bulk_database_spark.catalog import load_table
    from mtg_bulk_database_spark.pipeline_queries10 import _Q217_CENTROIDS

    cents = np.asarray(_Q217_CENTROIDS, dtype=float)
    got = {
        r["vec_id"]: r["list_id"]
        for r in QUERIES["q217_ivf_assign_portable"](spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").where(
        F.col("vec_id") != 0
    ).collect()
    checked = 0
    for r in emb:
        v = np.asarray(r["embedding"], dtype=float)
        nv = np.linalg.norm(v)
        if nv == 0 or r["embedding"] is None:
            assert r["vec_id"] not in got
            continue
        cos = np.round(
            cents @ v / (np.linalg.norm(cents, axis=1) * nv), 6
        )
        assert got[r["vec_id"]] == int(np.argmax(cos)), r["vec_id"]
        checked += 1
    assert checked > 400


def test_q218_week_zero_retention_is_full(spark):
    """Every cohort is fully active in its own first week by
    construction, so the week_idx=0 row must exist with retention 1.0
    and n_active == cohort_size."""
    rows = QUERIES["q218_cohort_retention"](spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_idx"]] = r
    assert by_cohort
    for cohort, weeks in by_cohort.items():
        assert 0 in weeks, f"{cohort} missing week 0"
        assert weeks[0]["retention"] == 1.0
        assert weeks[0]["n_active"] == weeks[0]["cohort_size"]
        # retention is a proportion everywhere
        for r in weeks.values():
            assert 0.0 < r["retention"] <= 1.0


def test_q219_ndcg_bounds_and_perfect_ranking(spark, tmp_path):
    """nDCG ∈ (0, 1]; when the top-k is exactly the most-relevant docs
    in ideal order the metric must be 1.0. Build a corpus where BM25
    provably ranks the double-term docs first."""
    import pandas as pd

    rows = [(i, "a", "spark vector " * 6) for i in range(5)]
    rows += [(i, "a", "spark alone here pad pad pad") for i in range(5, 10)]
    rows += [(i, "a", "nothing relevant at all") for i in range(10, 40)]
    pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
        str(tmp_path / "documents.parquet"), index=False
    )
    out = QUERIES["q219_retrieval_ndcg"](spark, str(tmp_path)).collect()[0]
    assert 0.0 < out["ndcg"] <= 1.0
    assert out["n_relevant"] == 10
    # 5 rel-2 docs + 5 rel-1 docs fill the top-10 in ideal order (BM25
    # scores the double-term docs above the single-term ones here)
    assert out["ndcg"] == 1.0

    # the sf0.01 corpus: still bounded
    out2 = QUERIES["q219_retrieval_ndcg"](spark, SF).collect()[0]
    assert 0.0 <= (out2["ndcg"] or 0.0) <= 1.0


def test_q220_fill_rates_bounded_and_overflow_small(spark):
    """Fill rate lives in (0, 1 + max_chunk/budget]; overflow sequences
    exist only because the packer allows ≤1 chunk past the budget, so
    every overflowing sequence exceeds it by < one chunk (16 tokens)."""
    from mtg_bulk_database_spark.pipeline_queries4 import (
        _PACK_BUDGET,
        q102,
    )

    rows = QUERIES["q220_packing_efficiency"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["avg_fill"] <= 1.0 + 16 / _PACK_BUDGET
        assert r["n_overflow"] <= r["n_seqs"]
    per_seq = (
        q102(spark, SF)
        .groupBy("shard", "seq_id")
        .agg(F.sum("n_chunk_tokens").alias("toks"))
        .where(F.col("toks") > _PACK_BUDGET)
        .collect()
    )
    for r in per_seq:
        assert r["toks"] < _PACK_BUDGET + 16
