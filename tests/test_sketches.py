"""Sketch guarantees: count-min never undercounts and overshoots by at
most εN; per-batch sketches merge losslessly; HLL estimates track exact
distinct counts within the published error envelope."""


from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.functions.text import tokens
from mtg_bulk_database_spark.ingest.matview import (
    HLL_ESTIMATE_COL,
    snapshot_approx_distinct,
)
from mtg_bulk_database_spark.operators import sketches

SF_DIR = "/root/testdata/sf0.01"


def _token_df(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs.select("doc_id", F.explode(tokens("text")).alias("t"))


def test_cms_never_undercounts_and_bounded_overshoot(spark):
    tok = _token_df(spark)
    sketch = sketches.cms_build(tok, "t")
    truth = tok.groupBy("t").agg(F.count("*").alias("true_count"))
    est = sketches.cms_estimate(sketch, truth, "t")
    n_total = tok.count()
    eps = math.e / sketches.CMS_WIDTH
    stats = est.agg(
        F.sum(F.when(F.col("est_count") < F.col("true_count"), 1).otherwise(0)).alias(
            "under"
        ),
        F.max(F.col("est_count") - F.col("true_count")).alias("max_over"),
    ).first()
    assert stats.under == 0  # the one-sided guarantee is unconditional
    assert stats.max_over <= eps * n_total


def test_cms_merges_losslessly(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) cell-for-cell —
    counters are plain sums, so batch sketches fold into the corpus
    sketch with no drift."""
    tok = _token_df(spark)
    a = tok.filter(F.col("doc_id") % 2 == 0)
    b = tok.filter(F.col("doc_id") % 2 == 1)
    merged = sketches.cms_merge(
        sketches.cms_build(a, "t"), sketches.cms_build(b, "t")
    )
    full = sketches.cms_build(tok, "t")
    diff = merged.join(full, ["row_idx", "bucket"], "full").filter(
        (F.coalesce(merged.cnt, F.lit(0)) != F.coalesce(full.cnt, F.lit(0)))
    )
    assert diff.count() == 0


def test_hll_tracks_exact_distinct(spark):
    tok = _token_df(spark)
    approx = snapshot_approx_distinct(tok, ["doc_id"], "t").select(
        "doc_id", HLL_ESTIMATE_COL
    )
    exact = tok.groupBy("doc_id").agg(F.count_distinct("t").alias("d"))
    j = approx.join(exact, "doc_id")
    bad = j.filter(
        F.abs(F.col(HLL_ESTIMATE_COL) - F.col("d")) > 0.05 * F.col("d")
    )
    assert bad.count() == 0


# --- PageRank invariants (operators/graph.py) ------------------------------


@pytest.mark.slow
def test_pagerank_conserves_mass_and_orders_path_graph(spark):
    from mtg_bulk_database_spark.operators.graph import pagerank

    # P3 path: 1—2—3. Analytic fixpoint: center ≈ 1.4595, ends ≈ 0.7703.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    rows = {r.node: r.rank for r in pagerank(edges, max_iter=60, tol=1e-9).collect()}
    assert abs(sum(rows.values()) - 3.0) < 1e-6  # Σrank = |V|
    assert rows[2] > rows[1] == rows[3]
    assert abs(rows[2] - 1.4595) < 1e-3
    assert all(r >= 0.15 - 1e-9 for r in rows.values())


def test_pagerank_on_dup_graph_invariants(spark):
    from mtg_bulk_database_spark.operators import dedup
    from mtg_bulk_database_spark.operators.graph import pagerank

    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", k=3, threshold=0.6)
    ranks = pagerank(pairs)
    n_nodes = ranks.count()
    got = ranks.agg(
        F.sum("rank").alias("s"), F.min("rank").alias("mn")
    ).first()
    assert abs(got.s - n_nodes) < 1e-4 * max(n_nodes, 1)
    assert got.mn >= 0.15 - 1e-9


def test_hll_portable_raw_branch_error_and_duckdb_parity(spark, tmp_path):
    """r5 portable HLL: the sf corpora only exercise the linear-
    counting branch (tiny vocab), so drive the RAW harmonic-sum branch
    with 50k distinct keys — relative error must sit inside the
    published 1.04/sqrt(m) envelope (3 sigma), and the DuckDB twin must
    reproduce the estimate BIT-for-bit in this branch too."""
    import duckdb

    n = 50_000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    est = sketches.hll_portable(df, "grp", "v").collect()[0]["est_distinct"]
    m = 1 << sketches.HLL_P
    assert est > 2.5 * m, "50k distinct must leave the linear-counting branch"
    assert abs(est - n) / n < 3 * 1.04 / math.sqrt(m)

    path = str(tmp_path / "hll_in.parquet")
    df.write.parquet(path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW src AS SELECT * FROM read_parquet('{path}/*.parquet')")
    sql = "WITH t AS (SELECT grp, v FROM src), " + sketches.sql_hll_portable(
        "t", "grp", "v"
    )
    assert con.sql(sql).fetchall() == [("g", est)]


def test_hll_portable_merge_via_register_max(spark):
    """Split-and-merge equals single-pass: per-half register frames
    max-merge into the same registers, hence the same estimate — the
    mergeability contract that makes the sketch an ingest artifact."""
    df = spark.range(20_000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    whole = sketches.hll_portable(df, "grp", "v").collect()[0]["est_distinct"]
    # overlapping halves: dedup across batches is exactly what max() absorbs
    a = df.filter(F.col("id") < 12_000)
    b = df.filter(F.col("id") >= 8_000)
    merged = sketches.hll_portable(a.unionByName(b), "grp", "v").collect()[0][
        "est_distinct"
    ]
    assert merged == whole


# --- quantile sketch (q202) --------------------------------------------------


def test_quantile_sketch_error_bound_vs_exact(spark):
    from mtg_bulk_database_spark.catalog import load_table
    from mtg_bulk_database_spark.operators.sketches import (
        quantile_sketch_estimate,
    )

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    est = {
        r["l_returnflag"]: r
        for r in quantile_sketch_estimate(
            li,
            "l_extendedprice",
            ["l_orderkey", "l_linenumber"],
            [0.5],
            rate=0.10,
            group_col="l_returnflag",
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["p50"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
        .collect()
    }
    import math

    for g, r in est.items():
        # Bernoulli-sample estimator: rank error ~ N(0, sqrt(q(1-q)m));
        # allow 4 sigma in RANK space, converted via the empirical CDF
        m = r["sample_n"]
        assert m > 50  # the sample actually materialized
        tol_rank = 4.0 * math.sqrt(0.25 * m) / m  # 4σ quantile deviation
        lo, hi = 0.5 - tol_rank, 0.5 + tol_rank
        band = (
            li.where(F.col("l_returnflag") == g)
            .agg(
                F.expr(
                    f"percentile(l_extendedprice, array({lo}, {hi}))"
                ).alias("b")
            )
            .first()["b"]
        )
        assert band[0] <= r["q_0_5"] <= band[1], (g, r["q_0_5"], band)


def test_quantile_sketch_merge_is_union_by_construction(spark):
    from mtg_bulk_database_spark.operators.sketches import (
        quantile_sketch_sample,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], "k int, v double"
    )
    a = df.where(F.col("k") < 1000)
    b = df.where(F.col("k") >= 1000)
    whole = quantile_sketch_sample(df, ["k"], 0.1)
    parts = quantile_sketch_sample(a, ["k"], 0.1).unionAll(
        quantile_sketch_sample(b, ["k"], 0.1)
    )
    assert sorted(r["k"] for r in whole.collect()) == sorted(
        r["k"] for r in parts.collect()
    )
