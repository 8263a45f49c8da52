"""Scale-strategy tests: salting correctness + bucketed joins actually
eliding their exchanges (plan-verified)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.ingest.bucketing import bucketed_join, write_bucketed
from mtg_bulk_database_spark.operators.skew import salted_count, salted_join
from mtg_bulk_database_spark.plans import executed_plan

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def skewed(spark):
    """90% of rows share one key — the classic hot-key shape."""
    hot = spark.range(9000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    rest = spark.range(1000).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").alias("payload")
    )
    return hot.unionByName(rest)


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 52)], "k bigint, name string"
    )
    plain = skewed.join(dim, on="k").select("k", "payload", "name")
    salted = salted_join(skewed, dim, "k").select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_count_matches_plain(spark, skewed):
    plain = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["n_rows"] for r in salted_count(skewed, "k").collect()}
    assert salted == plain


def test_salt_spreads_fully_identical_rows(spark):
    """Repeated identical events (same values in EVERY column) are a
    common skew shape; a value-only hash gives them all one salt. With
    spread_identical=True the per-row mix spreads them across reducers
    (documented trade-off: weaker determinism under partial recompute,
    so it's opt-in)."""
    from mtg_bulk_database_spark.operators.skew import _salt_expr, salted_count

    dup = (
        spark.range(4000)
        .repartition(8)
        .select(F.lit(1).alias("k"), F.lit("same").alias("payload"))
    )
    spread = dup.withColumn("_salt", _salt_expr(["k", "payload"], 8, True))
    assert spread.select("_salt").distinct().count() >= 4
    # default stays the deterministic value-hash: one salt for one value
    value_only = dup.withColumn("_salt", _salt_expr(["k", "payload"], 8, False))
    assert value_only.select("_salt").distinct().count() == 1
    # and the salted aggregate still counts rows exactly once either way
    assert salted_count(dup, "k", spread_identical=True).collect()[0]["n_rows"] == 4000
    assert salted_count(dup, "k").collect()[0]["n_rows"] == 4000


def test_bucketed_join_elides_exchange(spark):
    # uses the session's default warehouse (gitignored spark-warehouse/);
    # warehouse.dir is a static conf and can't move per-test
    import shutil

    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "b_orders", "l_orderkey", n_buckets=8)

    joined = bucketed_join(
        spark, "b_lineitem", "b_orders", on="l_orderkey", force_sort_merge=True
    )
    plan = executed_plan(joined, finalize=True)
    # co-located: sort-merge join with NO shuffle exchange on either side
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    # and it returns the same rows as the plain join
    plain = li.join(orders, on="l_orderkey")
    assert joined.count() == plain.count()

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
