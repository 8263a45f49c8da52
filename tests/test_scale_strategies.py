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
    common skew shape; a value-only hash would give them all one salt.
    The per-row mix must spread them across reducers."""
    from mtg_bulk_database_spark.operators.skew import salted_count

    dup = (
        spark.range(4000)
        .repartition(8)
        .select(F.lit(1).alias("k"), F.lit("same").alias("payload"))
    )
    salt = F.pmod(
        F.xxhash64(F.col("k"), F.col("payload"), F.monotonically_increasing_id()),
        F.lit(8),
    )
    n_salts = dup.withColumn("_salt", salt).select("_salt").distinct().count()
    assert n_salts >= 4, f"identical rows collapsed onto {n_salts} salts"
    # and the salted aggregate still counts them exactly once each
    out = salted_count(dup, "k").collect()
    assert out[0]["n_rows"] == 4000


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
