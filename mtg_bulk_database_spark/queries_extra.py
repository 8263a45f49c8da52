"""Additional relational-surface registry entries: subqueries
(decorrelation), grouping sets, scalar string/date functions, conditional
expressions — rounding out SURVEY §2.6's category checklist with
oracle-paired coverage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .registry import query


# ---------------------------------------------------------------------------
# Correlated scalar subquery — Catalyst decorrelates to a join+agg
# (SURVEY §4.3 "subquery decorrelation: built-in", verified here).
# ---------------------------------------------------------------------------
@query(
    "q50_correlated_subquery",
    """SELECT o_orderkey, o_totalprice FROM orders o
       WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice) FROM orders o2
                             WHERE o2.o_custkey = o.o_custkey)""",
)
def q50(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q50_orders")
    return spark.sql(
        """SELECT o_orderkey, o_totalprice FROM _q50_orders o
           WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
                                 FROM _q50_orders o2
                                 WHERE o2.o_custkey = o.o_custkey)"""
    )


# ---------------------------------------------------------------------------
# IN / NOT IN subqueries (semi/anti through the SQL surface).
# ---------------------------------------------------------------------------
@query(
    "q51_in_subquery",
    """SELECT p_partkey, p_name FROM part
       WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)""",
)
def q51(spark, sf_dir):
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_q51_part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q51_li")
    return spark.sql(
        """SELECT p_partkey, p_name FROM _q51_part
           WHERE p_partkey IN (SELECT l_partkey FROM _q51_li WHERE l_quantity > 45)"""
    )


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id disambiguation.
# ---------------------------------------------------------------------------
@query(
    "q52_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
              CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
              count(*) AS n_rows
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                               (l_returnflag, l_linestatus))""",
)
def q52(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q52_li")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
                  count(*) AS n_rows
           FROM _q52_li
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                   (l_returnflag, l_linestatus))"""
    )


# ---------------------------------------------------------------------------
# Scalar string-function surface (concat/substr/upper/trim/replace/length
# — the ILIKE family's supporting cast, SURVEY §2.6 "scalar funcs").
# ---------------------------------------------------------------------------
@query(
    "q53_string_functions",
    """SELECT c_custkey,
              upper(c_name) AS name_upper,
              substr(c_name, 1, 8) AS name_prefix,
              concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_key,
              length(c_name) AS name_len,
              replace(c_name, '#', '-') AS name_dashed
       FROM customer WHERE c_custkey <= 500""",
)
def q53(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(
            F.col("c_mktsegment"), F.lit(":"), F.col("c_nationkey").cast("string")
        ).alias("seg_key"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
    )


# ---------------------------------------------------------------------------
# Scalar date/time surface (extract/trunc/diff — P2's query-side family).
# ---------------------------------------------------------------------------
@query(
    "q54_date_functions",
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
              CAST(month(o_orderdate) AS INT) AS order_month,
              CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS order_dow,
              count(*) AS n_orders
       FROM orders
       GROUP BY 1, 2, 3""",
)
def q54(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("order_dow"),
        )
        .groupBy("order_year", "order_month", "order_dow")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# CASE / conditional expressions + null handling (coalesce/nullif).
# ---------------------------------------------------------------------------
@query(
    "q55_conditional_expr",
    """SELECT l_orderkey, l_linenumber,
              CASE WHEN l_discount >= 0.05 THEN 'high'
                   WHEN l_discount > 0 THEN 'low' ELSE 'none' END AS discount_band,
              coalesce(nullif(l_returnflag, 'N'), 'kept') AS return_status
       FROM lineitem WHERE l_orderkey <= 200""",
)
def q55(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 200).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") >= 0.05, "high")
        .when(F.col("l_discount") > 0, "low")
        .otherwise("none")
        .alias("discount_band"),
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("kept")
        ).alias("return_status"),
    )


# ---------------------------------------------------------------------------
# As-of join — custom operator (operators/asof.py): for each error event,
# the user's most recent strictly-preceding click. Oracle: DuckDB's
# native ASOF LEFT JOIN. Runs the relational composition (9× faster at
# this group cardinality — the cogrouped merge_asof variant pays per-
# group Arrow overhead and wins only when per-key volumes make the range
# join explode); tests pin both implementations equal.
# ---------------------------------------------------------------------------
@query(
    "q56_asof_join",
    """SELECT e.event_id, e.user_id, e.ts, c.ts AS r_ts, c.value AS r_value
       FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
       ASOF LEFT JOIN
            (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
       ON e.user_id = c.user_id AND e.ts > c.ts""",
)
def q56(spark, sf_dir):
    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(errors, clicks, on="user_id", left_ts="ts", right_ts="ts")


# ---------------------------------------------------------------------------
# Exact percentiles (sort-based linear interpolation — identical
# definition in both engines; the approx_percentile sketch is the scale
# alternative, unverifiable by an exact oracle by construction).
# ---------------------------------------------------------------------------
@query(
    "q57_percentiles",
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS p25,
              quantile_cont(l_quantity, 0.50) AS p50,
              quantile_cont(l_quantity, 0.75) AS p75,
              quantile_cont(l_extendedprice, 0.9) AS price_p90
       FROM lineitem GROUP BY l_returnflag""",
)
def q57(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("price_p90"),
    )
