"""Round-11b A/B: single-task-scan fixes for q222/q223/q150/q239/q234.

Each experiment runs variant A (current registry shape) and variant B
(candidate) alternating, 3 rounds, reporting min/median wall of a
count() action plus a full result-equality check (sorted rows).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.registry import load_registry
from mtg_bulk_database_spark.session import get_spark

QUERIES, _ = load_registry()
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(
    app_name="r11b-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
)
spark.sparkContext.setLogLevel("ERROR")
DP = spark.sparkContext.defaultParallelism


def rows_key(df):
    return sorted(map(tuple, (r for r in df.collect())))


def ab(name, fa, fb, rounds=3, check=True):
    if check:
        ra, rb = rows_key(fa()), rows_key(fb())
        same = ra == rb
        print(f"{name}: equal={same} ({len(ra)} vs {len(rb)} rows)", flush=True)
        if not same:
            for x, y in zip(ra, rb):
                if x != y:
                    print("  first diff:", x, "vs", y)
                    break
            return
    ta, tb = [], []
    # warm both
    fa().count()
    fb().count()
    for _ in range(rounds):
        t0 = time.perf_counter()
        fa().count()
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fb().count()
        tb.append(time.perf_counter() - t0)
    print(
        f"{name}: A min={min(ta):.3f} med={statistics.median(ta):.3f} {['%.2f' % t for t in ta]}"
        f" | B min={min(tb):.3f} med={statistics.median(tb):.3f} {['%.2f' % t for t in tb]}",
        flush=True,
    )


# ---------------------------------------------------------------------------
# 1. q222: codegen _tf + checkpointed narrow TF projection, fanned out
# ---------------------------------------------------------------------------
from pyspark.sql import Window

from mtg_bulk_database_spark.functions.text import tokens
from mtg_bulk_database_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    NDCG_DISC_10,
)

_Q222_QUERIES = (
    ("spark", "vector"),
    ("hash", "merge"),
    ("stream", "window"),
    ("customer", "query"),
)


def grouped_b(docs, query_terms, k=10, text_col="text", id_col="doc_id",
              k1=BM25_K1, b=BM25_B):
    all_terms = sorted({t for terms in query_terms for t in terms})
    toks_col = tokens(text_col)
    # ONE fanned-out tokenize pass into a narrow (id, dl, tf0..tfN)
    # integer frame, lazily checkpointed: every downstream consumer
    # (corpus stats, all per-query scoring branches) reads ints.
    tf_cols = [
        (F.size("_toks") - F.size(F.array_remove("_toks", t))).alias(f"_tf{i}")
        for i, t in enumerate(all_terms)
    ]
    base = (
        docs.select(F.col(id_col), toks_col.alias("_toks"))
        .repartition(DP)
        .select(F.col(id_col), F.size("_toks").alias("_dl"), *tf_cols)
        .localCheckpoint(eager=False)
    )
    dl = F.col("_dl")

    stat_aggs = [
        F.count("*").alias("_n"),
        F.sum(dl.cast("long")).alias("_sumdl"),
    ]
    for i, t in enumerate(all_terms):
        stat_aggs.append(
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
        )
    stats = base.agg(*stat_aggs)
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")

    def contrib(t):
        i = all_terms.index(t)
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.round(
            F.log(
                F.lit(1.0)
                + (F.col("_n").cast("double") - dfreq + F.lit(0.5))
                / (dfreq + F.lit(0.5))
            ),
            6,
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * (dl.cast("double") / avgdl)
        )
        return idf * ((tf * F.lit(k1 + 1.0)) / denom)

    per_q = []
    for terms in query_terms:
        qid = " ".join(terms)
        score = contrib(terms[0])
        rel = (F.col(f"_tf{all_terms.index(terms[0])}") > 0).cast("int")
        for t in terms[1:]:
            score = score + contrib(t)
            rel = rel + (F.col(f"_tf{all_terms.index(t)}") > 0).cast("int")
        per_q.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                F.round(score, 6).alias("bm25"),
                rel.alias("rel"),
            )
        )
    scored = (
        j.select(F.col(id_col), F.explode(F.array(*per_q)).alias("_s"))
        .select(id_col, "_s.*")
        .where(F.col("rel") > 0)
    )
    disc = F.array(*[F.lit(d).cast("decimal(8,6)") for d in NDCG_DISC_10[:k]])
    gain = F.expr("shiftleft(1, rel) - 1")
    w_score = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), id_col)
    w_rel = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), id_col)
    dcg = (
        scored.withColumn("rk", F.row_number().over(w_score))
        .where(F.col("rk") <= k)
        .groupBy("query_id")
        .agg(F.sum(gain * F.element_at(disc, F.col("rk"))).alias("_dcg"))
    )
    idcg = (
        scored.withColumn("rk", F.row_number().over(w_rel))
        .where(F.col("rk") <= k)
        .groupBy("query_id")
        .agg(F.sum(gain * F.element_at(disc, F.col("rk"))).alias("_idcg"))
    )
    nrel = scored.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_relevant")
    )
    return (
        nrel.join(dcg, "query_id")
        .join(idcg, "query_id")
        .select(
            "query_id",
            "n_relevant",
            F.round(F.col("_dcg").cast("double"), 6).alias("dcg"),
            F.round(F.col("_idcg").cast("double"), 6).alias("idcg"),
            F.when(
                F.col("_idcg") > 0,
                F.round(
                    F.col("_dcg").cast("double")
                    / F.col("_idcg").cast("double"),
                    6,
                ),
            ).alias("ndcg"),
        )
    )


def q222_b():
    docs = load_table(spark, SF, "documents")
    return grouped_b(docs, _Q222_QUERIES, k=10)


# NOTE: the tail of grouped_bm25_ndcg (the join/coalesce block above) was
# transcribed from retrieval.py; the equality check below is the real guard.
ab("q222", lambda: QUERIES["q222_grouped_ndcg"](spark, SF), q222_b)

# ---------------------------------------------------------------------------
# 2. q223: fan_out on the pool scan
# ---------------------------------------------------------------------------
import mtg_bulk_database_spark.pipeline_queries11 as pq11


def q223_b():
    # identical body, but the pool side loads with fan_out=True
    orig = load_table

    def patched(sp, sf, nm, fan_out=False):
        return orig(sp, sf, nm, fan_out=True if nm == "embeddings" else fan_out)

    pq11.load_table, saved = patched, pq11.load_table
    try:
        return QUERIES["q223_pq_adc_probe_portable"](spark, SF)
    finally:
        pq11.load_table = saved


ab("q223", lambda: QUERIES["q223_pq_adc_probe_portable"](spark, SF), q223_b)

# ---------------------------------------------------------------------------
# 3. q150: repartition the baskets before the quadratic pair expansion
# ---------------------------------------------------------------------------
from mtg_bulk_database_spark.pipeline_queries8 import market_basket_rules


def q150_b():
    li = load_table(spark, SF, "lineitem")
    MIN_SUPPORT, MAX_BASKET = 3, 64
    baskets0 = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.collect_set("l_partkey").alias("ps0"))
        .localCheckpoint(eager=False)
    )
    n_orders = baskets0.agg(F.count(F.lit(1)).alias("n_orders"))
    freq = (
        baskets0.select(F.explode("ps0").alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    infreq_row = freq.where(F.col("c") < MIN_SUPPORT).agg(
        F.coalesce(F.collect_list("p"), F.array()).alias("bad")
    )
    baskets = baskets0.crossJoin(F.broadcast(infreq_row)).select(
        "o", F.array_except("ps0", "bad").alias("ps")
    )
    cap_metrics = [
        F.count(F.when(F.size("ps") > MAX_BASKET, F.lit(1))).alias(
            "n_capped_baskets"
        ),
        F.coalesce(
            F.sum(F.when(F.size("ps") > MAX_BASKET, F.size("ps"))), F.lit(0)
        ).alias("n_capped_rows"),
    ]
    baskets = (
        baskets.observe("basket_cap_b", *cap_metrics)
        .where(F.size("ps") <= MAX_BASKET)
        .repartition(DP)  # <-- the candidate change
    )
    ps = F.array_sort(F.col("ps"))
    pair_structs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + F.lit(2), F.size(ps)),
                lambda y: F.struct(x.alias("p_a"), y.alias("p_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.p_a").alias("p_a"), F.col("pr.p_b").alias("p_b"))
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= MIN_SUPPORT)
    )
    fa_ = freq.select(F.col("p").alias("p_a"), F.col("c").alias("n_a"))
    fb_ = freq.select(F.col("p").alias("p_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(fa_, "p_a")
        .join(fb_, "p_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p_a",
            "p_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double") * F.col("n_orders")
                / (F.col("n_a").cast("bigint") * F.col("n_b"))
            ).alias("lift"),
        )
    )


ab("q150", lambda: QUERIES["q150_market_basket"](spark, SF), q150_b)

# ---------------------------------------------------------------------------
# 4. q239: one fanned-out tokenize pass, checkpointed token arrays
# ---------------------------------------------------------------------------


def q239_b():
    docs = load_table(spark, SF, "documents")
    toks = (
        docs.select("source", tokens("text").alias("_l"))
        .repartition(DP)
        .localCheckpoint(eager=False)
    )
    staged = toks
    bg_arr = F.when(
        F.size("_l") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_l") - 2),
            lambda i: F.concat(F.get("_l", i), F.lit(" "), F.get("_l", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select("source", bg_arr.alias("_bg_arr"))
    bg = staged.select("source", F.explode_outer("_bg_arr").alias("bg")).filter(
        F.col("bg").isNotNull()
    )
    uni = toks.select(F.explode("_l").alias("t"))
    unic = uni.groupBy("t").agg(F.count("*").alias("c1"))
    vocab = uni.agg(F.count_distinct("t").alias("vocab"))
    bgc = bg.groupBy("bg").agg(F.count("*").alias("c2"))
    terms = (
        bg.join(bgc, "bg")
        .withColumn("_w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(unic.withColumnRenamed("t", "_w1"), "_w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "term_micro",
            F.floor(
                F.log(
                    (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("vocab"))
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    g = terms.groupBy("source").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("term_micro").cast("long").alias("s_micro"),
    )
    tot = g.agg(
        F.sum("n_bigrams").cast("long").alias("n_tot"),
        F.sum("s_micro").cast("long").alias("s_tot"),
    )
    e = g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_bigrams",
        F.expr("(-s_micro) DIV n_bigrams").alias("nll_micro"),
        F.expr("(-s_micro) DIV n_bigrams - (-s_tot) DIV n_tot").alias(
            "excess_micro"
        ),
    )
    u = e.select(
        "source",
        "n_bigrams",
        "nll_micro",
        "excess_micro",
        F.floor(
            F.lit(1000000.0)
            * F.exp(F.col("excess_micro").cast("double") / F.lit(1e7))
        )
        .cast("long")
        .alias("u_micro"),
    )
    tu = u.agg(F.sum("u_micro").cast("long").alias("total_u"))
    return u.crossJoin(F.broadcast(tu)).select(
        "source",
        "n_bigrams",
        "nll_micro",
        "excess_micro",
        F.expr("(u_micro * 1000000) DIV total_u").alias("w_micro"),
        (
            F.expr("(u_micro * 1000000) DIV total_u").cast("double")
            / F.lit(1000000.0)
        ).alias("w_new"),
    )


ab("q239", lambda: QUERIES["q239_domain_reweight_eg"](spark, SF), q239_b)

# ---------------------------------------------------------------------------
# 5. q234: fan_out the tokenize scan
# ---------------------------------------------------------------------------
import mtg_bulk_database_spark.pipeline_queries12 as pq12


def q234_b():
    orig = load_table

    def patched(sp, sf, nm, fan_out=False):
        return orig(sp, sf, nm, fan_out=True if nm == "documents" else fan_out)

    pq12.load_table, saved = patched, pq12.load_table
    try:
        return QUERIES["q234_bpe_encode_frozen"](spark, SF)
    finally:
        pq12.load_table = saved


ab("q234", lambda: QUERIES["q234_bpe_encode_frozen"](spark, SF), q234_b)

spark.stop()
print("done")
