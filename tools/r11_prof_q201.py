"""Stage-level breakdown of q201_hard_negatives: where do the 7.8
CPU-s go — the posting self-join / pair agg, the jaccard filter, or
the per-pair cosine?  Prints relation sizes and per-leg wall+CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    from pyspark.sql import functions as F

    from mtg_bulk_database_spark.catalog import load_table
    from mtg_bulk_database_spark.functions.vectors import (
        cosine_similarity,
        indexable_vector,
    )
    from mtg_bulk_database_spark.pipeline_queries import (
        hot_shingles_prebuilt,
        shingle_prebuilt_table,
    )
    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name="r11-prof-q201",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    sh = shingle_prebuilt_table(spark, SF_DIR)
    hot = hot_shingles_prebuilt(spark, SF_DIR)

    def timed(name, df):
        sc.setJobDescription(name)
        df.count()  # warm
        seen = {s["stageId"] for s in _get(f"{base}/stages")}
        t0 = time.perf_counter()
        n = df.count()
        wall = time.perf_counter() - t0
        stages = [
            s
            for s in _get(f"{base}/stages?status=complete")
            if s["stageId"] not in seen
        ]
        cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
        print(
            f"{name}: rows={n} wall={wall:.2f} cpu={cpu:.2f}", flush=True
        )
        sc.setJobDescription(None)
        return n

    # rebuild the q201 pipeline piecewise (mirrors retrieval.hard_negative_pairs)
    docs = load_table(spark, SF_DIR, "documents", fan_out=True)
    emb = load_table(spark, SF_DIR, "embeddings", fan_out=True)

    sizes = sh.select(F.col("doc_id").alias("_id"), F.size("shingles").alias("_n"))
    ex = sh.select("doc_id", F.explode_outer("shingles").alias("s")).filter(
        F.col("s").isNotNull()
    )
    ex = ex.join(F.broadcast(hot), on="s", how="left_anti")
    a = ex.select(F.col("doc_id").alias("id_a"), "s")
    b = ex.select(F.col("doc_id").alias("id_b"), "s")
    common = (
        a.join(b, on="s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_common"))
    )
    timed("1_common_pairs", common)

    jac = (
        common.join(
            sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"),
            on="id_a",
        )
        .join(
            sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"),
            on="id_b",
        )
        .withColumn(
            "jaccard",
            F.col("_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= 0.02)
    )
    timed("2_jac_filtered", jac)

    ea = emb.filter(indexable_vector(F.col("embedding"))).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("_ea")
    )
    eb = emb.filter(indexable_vector(F.col("embedding"))).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("_eb")
    )
    scored = (
        jac.join(ea, on="id_a")
        .join(eb, on="id_b")
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("_ea"), F.col("_eb")), 6),
        )
        .filter(F.col("cosine") <= 0.0)
    )
    timed("3_scored", scored)

    full = queries["q201_hard_negatives"]
    sc.setJobDescription("q201_full")
    df = full(spark, SF_DIR)
    timed("4_full_query", df)

    # embedding dim
    d = emb.select(F.size("embedding").alias("d")).agg(F.max("d")).collect()
    print("embedding_dim:", d[0][0], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
