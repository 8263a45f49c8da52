"""A/B: array-cache + explode vs flat posting cache for the pair join."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.pipeline_queries import shingle_prebuilt_table
from mtg_bulk_database_spark.session import get_spark


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


spark = get_spark(app_name="r11-ab1", extra_conf={
    "spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
sc = spark.sparkContext
base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

sh = shingle_prebuilt_table(spark, SF, "string")

# flat posting cache (explode once at build)
posts = sh.select(F.col("doc_id"), F.explode("shingles").alias("s")).persist()
posts.count()
sizes = sh.select(F.col("doc_id"), F.size("shingles").alias("n")).persist()
sizes.count()


def run(lbl, fn, n=3):
    # warm
    fn()
    best = None
    best_cpu = None
    for _ in range(n):
        seen = {s["stageId"] for s in _get(f"{base}/stages")}
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        stages = [s for s in _get(f"{base}/stages?status=complete")
                  if s["stageId"] not in seen]
        cpu = sum(s.get("executorRunTime", 0) for s in stages) / 1000
        if best is None or dt < best:
            best, best_cpu = dt, cpu
    print(f"{lbl}: wall {best:.2f}s cpu {best_cpu:.1f}s", flush=True)


# 1. scan cost of the array cache alone (no explode)
run("array-cache scan (size only)", lambda: sh.select(F.size("shingles")).count())
# 2. explode_outer from array cache (current shape)
exo = sh.select("doc_id", F.explode_outer("shingles").alias("s")).filter(F.col("s").isNotNull())
run("explode_outer from cache", lambda: exo.count())
# 3. plain explode from array cache
exp = sh.select("doc_id", F.explode("shingles").alias("s"))
run("plain explode from cache", lambda: exp.count())
# 4. flat posting cache scan
run("flat posting cache scan", lambda: posts.count())
# 5. pair agg from explode_outer (current q32 core)
def pairs_from(ex):
    a = ex.select(F.col("doc_id").alias("id_a"), "s")
    b = ex.select(F.col("doc_id").alias("id_b"), "s")
    return (a.join(b, on="s").filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b").agg(F.count("*").alias("common")))
run("pairagg from explode_outer", lambda: pairs_from(exo).count())
run("pairagg from flat postings", lambda: pairs_from(posts).count())
# 6. hash-agg over the exploded stream (distinct s) both ways
run("df count from explode_outer", lambda: exo.groupBy("s").count().count())
run("df count from flat postings", lambda: posts.groupBy("s").count().count())
spark.stop()
