"""Round-11 precise profiling: warm the JIT with a full headline pass
(bench conditions), then per target query dump EVERY new stage with its
FULL name (call site) and metrics.  Writes /tmp/r11_profile2.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TARGETS = [
    "q176_scale_exact_percentiles",
    "q71_curate_corpus",
    "q61_dup_clusters",
    "q241_ivf_nprobe_sweep",
    "q244_ivf_workload_recall",
    "q253_decontaminated_manifest",
    "q251_paragraph_near_dup_lsh",
    "q263_epoch_shard_plan",
    "q233_pagerank_unrolled",
    "q259_paragraph_near_dup_rewrite",
    "q150_market_basket",
    "q223_pq_adc_probe_portable",
    "q222_grouped_ndcg",
    "q144_supplier_triangles",
    "q255_shortfall_reallocation",
    "q32_ngram_jaccard_pairs",
]


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    from bench import HEADLINE
    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name="r11-profile2",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "3000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ingest prebuilds exactly like bench
    from mtg_bulk_database_spark.pipeline_queries import (
        hot_shingles_prebuilt,
        ivf_prebuilt_index,
        jaccard_lean_pair_estimate,
        shingle_prebuilt_table,
    )
    from mtg_bulk_database_spark.pipeline_queries4 import pq_prebuilt_index
    from mtg_bulk_database_spark.pipeline_queries14 import (
        paragraph_hot_shingles_prebuilt,
        paragraph_prebuilt_table,
        paragraph_shingles_prebuilt,
    )
    from mtg_bulk_database_spark.pipeline_queries15 import documents_artifact_root
    from mtg_bulk_database_spark.pipeline_queries16 import (
        ivf_drift_root,
        takedown_artifact_root,
    )
    from mtg_bulk_database_spark.queries_extra import asof_click_depth

    t0 = time.perf_counter()
    ivf_prebuilt_index(spark, SF_DIR)
    pq_prebuilt_index(spark, SF_DIR)
    asof_click_depth(spark, SF_DIR)
    jaccard_lean_pair_estimate(spark, SF_DIR)
    shingle_prebuilt_table(spark, SF_DIR, "string")
    shingle_prebuilt_table(spark, SF_DIR, "hashed")
    hot_shingles_prebuilt(spark, SF_DIR)
    paragraph_prebuilt_table(spark, SF_DIR)
    paragraph_shingles_prebuilt(spark, SF_DIR)
    paragraph_hot_shingles_prebuilt(spark, SF_DIR)
    documents_artifact_root(spark, SF_DIR, subset="all")
    documents_artifact_root(spark, SF_DIR, subset="corpus90")
    documents_artifact_root(spark, SF_DIR, subset="structsep")
    ivf_drift_root(spark, SF_DIR)
    takedown_artifact_root(spark, SF_DIR)
    print(f"ingest: {time.perf_counter()-t0:.1f}s", flush=True)

    # FULL warm pass (bench pass 1) to reach bench-warm JIT state
    t0 = time.perf_counter()
    for name in HEADLINE:
        if name in queries:
            queries[name](spark, SF_DIR).count()
    print(f"warm pass: {time.perf_counter()-t0:.1f}s", flush=True)

    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    out = {}
    for name in TARGETS:
        fn = queries[name]
        seen = {s["stageId"] for s in _get(f"{base}/stages")}
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        stages = [
            s
            for s in _get(f"{base}/stages?status=complete")
            if s["stageId"] not in seen
        ]
        rows = sorted(
            (
                {
                    "name": s.get("name", ""),
                    "tasks": s.get("numCompleteTasks", 0),
                    "run_ms": s.get("executorRunTime", 0),
                    "shufW": s.get("shuffleWriteBytes", 0),
                    "shufR": s.get("shuffleReadBytes", 0),
                    "input": s.get("inputBytes", 0),
                }
                for s in stages
            ),
            key=lambda r: -r["run_ms"],
        )
        out[name] = {
            "wall": round(wall, 3),
            "n_stages": len(stages),
            "exec_s": round(sum(r["run_ms"] for r in rows) / 1000, 2),
            "stages": rows,
        }
        print(f"{name}: wall {wall:.2f}s stages={len(stages)} "
              f"exec={out[name]['exec_s']}s", flush=True)

    with open("/tmp/r11_profile2.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
