"""Round-11 measurement pass (guide §1): time each untimed ingest
prebuild individually, then per-query wall + stage breakdown for the
expensive headline entries.  Writes /tmp/r11_profile.json.
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
    "q233_pagerank_unrolled",
    "q253_decontaminated_manifest",
    "q241_ivf_nprobe_sweep",
    "q251_paragraph_near_dup_lsh",
    "q259_paragraph_near_dup_rewrite",
    "q222_grouped_ndcg",
    "q223_pq_adc_probe_portable",
    "q150_market_basket",
    "q244_ivf_workload_recall",
    "q144_supplier_triangles",
    "q263_epoch_shard_plan",
    "q265_epoch_shard_churn",
    "q254_incremental_paragraph_near_dup",
    "q255_shortfall_reallocation",
    "q234_bpe_encode_frozen",
    "q239_domain_reweight_eg",
    "q177_minhash_lsh_portable",
    "q226_dsir_importance",
    "q33_minhash_lsh_pairs",
    "q201_hard_negatives",
    "q132_image_phash_pairs",
    "q236_logreg_step_portable",
    "q248_corpus_mix_manifest",
    "q32_ngram_jaccard_pairs",
    "q96_dup_clusters_star",
    "q245_paragraph_dedup",
    "q246_paragraph_near_dup",
    "q260_ingest_admission",
    "q262_ivf_drift_report",
    "q264_takedown_artifact_stats",
]


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name="r11-profile",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"ingest": {}, "queries": {}}

    # ---- ingest prebuild, timed per call (mirrors bench.py's block) ----
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
    from mtg_bulk_database_spark.pipeline_queries15 import (
        documents_artifact_root,
    )
    from mtg_bulk_database_spark.pipeline_queries16 import (
        ivf_drift_root,
        takedown_artifact_root,
    )
    from mtg_bulk_database_spark.queries_extra import asof_click_depth

    steps = [
        ("ivf_prebuilt_index", lambda: ivf_prebuilt_index(spark, SF_DIR)),
        ("pq_prebuilt_index", lambda: pq_prebuilt_index(spark, SF_DIR)),
        ("asof_click_depth", lambda: asof_click_depth(spark, SF_DIR)),
        ("jaccard_lean_pair_estimate", lambda: jaccard_lean_pair_estimate(spark, SF_DIR)),
        ("shingle_string", lambda: shingle_prebuilt_table(spark, SF_DIR, "string")),
        ("shingle_hashed", lambda: shingle_prebuilt_table(spark, SF_DIR, "hashed")),
        ("hot_shingles", lambda: hot_shingles_prebuilt(spark, SF_DIR)),
        ("paragraph_table", lambda: paragraph_prebuilt_table(spark, SF_DIR)),
        ("paragraph_shingles", lambda: paragraph_shingles_prebuilt(spark, SF_DIR)),
        ("paragraph_hot", lambda: paragraph_hot_shingles_prebuilt(spark, SF_DIR)),
        ("root_all", lambda: documents_artifact_root(spark, SF_DIR, subset="all")),
        ("root_corpus90", lambda: documents_artifact_root(spark, SF_DIR, subset="corpus90")),
        ("root_structsep", lambda: documents_artifact_root(spark, SF_DIR, subset="structsep")),
        ("ivf_drift_root", lambda: ivf_drift_root(spark, SF_DIR)),
        ("takedown_root", lambda: takedown_artifact_root(spark, SF_DIR)),
    ]
    for nm, fn in steps:
        t0 = time.perf_counter()
        fn()
        out["ingest"][nm] = round(time.perf_counter() - t0, 3)
        print(f"ingest {nm}: {out['ingest'][nm]}s", flush=True)

    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    for name in TARGETS:
        if name not in queries:
            print(f"skip {name} (not registered)")
            continue
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        cold = time.perf_counter() - t0

        seen = {s["stageId"] for s in _get(f"{base}/stages")}
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        warm = time.perf_counter() - t0

        stages = [
            s
            for s in _get(f"{base}/stages?status=complete")
            if s["stageId"] not in seen
        ]
        rows = sorted(
            (
                {
                    "name": s.get("name", "")[:50],
                    "tasks": s.get("numCompleteTasks", 0),
                    "run_ms": s.get("executorRunTime", 0),
                    "shufW": s.get("shuffleWriteBytes", 0),
                }
                for s in stages
            ),
            key=lambda r: -r["run_ms"],
        )
        out["queries"][name] = {
            "cold": round(cold, 3),
            "warm": round(warm, 3),
            "n_stages": len(stages),
            "n_tasks": sum(r["tasks"] for r in rows),
            "run_s_total": round(sum(r["run_ms"] for r in rows) / 1000, 2),
            "top_stages": rows[:6],
        }
        q = out["queries"][name]
        print(
            f"{name}: cold {cold:.2f}s warm {warm:.2f}s "
            f"stages={q['n_stages']} tasks={q['n_tasks']} "
            f"exec_total={q['run_s_total']}s",
            flush=True,
        )

    with open("/tmp/r11_profile.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
