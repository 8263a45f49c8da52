"""Round-12 measurement pass (guide §1): per-query isolation profile
with stage breakdown (wall cold/warm, executorRunTime, executorCpuTime,
shuffle bytes) for the expensive headline entries, plus — VERDICT r11
item 9 — a sweep of every registered-but-unbenched query to surface the
10 most expensive and confirm the shared-kernel wins flow through.

Usage:
    python tools/r12_profile.py [targets|sweep|both]   (default: both)

Writes /tmp/r12_profile.json and prints a table; run SOLO (no other
Spark app on the host) or the numbers are thrash, not measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: expensive/changed headline entries for the deep stage profile
TARGETS = [
    "q176_scale_exact_percentiles",
    "q251_paragraph_near_dup_lsh",
    "q244_ivf_workload_recall",
    "q241_ivf_nprobe_sweep",
    "q233_pagerank_unrolled",
    "q71_curate_corpus",
    "q223_pq_adc_probe_portable",
    "q224_shingle_containment",
    "q222_grouped_ndcg",
    "q150_market_basket",
    "q144_supplier_triangles",
    "q132_image_phash_pairs",
    "q148_cross_format_image_dedup",
    "q130_video_frame_sample",
    "q214_source_token_kl",
    "q226_dsir_importance",
    "q239_domain_reweight_eg",
    "q259_paragraph_near_dup_rewrite",
    "q253_decontaminated_manifest",
    "q255_shortfall_reallocation",
    "q254_incremental_paragraph_near_dup",
    "q263_epoch_shard_plan",
    # the six restored bench entries
    "q35_embedding_top_pairs",
    "q247_top_repeated_paragraphs",
    "q248_mix_manifest",
    "q249_fertility_capped_allocation",
    "q256_structural_paragraph_dedup",
    "q257_artifact_paragraph_stats",
]


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _profile_one(spark, base, fn, name, out):
    sc = spark.sparkContext
    sc.setJobDescription(f"profile:{name}")
    t0 = time.perf_counter()
    fn(spark, SF_DIR).count()
    cold = time.perf_counter() - t0
    seen = {s["stageId"] for s in _get(f"{base}/stages")}
    t0 = time.perf_counter()
    fn(spark, SF_DIR).count()
    warm = time.perf_counter() - t0
    sc.setJobDescription(None)
    stages = [
        s
        for s in _get(f"{base}/stages?status=complete")
        if s["stageId"] not in seen
    ]
    rows = sorted(
        (
            {
                "name": s.get("name", "")[:48],
                "tasks": s.get("numCompleteTasks", 0),
                "run_ms": s.get("executorRunTime", 0),
                "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
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
        "run_s": round(sum(r["run_ms"] for r in rows) / 1000, 2),
        "cpu_s": round(sum(r["cpu_ms"] for r in rows) / 1000, 2),
        "top_stages": rows[:6],
    }
    q = out["queries"][name]
    print(
        f"{name}: cold {cold:.2f} warm {warm:.2f} stages={q['n_stages']} "
        f"tasks={q['n_tasks']} run={q['run_s']}s cpu={q['cpu_s']}s",
        flush=True,
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    from bench import HEADLINE
    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name="r12-profile",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    out = {"queries": {}, "sweep": {}}

    if mode in ("targets", "both"):
        for name in TARGETS:
            if name in queries:
                _profile_one(spark, base, queries[name], name, out)
            else:
                print(f"skip {name} (not registered)")

    if mode in ("sweep", "both"):
        # every registered query NOT on the bench line: one warmed
        # timing each (min of 2), then a deep profile of the top 10
        benched = set(HEADLINE)
        names = sorted(n for n in queries if n not in benched)
        print(f"sweep: {len(names)} unbenched queries", flush=True)
        for name in names:
            try:
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    queries[name](spark, SF_DIR).count()
                    ts.append(time.perf_counter() - t0)
                out["sweep"][name] = round(min(ts), 3)
            except Exception as e:  # pragma: no cover - report, don't die
                out["sweep"][name] = f"ERR {type(e).__name__}: {e}"[:120]
            print(f"  {name}: {out['sweep'][name]}", flush=True)
        top = sorted(
            (
                (v, k)
                for k, v in out["sweep"].items()
                if isinstance(v, float)
            ),
            reverse=True,
        )[:10]
        print("top-10 unbenched:", top, flush=True)
        for _, name in top:
            if name not in out["queries"]:
                _profile_one(spark, base, queries[name], name, out)

    with open("/tmp/r12_profile.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
