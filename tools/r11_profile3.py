"""Round-11 clean measurement pass over every headline entry.

For each headline query: DataFrame CONSTRUCTION time (driver-side plan
build), cold count, min-of-2 warm count, executor CPU (status API),
stage/task counts — and the before-side `.explain("formatted")` capture
into plans/r11/.  Run SOLO; writes /tmp/r11_profile3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r11",
)


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    explain_only = "--explain-only" in sys.argv
    from bench import HEADLINE  # the exact driver-measured set

    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name="r11-profile3",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS, exist_ok=True)

    # untimed ingest prebuild exactly as bench.py does
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
    print(f"ingest prebuild: {time.perf_counter() - t0:.1f}s", flush=True)

    names = [n for n in HEADLINE if n in queries]
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    out = {}

    for name in names:
        fn = queries[name]
        # before-side plan capture (no execution)
        plan_path = os.path.join(PLANS, f"{name}_before.txt")
        try:
            if not os.path.exists(plan_path):  # never clobber a captured before-plan
                df0 = fn(spark, SF_DIR)
                plan = df0._sc._jvm.PythonSQLUtils.explainString(
                    df0._jdf.queryExecution(), "formatted"
                )
                with open(plan_path, "w") as fh:
                    fh.write(plan)
        except Exception as exc:  # pragma: no cover
            print(f"{name}: explain failed: {exc}", flush=True)
        if explain_only:
            print(f"{name}: plan captured", flush=True)
            continue

        sc.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_construct = time.perf_counter() - t0

        t0 = time.perf_counter()
        df.count()
        t_cold = time.perf_counter() - t0

        seen = {s["stageId"] for s in _get(f"{base}/stages")}
        warms = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            warms.append(time.perf_counter() - t0)
        t_warm = min(warms)
        stages = [
            s
            for s in _get(f"{base}/stages?status=complete")
            if s["stageId"] not in seen
        ]
        run_s = sum(s.get("executorRunTime", 0) for s in stages) / 2 / 1000
        cpu_s = sum(s.get("executorCpuTime", 0) for s in stages) / 2 / 1e9
        out[name] = {
            "construct": round(t_construct, 3),
            "cold": round(t_cold, 3),
            "warm": round(t_warm, 3),
            # executorCpuTime: actual on-CPU nanoseconds — robust against
            # host contention, the round's primary A/B metric
            "cpu_per_run": round(cpu_s, 2),
            # executorRunTime: task wall — inflates under contention
            "runtime_per_run": round(run_s, 2),
            "stages_per_run": len(stages) // 2,
            "tasks_per_run": sum(s.get("numCompleteTasks", 0) for s in stages) // 2,
        }
        sc.setJobDescription(None)
        q = out[name]
        print(
            f"{name}: construct {q['construct']:.2f} cold {q['cold']:.2f} "
            f"warm {q['warm']:.2f} cpu/run {q['cpu_per_run']:.1f} "
            f"stages {q['stages_per_run']} tasks {q['tasks_per_run']}",
            flush=True,
        )

    with open("/tmp/r11_profile3.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
