"""A/B measurement for the graph-family queries (q61/q96/q233/q259):
bench-shaped timing (construct + count), min-of-N wall plus
executorCpuTime per run via the status API.  Run against the working
tree; interleave with `git stash` for the before side.
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
    "q61_dup_clusters",
    "q96_dup_clusters_star",
    "q233_pagerank_unrolled",
    "q259_paragraph_near_dup_rewrite",
]


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name="r11-ab-graph",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    # resolve (warm) prebuilt artifacts outside the timed region
    from mtg_bulk_database_spark.pipeline_queries import (
        hot_shingles_prebuilt,
        shingle_prebuilt_table,
    )
    from mtg_bulk_database_spark.pipeline_queries14 import (
        paragraph_hot_shingles_prebuilt,
        paragraph_prebuilt_table,
        paragraph_shingles_prebuilt,
    )

    shingle_prebuilt_table(spark, SF_DIR)
    hot_shingles_prebuilt(spark, SF_DIR)
    paragraph_prebuilt_table(spark, SF_DIR)
    paragraph_shingles_prebuilt(spark, SF_DIR)
    paragraph_hot_shingles_prebuilt(spark, SF_DIR)

    n = int(os.environ.get("AB_RUNS", "3"))
    out = {}
    for name in TARGETS:
        fn = queries[name]
        sc.setJobDescription(name)
        fn(spark, SF_DIR).count()  # warm (JIT, page cache)
        walls, cpus = [], []
        for _ in range(n):
            seen = {s["stageId"] for s in _get(f"{base}/stages")}
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            walls.append(time.perf_counter() - t0)
            stages = [
                s
                for s in _get(f"{base}/stages?status=complete")
                if s["stageId"] not in seen
            ]
            cpus.append(
                sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
            )
        sc.setJobDescription(None)
        out[name] = {
            "wall_min": round(min(walls), 3),
            "cpu_min": round(min(cpus), 2),
            "walls": [round(w, 2) for w in walls],
            "cpus": [round(c, 2) for c in cpus],
        }
        print(name, out[name], flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
