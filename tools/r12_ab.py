"""Interleaved A/B probe: time the named queries (1 warm-up + N timed
passes, report each + min) in ONE session and print a JSON line.

Usage: python tools/r12_ab.py <label> <query> [...]
Env: SPARK_GRAFT_SF_DIR, R12_AB_PASSES (default 3).

Run alternately against two working-tree states (git stash / pop) in
the same window — the r11 A/B discipline; single-window numbers only.
Also dumps executorCpuTime/executorRunTime per query via the REST API.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("R12_AB_PASSES", "3"))


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    label = sys.argv[1]
    names = sys.argv[2:]
    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name=f"r12-ab-{label}",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    out = {"label": label, "queries": {}}
    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).count()  # warm
        seen = {s["stageId"] for s in _get(f"{base}/stages")}
        walls = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            walls.append(round(time.perf_counter() - t0, 3))
        stages = [
            s
            for s in _get(f"{base}/stages?status=complete")
            if s["stageId"] not in seen
        ]
        out["queries"][name] = {
            "walls": walls,
            "min": min(walls),
            "run_s": round(
                sum(s.get("executorRunTime", 0) for s in stages) / 1000, 2
            ),
            "cpu_s": round(
                sum(s.get("executorCpuTime", 0) for s in stages) / 1e9, 2
            ),
            "n_stages": len(stages),
        }
        print(f"{label} {name}: {out['queries'][name]}", flush=True)
    spark.stop()
    print("AB_JSON " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
