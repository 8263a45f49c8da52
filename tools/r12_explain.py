"""Capture `.explain("formatted")` for named queries into plans/r12/.

Usage: python tools/r12_explain.py <suffix> <query_name> [...]
Writes plans/r12/<name>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r12",
)


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from mtg_bulk_database_spark.registry import load_registry
    from mtg_bulk_database_spark.session import get_spark

    queries, _ = load_registry()
    spark = get_spark(
        app_name="r12-explain",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {suffix} plan captured", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
