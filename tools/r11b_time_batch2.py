"""Time the batch-2 target queries (warm min-of-3) in one session."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtg_bulk_database_spark.registry import load_registry
from mtg_bulk_database_spark.session import get_spark

QUERIES, _ = load_registry()
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = [
    "q210_classifier_calibration",
    "q214_source_token_kl",
    "q226_dsir_importance",
    "q236_logreg_step_portable",
    "q106_gopher_quality_rules",
    "q40_quality_score",
    "q213_quality_gate_scoring",
    "q229_classifier_auc",
    "q121_quality_classifier",
    "q71_curate_corpus",
]
spark = get_spark(app_name="r11b-t2",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
out = {}
for n in NAMES:
    QUERIES[n](spark, SF).count()  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[n](spark, SF).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    out[n] = round(best, 3)
    print(f"{n}: {best:.3f}", flush=True)
print("TOTAL", round(sum(out.values()), 3))
spark.stop()
