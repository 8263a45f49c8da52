"""cProfile q176's full call (construction + the driver-side recipe)."""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtg_bulk_database_spark.registry import load_registry
from mtg_bulk_database_spark.session import get_spark

QUERIES, _ = load_registry()
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="r11b-q176",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

fn = QUERIES["q176_scale_exact_percentiles"]
fn(spark, SF).count()  # warm
for _ in range(2):
    t0 = time.perf_counter()
    df = fn(spark, SF)
    t1 = time.perf_counter()
    df.count()
    t2 = time.perf_counter()
    print(f"build {t1-t0:.3f}s  action {t2-t1:.3f}s")

pr = cProfile.Profile()
pr.enable()
df = fn(spark, SF)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
print(s.getvalue())
spark.stop()
