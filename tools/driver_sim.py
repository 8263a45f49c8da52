"""Simulate the verification driver: plain default SparkSession (none of
the engine's tuned configs), import __spark_entry__ from the repo, run
entry() smoke + every queries()[name] at sf0.01 vs oracle_sql() in DuckDB.
"""
import sys, os, math, datetime as dt

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# --- smoke: entry() ---
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) >= 0

# --- correctness: queries vs oracle at sf0.01 ---
import duckdb
con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon_cell(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(canon_cell(x) for x in v)
    return v

qs, osql = e.queries(), e.oracle_sql()
only = set(sys.argv[1:])  # optional: driver_sim.py q44_... q42_... for a fast subset
if only:
    qs = {k: v for k, v in qs.items() if k in only}
fail = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    scols = sorted(c.lower() for c in sdf.columns)
    srows = sorted([tuple(canon_cell(v) for v in (tuple(r[c] for c in sorted(sdf.columns, key=str.lower)))) for r in sdf.collect()], key=repr)
    if name not in osql:
        print(f"  {name}: rows-only, {len(srows)} rows OK")
        continue
    # the external comparator renders HUGEINT / TIMESTAMPTZ outputs
    # differently from Python coercion (every r5 red row) — fail loud
    # here instead of shipping a latent driver mismatch
    rel = con.sql(osql[name])
    badtypes = [
        f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
        if any(b in str(t).upper() for b in ("HUGEINT", "UHUGEINT", "TIME ZONE"))
    ]
    if badtypes:
        fail += 1
        print(f"  {name}: ORACLE-TYPE driver-unsafe outputs {badtypes}")
        continue
    res = con.execute(osql[name])
    dcols = sorted(d[0].lower() for d in res.description)
    dcols_orig = [d[0] for d in res.description]
    order = sorted(range(len(dcols_orig)), key=lambda i: dcols_orig[i].lower())
    drows = sorted([tuple(canon_cell(r[i]) for i in order) for r in res.fetchall()], key=repr)
    ok = scols == dcols and srows == drows
    status = "MATCH" if ok else "MISMATCH"
    if not ok:
        fail += 1
        print(f"  {name}: {status} sparkrows={len(srows)} duckrows={len(drows)} scols={scols} dcols={dcols}")
        for a, b in list(zip(srows, drows))[:3]:
            if a != b:
                print(f"    spark={a}\n    duck ={b}")
    else:
        print(f"  {name}: {status} ({len(srows)} rows)")
print(f"\n{len(qs)} queries, {len(osql)} oracled, {fail} mismatches")
sys.exit(1 if fail else 0)
