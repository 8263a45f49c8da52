"""Fuzzed differential harness: every oracle-paired query runs against
RANDOMIZED schema-compatible data (different seeds, engineered boundary
cases: session gaps straddling the watermark threshold with sub-second
fractions, shingle-edge documents, exact/near dups, nano timestamps).

The fixed driver corpus can pass 'by luck' — a truncation bug in the
sessionizer survived it because no gap fell in the disagreement band.
This harness is the guard against that class of latent divergence.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from mtg_bulk_database_spark.catalog import TESTDATA_TABLES
from mtg_bulk_database_spark.registry import load_registry

from .datagen import make_fuzz_dir
from .test_oracle_parity import _canon

QUERIES, ORACLE_SQL = load_registry()

SEEDS = (7, 101)


@pytest.fixture(scope="module", params=SEEDS)
def fuzz_env(request, tmp_path_factory):
    seed = request.param
    d = make_fuzz_dir(
        str(tmp_path_factory.mktemp(f"fuzz_{seed}")), seed=seed
    )
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(d, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield d, con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_fuzzed_oracle_parity(spark, fuzz_env, name):
    sf_dir, duck = fuzz_env
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE_SQL[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} vs {len(duck_rows)}"
    )
    cs, cd = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(cs, cd) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} differing rows; first: {mismatches[:2]}"
    )


def test_fuzzed_rows_only_queries_run(spark, fuzz_env):
    """Rows-only queries (no SQL twin) still must EXECUTE on the
    adversarial corpora — locale traps, VT/NBSP separators, empty and
    NULL text. A Python-side ``None.lower()``/``bytes(None)`` crash in
    a sampled-driver or mapInPandas stage only surfaces on data like
    this (the fixed corpus has no NULLs at all)."""
    sf_dir, _ = fuzz_env
    for name, fn in QUERIES.items():
        if name in ORACLE_SQL:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_kaplan_meier_boundary_ln_corpus(spark, tmp_path):
    """r6 hardening (VERDICT r5 #8): q208's survival product is
    exp(Σ round(ln(factor), 6)) — a factor whose ln lands near a
    5e-7 rounding boundary is where differing libm implementations
    could round apart. Build a life table that GREEDILY forces every
    step's factor as close to a boundary as integer (n_at_risk, d)
    pairs allow, then require Spark and DuckDB to hash-match on it."""
    import math

    import pandas as pd

    # greedy boundary-seeking life table: at each step pick the death
    # count whose ln(factor) has fractional micro-part nearest .5
    n = 400
    steps = []  # (day, deaths, censored)
    day = 1
    while n > 60 and day <= 14:
        best_d, best_gap = 1, 1.0
        for d in range(1, min(40, n - 20)):
            x = abs(
                math.modf(1e6 * math.log((n - d) / n))[0].__abs__() - 0.5
            )
            if x < best_gap:
                best_gap, best_d = x, d
        c = 5
        steps.append((day, best_d, c))
        n -= best_d + c
        day += 1

    rows = []
    uid, eid = 0, 0
    base = pd.Timestamp("2024-01-01")

    def add(day_off: int, etype: str):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": base + pd.Timedelta(seconds=day_off * 86400 + 3600),
                "user_id": uid,
                "event_type": etype,
                "value": 1.0,
                "props": "{}",
            }
        )
        eid += 1

    for day, deaths, censored in steps:
        for _ in range(deaths):
            add(0, "view"); add(day, "purchase"); uid += 1
        for _ in range(censored):
            add(0, "view"); add(day, "view"); uid += 1
    for _ in range(n):  # remaining users censored past the table
        add(0, "view"); add(20, "view"); uid += 1

    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[ns]")  # driver corpus quirk
    sf_dir = str(tmp_path)
    df.to_parquet(os.path.join(sf_dir, "events.parquet"), index=False)

    sdf = QUERIES["q208_kaplan_meier"](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    res = con.execute(ORACLE_SQL["q208_kaplan_meier"])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert len(spark_rows) == len(duck_rows) >= len(steps)
    cs, cd = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    assert cs == cd, [
        (a, b) for a, b in zip(cs, cd) if a != b
    ][:3]
