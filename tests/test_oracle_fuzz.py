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
