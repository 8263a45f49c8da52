"""The driver records only a bounded tail of bench.py's output and
parses the LAST line as JSON — r3's full-name keys overflowed that
window and BENCH_r03 recorded `parsed: null`.  Pin the two properties
that keep the contract safe as the headline set grows."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def _projected_line(extra_queries: int = 0) -> str:
    q = {n.split("_", 1)[0]: 99.99 for n in HEADLINE}
    # hypothetical future additions, worst-width keys ('"q999":99.99,')
    for i in range(extra_queries):
        q[f"x{900 + i}"] = 99.99
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 9999.9999,
            "unit": "sec",
            "queries": q,
            "sf": 0.1,
            "ingest_sec": 9999.99,
            "canary_sec": 99.99,
        },
        separators=(",", ":"),
    )


def test_bench_json_line_stays_parseable():
    # Headroom (r8): per-query stdout values are 2-decimal (each entry
    # ~13 chars, '"q123":99.99,'), so the 1600-char cap holds to ~119
    # entries; BENCH_LOCAL.json keeps full precision.  bench.py
    # enforces the same cap at runtime — if the per-query map would
    # overflow it, the map is dropped from stdout (total stays) and
    # BENCH_LOCAL.json keeps the full per-query timings; the assert
    # here is the early warning.
    line = _projected_line()
    assert len(line) < 1600, (
        f"bench JSON line would be {len(line)} chars — shrink keys or "
        "trim the headline set before it outgrows the driver's tail"
    )


def test_bench_json_line_has_next_round_headroom():
    # VERDICT r9 #7: fail BEFORE the driver truncates — eviction
    # decisions belong in review, not after a lost tail.  Require the
    # line to survive TEN more worst-width entries, i.e. one round's
    # typical growth, so the round that must trim learns it at pytest
    # time rather than from a dropped per-query map.
    line = _projected_line(extra_queries=10)
    assert len(line) < 1600, (
        f"bench JSON line would be {len(line)} chars with +10 queries "
        f"({len(_projected_line())} today) — trim HEADLINE now (keep "
        "one representative per operator family; see bench.py notes)"
    )


def test_bench_short_keys_unique():
    short = [n.split("_", 1)[0] for n in HEADLINE]
    assert len(set(short)) == len(short), "qNN key collision in HEADLINE"


def test_bench_headline_names_all_registered():
    from mtg_bulk_database_spark.registry import load_registry

    queries, _ = load_registry()
    missing = [n for n in HEADLINE if n not in queries]
    assert not missing, f"HEADLINE names not in registry: {missing}"
