"""Pins for ``functions.exact`` — the house micro-ratio used by every
oracled integer-ratio gate (ADVICE r9 #3: the non-negative-operand
precondition was documented but nothing failed loudly on misuse).

Investigating the advice sharpened it: on integer inputs DuckDB ``//``
TRUNCATES toward zero exactly like Spark ``DIV`` (it floors only for
floats), so a negative numerator does not split the engines — it
silently breaks the FLOOR contract instead (truncation ≠ floor on
inexact negative quotients), and DuckDB's INT32 literal typing can
overflow where Spark computes.  The domain docstring was also
incomplete: the RESULT must fit int64 (q*1e6 is a real multiply), not
just the denominator.  Both corrected bounds are pinned here.
"""

from __future__ import annotations

import duckdb
import pytest

from mtg_bulk_database_spark.functions.exact import (
    guarded_micro_ratio_sql,
    micro_ratio_sql,
)


def _duck(expr: str):
    return duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]


def _spark(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").first()["v"]


@pytest.mark.parametrize(
    ("num", "den"),
    [
        (0, 1),
        (1, 3),
        (7, 2),
        (999_999, 1_000_000),
        (9_199_999_999_999_999, 9_200_000_000_000_000),  # den at the bound
        (9_200_000_000_000_000, 1_000_001),  # result ~9.2e15, safe
        (123_456_789_012_345, 997),
        (9_000_000_000_000_000_000, 1_000_000_000_000),  # result ~9e12
    ],
)
def test_micro_ratio_engines_agree_on_valid_domain(spark, num, den):
    """Inside the documented domain (num >= 0, 0 < den <= 9.2e15,
    result <= 9.2e18) both engines produce the identical
    floor(num * 1e6 / den)."""
    d = _duck(micro_ratio_sql(str(num), str(den), "//"))
    s = _spark(spark, micro_ratio_sql(str(num), str(den), "DIV"))
    assert d == s == (num * 10**6) // den


def test_result_bound_is_real_overflow():
    """Past the RESULT bound the expression overflows loudly (DuckDB
    throws; so would Spark ANSI) — the reason the docstring states the
    num/den ratio limit, not only den's width.  A ratio of 1.3e15
    epochs can't arise at any call site, but if it could, this is the
    failure mode: an error, not a silently wrong number."""
    with pytest.raises(duckdb.OutOfRangeException):
        _duck(micro_ratio_sql(str(9_200_000_000_000_000), "7", "//"))


def test_negative_numerator_breaks_floor_not_parity(spark):
    """The sharpened precondition: integer ``//`` (DuckDB) and ``DIV``
    (Spark) BOTH truncate toward zero, so the engines agree on a
    negative numerator — but the result is no longer the floor the
    helper promises (-1/3 of a micro: floor -333334, truncation
    -333333).  A future call site feeding a possibly-negative
    expression must offset-shift first (the q235
    ``(s + n*K) DIV n - K`` trick); this pin is what fails loudly if
    someone assumes the helper floors for them."""
    num, den = -1, 3
    assert _duck(f"{num} // {den}") == 0  # truncate, NOT floor (-1)
    assert _spark(spark, f"{num} DIV {den}") == 0
    d = _duck(micro_ratio_sql(str(num), str(den), "//"))
    s = _spark(spark, micro_ratio_sql(str(num), str(den), "DIV"))
    assert d == s == -333333  # engines agree...
    assert d != (num * 10**6) // den  # ...but the floor contract broke


def test_guarded_micro_ratio_zero_and_negative_den(spark):
    """The guard returns 0 for den <= 0 in BOTH engines (the CASE
    covers negative denominators too, not just zero)."""
    for den in ("0", "-5"):
        d = _duck(guarded_micro_ratio_sql("7", den, "//"))
        s = _spark(spark, guarded_micro_ratio_sql("7", den, "DIV"))
        assert d == s == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _valid_micro_operands(draw):
    den = draw(st.integers(1, 9_200_000_000_000_000))
    # result bound: num*1e6/den <= 9.2e18  =>  num <= den * 9.2e12
    num_hi = min(9_200_000_000_000_000_000, den * 9_200_000_000_000)
    num = draw(st.integers(0, num_hi))
    return num, den


@given(_valid_micro_operands())
@settings(max_examples=60, deadline=None)
def test_micro_ratio_hypothesis_sweep(spark, pair):
    """Randomized domain sweep: for any (num, den) inside the
    documented bounds both engines equal Python's exact floor.

    Operands are CAST to BIGINT as the helper's contract requires
    (every real call site feeds BIGINT column expressions): hypothesis
    itself found that a bare sub-2^31 literal is INT32 in DuckDB, so
    ``q * 1000000`` overflows INT32 for quotients >= 2148 even with
    non-negative in-domain inputs — see the next test."""
    num, den = pair
    want = (num * 10**6) // den
    n, d_ = f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)"
    d = _duck(micro_ratio_sql(n, d_, "//"))
    s = _spark(spark, micro_ratio_sql(n, d_, "DIV"))
    assert d == s == want, (num, den)


def test_micro_ratio_int32_literal_hazard():
    """The BIGINT-operand contract is load-bearing: a bare INT32-range
    numerator literal overflows DuckDB's INT32 multiply inside the
    helper (found by the hypothesis sweep).  Real call sites pass
    BIGINT columns; anyone embedding literals must cast them."""
    import duckdb as _dd

    with pytest.raises(_dd.OutOfRangeException):
        _duck(micro_ratio_sql("2148", "1", "//"))
    assert _duck(
        micro_ratio_sql("CAST(2148 AS BIGINT)", "1", "//")
    ) == 2148 * 10**6
