"""Engine-exact numeric helpers shared by the oracle builders and the
Spark bodies (a LEAF module: query modules import it without circular
edges)."""

from __future__ import annotations


def micro_ratio_sql(num: str, den: str, div: str) -> str:
    """Overflow-safe ``floor(num * 10^6 / den)`` for non-negative
    BIGINTs: the naive ``num * 1000000`` overflows int64 once num
    reaches ~9.2e12 (a single multi-trillion-token source at the
    100 TB operating point — the same defect class as q242's int32
    overflow, one width up; caught by the r9 review).  Split the
    multiplier: with num = q*den + r and r*1000 = q1*den + r1,
    floor(num*1e6/den) = q*1e6 + q1*1000 + floor(r1*1000/den) — every
    intermediate stays under int64 for den <= 9.2e15.  ``div`` is the
    engine's integer-division operator ('//' DuckDB, 'DIV' Spark);
    all operands must be non-negative (true by construction at every
    call site)."""
    q = f"({num} {div} {den})"
    r = f"({num} % {den})"
    q1 = f"(({r} * 1000) {div} {den})"
    r1 = f"(({r} * 1000) % {den})"
    return f"({q} * 1000000 + {q1} * 1000 + ({r1} * 1000) {div} {den})"


def guarded_micro_ratio_sql(num: str, den: str, div: str) -> str:
    """:func:`micro_ratio_sql` guarded for a possibly-zero
    denominator (0 instead of a division error)."""
    return (
        f"CASE WHEN {den} > 0 THEN "
        + micro_ratio_sql(num, den, div)
        + " ELSE 0 END"
    )
