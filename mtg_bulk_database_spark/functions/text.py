"""Text/tokenization column functions — the engine's FTS core.

This is the Spark replacement for the reference's PostgreSQL full-text
search access path (GIN index on ``to_tsvector('english', name || ' ' ||
oracle_text)``, reference ``init.sql:144-146``): we define our own
documented tokenizer semantics (SURVEY §2.5 Q8) instead of emulating the
'english' tsvector config bit-for-bit:

    token  := maximal run of [a-zA-Z0-9], lowercased AFTER extraction
    ts_tokens := distinct tokens minus a fixed English stopword list

No locale-sensitive case mapping ever runs (r5 discipline, r6 form):
a full ``lower()`` pass would hit Turkish İ / Greek final sigma /
Kelvin-sign mappings that differ between JVM, Python, and ICU/DuckDB.
Instead the fold is a 26-entry ``translate`` (A-Z → a-z, 1:1, nothing
else touched), which preserves membership in the token class, so one
``regexp_extract_all`` of ``[a-z0-9]`` runs over the folded text
yields exactly the raw text's ``[a-zA-Z0-9]`` runs, lowercased — the
tokenizer family is engine- and locale-exact BY CONSTRUCTION, not just
on the corpora we happened to test (probed divergence set:
tests/test_pipeline_ops.py::test_tokenizer_locale_free).

Everything is a JVM-side column expression (split/filter/transform — no
UDFs), so FTS predicates stay inside whole-stage codegen and the
``ts_tokens`` column can be precomputed at ingest like a materialized
tsvector.

Each Spark expression has a ``sql_*`` twin producing the equivalent
DuckDB SQL — used by the differential-oracle tests so both engines apply
identical semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-zA-Z0-9]+"

#: Fixed, documented stopword list (deliberately small and versioned with
#: the engine — unlike PG's locale-dependent 'english' config, this is
#: reproducible across engines; divergence documented in SURVEY §7).
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a",
    "an",
    "and",
    "are",
    "as",
    "at",
    "be",
    "by",
    "for",
    "from",
    "in",
    "is",
    "it",
    "of",
    "on",
    "or",
    "that",
    "the",
    "to",
    "was",
    "were",
    "with",
)


#: The two halves of the ASCII case fold, kept as module constants so the
#: Spark ``translate``, the DuckDB twin, and Python ``str.translate`` are
#: all generated from the SAME table.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_PY_ASCII_FOLD = str.maketrans(ASCII_UPPER, ASCII_LOWER)


def ascii_fold(col: Column | str) -> Column:
    """ASCII-only case fold: A-Z mapped to a-z via a 26-entry
    ``translate`` — no Unicode case mapping ever runs, so the fold is
    byte-identical across Spark/DuckDB/Python (the ILIKE family's
    locale-free analog of the tokenizer's split-before-lower order)
    and cheaper than ``lower()`` on the hot scan (table walk vs a full
    case-conversion pass)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def py_ascii_fold(s: str) -> str:
    """Driver-side twin of :func:`ascii_fold` for folding needles."""
    return s.translate(_PY_ASCII_FOLD)


def sql_ascii_fold(expr: str) -> str:
    """DuckDB twin of :func:`ascii_fold`."""
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


TOKEN_RUN_RE = "[a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """All tokens of ``col`` in order.

    Fused form (r6): ASCII-fold via ``translate`` (26-entry table walk,
    locale-free by construction — it maps exactly A-Z and nothing
    else), then ONE ``regexp_extract_all`` of maximal ``[a-z0-9]`` runs.
    Because the fold is a 1:1 map within the token class, the runs are
    exactly the raw text's ``[a-zA-Z0-9]`` runs, lowercased — the same
    arrays the r5 split→filter→lower pipeline produced (equivalence
    pinned in tests), with three array passes (split with empty-string
    artifacts, filter, per-element lower) collapsed into one regexp
    pass over pre-folded text. A/B at sf0.1 on the q80 chunk path:
    0.693 s → 0.416 s median, interleaved 7 rounds, same JVM."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        F.translate(c, ASCII_UPPER, ASCII_LOWER), F.lit(TOKEN_RUN_RE), 0
    )


def ts_tokens(col: Column | str) -> Column:
    """Distinct non-stopword tokens — the materialized-tsvector column."""
    return F.array_distinct(
        F.filter(tokens(col), lambda t: ~t.isin(*ENGLISH_STOPWORDS))
    )


def _query_terms(terms: Sequence[str]) -> list[str]:
    """Run query terms through the SAME tokenizer+stopword pipeline as
    the document side (``plainto_tsquery`` behavior): lowercase, split
    on non-alphanumerics, drop stopwords, dedup. Without this, a
    stopword term ('the') or punctuated term ('fire-ball') could never
    match any ts_token and the whole query silently returned nothing."""
    import re

    out: list[str] = []
    for t in terms:
        for raw in re.split(TOKEN_SPLIT_RE, t):
            tok = raw.lower()
            if tok and tok not in ENGLISH_STOPWORDS and tok not in out:
                out.append(tok)
    return out


def fts_match_all(doc_tokens: Column, terms: Sequence[str]) -> Column:
    """``plainto_tsquery('a & b')`` analog: every (non-stopword) term
    present. All-stopword queries match nothing, like an empty tsquery."""
    toks = _query_terms(terms)
    if not toks:
        return F.lit(False)
    arr = F.array(*[F.lit(t) for t in toks])
    return F.size(F.array_intersect(doc_tokens, arr)) == len(toks)


def fts_match_any(doc_tokens: Column, terms: Sequence[str]) -> Column:
    """``to_tsquery('a | b')`` analog: at least one term present."""
    toks = _query_terms(terms)
    if not toks:
        return F.lit(False)
    arr = F.array(*[F.lit(t) for t in toks])
    return F.arrays_overlap(doc_tokens, arr)


# --- DuckDB-SQL twins (for the differential oracle) ---------------------


def sql_tokens(expr: str) -> str:
    return (
        f"regexp_extract_all({sql_ascii_fold(expr)}, '{TOKEN_RUN_RE}')"
    )


def sql_stopword_array() -> str:
    inner = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    return f"[{inner}]"


def sql_ts_tokens(expr: str) -> str:
    return (
        f"list_distinct(list_filter({sql_tokens(expr)},"
        f" x -> NOT list_contains({sql_stopword_array()}, x)))"
    )
