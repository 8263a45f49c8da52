"""Ingest transform layer — the Spark re-expression of the reference's
per-card Python pipeline (``import_cards.py:150-212``), as pure DataFrame
operators (SURVEY §2.2-2.3: P1-P6, F1-F2).

Everything is a declarative column expression: Catalyst fuses the whole
layer into one codegen'd projection over the JSON/parquet scan — there is
no per-row Python anywhere on this path, which is what lets the same code
ingest a 100 TB bulk drop across a cluster.

Row-policy parity with the reference:
- missing ``id``       → dropped, counted      (F1, import_cards.py:355-357)
- unknown ``layout``   → kept, counted (warn)  (P6, import_cards.py:187-189);
  the stricter Postgres-ENUM behavior (reject) is available via
  ``quarantine_invalid_layout``
- invalid date string  → NULL                  (P2, import_cards.py:150-157)
- Decimal→float        → schema-level: cmc is DoubleType (P3,
  import_cards.py:159-172) — documented precision semantics, no operator
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ALLOWED_LAYOUTS, CARD_COLUMNS, SET_COLUMNS
from ..functions.text import ts_tokens

#: names of the df.observe() metrics emitted by prepare_cards.
OBS_CARDS = "ingest_cards_metrics"


def project_cards(df: DataFrame) -> DataFrame:
    """P1 — fixed-list projection. The schema'd reader already dropped
    unknown keys and NULL-filled missing ones (import_cards.py:200-211);
    this pins column order to the declared 68."""
    return df.select(*[c for c in CARD_COLUMNS if c in df.columns])


def coerce_dates(df: DataFrame, col: str = "released_at") -> DataFrame:
    """P2 — ISO-date cast, invalid → NULL (import_cards.py:150-157).

    ``try_to_date`` keeps the permissive semantics under ANSI mode.
    """
    if dict(df.dtypes).get(col) == "date":
        return df
    return df.withColumn(col, F.try_to_date(F.col(col)))


def aggregate_face_images(df: DataFrame) -> DataFrame:
    """P5 — multiface image aggregation (import_cards.py:192-198).

    The reference overwrites ``image_uris`` with an array of per-face
    maps when a card has faces and no top-level image — creating a
    union-typed column. We keep ``image_uris`` MAP-typed and derive
    ``face_image_uris ARRAY<MAP>`` instead (SURVEY §1.3): same
    information, clean type, pure higher-order function.
    """
    faces = F.col("card_faces")
    return df.withColumn(
        "face_image_uris",
        F.when(
            F.col("image_uris").isNull() & faces.isNotNull(),
            F.filter(
                F.transform(faces, lambda f: f["image_uris"]),
                lambda m: m.isNotNull(),
            ),
        ),
    )


def with_layout_validity(df: DataFrame) -> DataFrame:
    """P6 — layout domain check against the 24-value ENUM
    (init.sql:6-31). Adds ``_layout_valid``; policy applied by caller."""
    return df.withColumn(
        "_layout_valid",
        F.col("layout").isNull() | F.col("layout").isin(*ALLOWED_LAYOUTS),
    )


def quarantine_invalid_layout(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Stricter Postgres-ENUM policy: route invalid layouts to a
    quarantine side output instead of warn-and-keep."""
    flagged = with_layout_validity(df)
    good = flagged.filter(F.col("_layout_valid")).drop("_layout_valid")
    bad = flagged.filter(~F.col("_layout_valid")).drop("_layout_valid")
    return good, bad


def drop_missing_id(df: DataFrame) -> DataFrame:
    """F1/F2 — rows without a PK are dropped (import_cards.py:355-357);
    the count is emitted via the observation metrics."""
    return df.filter(F.col("id").isNotNull())


def with_fts_tokens(df: DataFrame) -> DataFrame:
    """Q8 prep — materialized-tsvector column over name ∥ oracle_text
    (the GIN tsvector index's expression, init.sql:144-146)."""
    doc = F.concat_ws(
        " ", F.coalesce(F.col("name"), F.lit("")), F.coalesce(F.col("oracle_text"), F.lit(""))
    )
    return df.withColumn("ts_tokens", ts_tokens(doc))


def prepare_cards(
    raw: DataFrame, strict_layout: bool = False, observation=None
) -> DataFrame:
    """Full cards transform: P1→P2→P5→P6→F1 (+ FTS tokens), with an
    ``observe`` metric set (rows_in, rows_no_id, rows_bad_layout) —
    the distributed replacement for the importer's warn-prints.

    Pass a ``pyspark.sql.Observation`` as ``observation`` to read the
    counts after the first action (``obs.get["rows_no_id"]`` — the
    importer's "missing id" warnings, import_cards.py:355-357, as
    queryable metrics). Observations are single-use; omit it (a plain
    named observe is attached) when the frame runs more than once.

    With ``strict_layout`` the ENUM-reject behavior applies (invalid
    layouts dropped); default matches the importer (warn-and-keep).
    """
    df = project_cards(raw)
    df = coerce_dates(df)
    df = aggregate_face_images(df)
    df = with_layout_validity(df)
    metrics = (
        F.count(F.lit(1)).alias("rows_in"),
        F.count(F.when(F.col("id").isNull(), 1)).alias("rows_no_id"),
        F.count(F.when(~F.col("_layout_valid"), 1)).alias("rows_bad_layout"),
    )
    df = df.observe(observation if observation is not None else OBS_CARDS, *metrics)
    df = drop_missing_id(df)
    if strict_layout:
        df = df.filter(F.col("_layout_valid"))
    df = df.drop("_layout_valid")
    return with_fts_tokens(df)


def prepare_sets(raw: DataFrame) -> DataFrame:
    """Sets transform: projection + date coercion + PK filter
    (import_cards.py:230-242, 274-277)."""
    df = raw.select(*[c for c in SET_COLUMNS if c in raw.columns])
    df = coerce_dates(df)
    return drop_missing_id(df)
