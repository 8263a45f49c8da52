"""Data model: explicit Spark schemas for the ``cards`` and ``sets``
tables.

Column inventory mirrors the reference DDL (``mtg-database/init.sql:34-103``
for cards, ``:109-124`` for sets; importer column lists
``import_cards.py:58-127,130-145``) with the JSONB columns given real Spark
types (SURVEY §1.3) so Catalyst gets predicate pushdown, column pruning and
``array_contains`` instead of opaque JSON blobs:

- UUID        → StringType (canonical 36-char text; Spark has no UUID type)
- NUMERIC cmc → DoubleType (the reference importer already collapses
                Decimal→float, ``import_cards.py:159-172`` — we match that
                documented loss of decimal semantics)
- layout ENUM → StringType + the 24-literal domain ``ALLOWED_LAYOUTS``
                (``init.sql:6-31``) enforced by the ingest validator
- JSONB       → ArrayType / MapType / StructType per observed Scryfall shape

The multiface union-type quirk (reference stores map-or-array-of-maps in
``image_uris``, ``import_cards.py:192-198``) is modeled cleanly as two
columns: top-level ``image_uris MAP`` plus derived
``face_image_uris ARRAY<MAP>`` — same information, no union type.

Schemas are fixed and declared ahead of time (never ``inferSchema``),
matching the reference's projection semantics: unknown JSON keys dropped,
missing keys → NULL (``import_cards.py:200-211``).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: the 24-value layout domain, init.sql:6-31 / import_cards.py:29-34.
ALLOWED_LAYOUTS: tuple[str, ...] = (
    "normal",
    "split",
    "flip",
    "transform",
    "modal_dfc",
    "meld",
    "leveler",
    "class",
    "case",
    "saga",
    "adventure",
    "mutate",
    "prototype",
    "battle",
    "planar",
    "scheme",
    "vanguard",
    "token",
    "double_faced_token",
    "emblem",
    "augment",
    "host",
    "art_series",
    "reversible_card",
)

_str = T.StringType()
_bool = T.BooleanType()
_int = T.IntegerType()
_double = T.DoubleType()
_date = T.DateType()
_str_arr = T.ArrayType(_str)
_str_map = T.MapType(_str, _str)

CARD_FACE_SCHEMA = T.StructType(
    [
        T.StructField("name", _str),
        T.StructField("mana_cost", _str),
        T.StructField("type_line", _str),
        T.StructField("oracle_text", _str),
        T.StructField("power", _str),
        T.StructField("toughness", _str),
        T.StructField("colors", _str_arr),
        T.StructField("image_uris", _str_map),
    ]
)

PREVIEW_SCHEMA = T.StructType(
    [
        T.StructField("source", _str),
        T.StructField("source_uri", _str),
        T.StructField("previewed_at", _str),
    ]
)

#: Related-card objects (Scryfall ``all_parts``): meld pieces, tokens,
#: combo partners. EXTENSION — the reference README documents the column
#: (README.md:84 ``all_parts JSONB``) but neither init.sql:34-103 nor the
#: importer column list (import_cards.py:58-127) carries it; we include
#: it typed (no JSONB escape hatch needed) per SURVEY §0.
ALL_PART_SCHEMA = T.StructType(
    [
        T.StructField("id", _str),
        T.StructField("object", _str),
        T.StructField("component", _str),
        T.StructField("name", _str),
        T.StructField("type_line", _str),
        T.StructField("uri", _str),
    ]
)

#: 68 reference columns ordered exactly as init.sql:35-102, plus the
#: ``all_parts`` extension (documented intent, README.md:84) at the end.
CARDS_SCHEMA = T.StructType(
    [
        T.StructField("id", _str, nullable=False),
        T.StructField("oracle_id", _str),
        T.StructField("object", _str),
        T.StructField("multiverse_ids", T.ArrayType(_int)),
        T.StructField("mtgo_id", _int),
        T.StructField("tcgplayer_id", _int),
        T.StructField("cardmarket_id", _int),
        T.StructField("name", _str),
        T.StructField("lang", _str),
        T.StructField("released_at", _date),
        T.StructField("uri", _str),
        T.StructField("scryfall_uri", _str),
        T.StructField("layout", _str),
        T.StructField("highres_image", _bool),
        T.StructField("image_status", _str),
        T.StructField("image_uris", _str_map),
        T.StructField("mana_cost", _str),
        T.StructField("cmc", _double),
        T.StructField("type_line", _str),
        T.StructField("oracle_text", _str),
        T.StructField("power", _str),
        T.StructField("toughness", _str),
        T.StructField("colors", _str_arr),
        T.StructField("color_identity", _str_arr),
        T.StructField("keywords", _str_arr),
        T.StructField("legalities", _str_map),
        T.StructField("games", _str_arr),
        T.StructField("reserved", _bool),
        T.StructField("game_changer", _bool),
        T.StructField("foil", _bool),
        T.StructField("nonfoil", _bool),
        T.StructField("finishes", _str_arr),
        T.StructField("oversized", _bool),
        T.StructField("promo", _bool),
        T.StructField("reprint", _bool),
        T.StructField("variation", _bool),
        T.StructField("set_id", _str),
        T.StructField("set", _str),
        T.StructField("set_name", _str),
        T.StructField("set_type", _str),
        T.StructField("set_uri", _str),
        T.StructField("set_search_uri", _str),
        T.StructField("scryfall_set_uri", _str),
        T.StructField("rulings_uri", _str),
        T.StructField("prints_search_uri", _str),
        T.StructField("collector_number", _str),
        T.StructField("digital", _bool),
        T.StructField("rarity", _str),
        T.StructField("watermark", _str),
        T.StructField("flavor_text", _str),
        T.StructField("card_back_id", _str),
        T.StructField("artist", _str),
        T.StructField("artist_ids", _str_arr),
        T.StructField("illustration_id", _str),
        T.StructField("border_color", _str),
        T.StructField("frame", _str),
        T.StructField("frame_effects", _str_arr),
        T.StructField("security_stamp", _str),
        T.StructField("full_art", _bool),
        T.StructField("textless", _bool),
        T.StructField("booster", _bool),
        T.StructField("story_spotlight", _bool),
        T.StructField("edhrec_rank", _int),
        T.StructField("preview", PREVIEW_SCHEMA),
        T.StructField("prices", _str_map),
        T.StructField("related_uris", _str_map),
        T.StructField("purchase_uris", _str_map),
        T.StructField("card_faces", T.ArrayType(CARD_FACE_SCHEMA)),
        # extension beyond the reference's 68 importer columns — see
        # ALL_PART_SCHEMA note
        T.StructField("all_parts", T.ArrayType(ALL_PART_SCHEMA)),
    ]
)

#: Raw-ingest schema: like CARDS_SCHEMA but with the fields the bulk JSON
#: delivers as strings/numbers before coercion — released_at arrives as an
#: ISO string (parsed with invalid→NULL, import_cards.py:150-157).
CARDS_RAW_SCHEMA = T.StructType(
    [
        T.StructField(f.name, _str if f.name == "released_at" else f.dataType)
        for f in CARDS_SCHEMA.fields
    ]
)

#: 14 columns, ordered exactly as init.sql:110-123.
SETS_SCHEMA = T.StructType(
    [
        T.StructField("id", _str, nullable=False),
        T.StructField("code", _str),
        T.StructField("name", _str),
        T.StructField("uri", _str),
        T.StructField("scryfall_uri", _str),
        T.StructField("search_uri", _str),
        T.StructField("released_at", _date),
        T.StructField("set_type", _str),
        T.StructField("card_count", _int),
        T.StructField("parent_set_code", _str),
        T.StructField("digital", _bool),
        T.StructField("nonfoil_only", _bool),
        T.StructField("foil_only", _bool),
        T.StructField("icon_svg_uri", _str),
    ]
)

SETS_RAW_SCHEMA = T.StructType(
    [
        T.StructField(f.name, _str if f.name == "released_at" else f.dataType)
        for f in SETS_SCHEMA.fields
    ]
)

CARD_COLUMNS: tuple[str, ...] = tuple(f.name for f in CARDS_SCHEMA.fields)
SET_COLUMNS: tuple[str, ...] = tuple(f.name for f in SETS_SCHEMA.fields)
