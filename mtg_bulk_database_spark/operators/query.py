"""CardQuery — the typed query-operator library over the ``cards`` /
``sets`` tables: one method per declared access path in the reference
schema (SURVEY §2.5 Q1-Q11; each cites the index/DDL that declared it).

Where Postgres used a secondary index, the Spark plan gets the same
selectivity from columnar pruning + parquet min/max row-group skipping +
(at scale) clustering on the hot keys — all of it free from Catalyst as
long as predicates stay declarative, which every method here keeps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    ascii_fold,
    fts_match_all,
    fts_match_any,
    py_ascii_fold,
    ts_tokens,
)


class CardQuery:
    """Fluent, composable query surface. Every method returns a new
    DataFrame (or CardQuery via ``where_``-style chaining), so users
    compose with arbitrary DataFrame/SQL ops afterwards."""

    def __init__(self, cards: DataFrame, sets: DataFrame | None = None):
        self.cards = cards
        self.sets = sets

    # -- Q1: PK point lookup (PRIMARY KEY, init.sql:35) ------------------
    def by_id(self, card_id: str) -> DataFrame:
        return self.cards.filter(F.col("id") == card_id)

    # -- Q2: all printings of a logical card (idx_cards_oracle_id,
    #    init.sql:127) ---------------------------------------------------
    def by_oracle_id(self, oracle_id: str) -> DataFrame:
        return self.cards.filter(F.col("oracle_id") == oracle_id)

    # -- Q3: keywords containment (GIN idx_cards_keywords, init.sql:130;
    #    keywords @> '["Flying"]') ---------------------------------------
    def by_keyword(self, keyword: str) -> DataFrame:
        return self.cards.filter(F.array_contains("keywords", keyword))

    def by_keywords_all(self, keywords: Sequence[str]) -> DataFrame:
        arr = F.array(*[F.lit(k) for k in keywords])
        return self.cards.filter(
            F.size(F.array_intersect(F.col("keywords"), arr)) == len(set(keywords))
        )

    # -- Q4: colors containment (GIN idx_cards_colors, init.sql:131) -----
    def by_color(self, color: str) -> DataFrame:
        return self.cards.filter(F.array_contains("colors", color))

    def color_identity_within(self, colors: Sequence[str]) -> DataFrame:
        """Commander-style: identity ⊆ given colors (colorless included)."""
        arr = F.array(*[F.lit(c) for c in colors])
        return self.cards.filter(
            F.col("color_identity").isNotNull()
            & (F.size(F.array_except(F.col("color_identity"), arr)) == 0)
        )

    # -- Q5/Q6: ILIKE substring (trigram GIN, init.sql:137-138) ----------
    def name_contains(self, needle: str) -> DataFrame:
        # ascii_fold, not lower(): the ILIKE family's locale-free case
        # fold (functions/text.py) — identical across engines on ANY text
        return self.cards.filter(
            ascii_fold("name").contains(py_ascii_fold(needle))
        )

    def oracle_text_contains(self, needle: str) -> DataFrame:
        return self.cards.filter(
            ascii_fold("oracle_text").contains(py_ascii_fold(needle))
        )

    # -- Q7: cmc range (B-tree idx_cards_cmc, init.sql:141) --------------
    def cmc_between(self, lo: float, hi: float) -> DataFrame:
        return self.cards.filter(F.col("cmc").between(lo, hi))

    def cmc_at_most(self, hi: float) -> DataFrame:
        return self.cards.filter(F.col("cmc") <= hi)

    # -- Q8: full-text search (GIN tsvector, init.sql:144-146) -----------
    def _doc_tokens(self) -> F.Column:
        if "ts_tokens" in self.cards.columns:
            return F.col("ts_tokens")  # materialized at ingest
        doc = F.concat_ws(
            " ",
            F.coalesce(F.col("name"), F.lit("")),
            F.coalesce(F.col("oracle_text"), F.lit("")),
        )
        return ts_tokens(doc)

    def fulltext_all(
        self, terms: Sequence[str], include_faces: bool = False
    ) -> DataFrame:
        """AND full-text match. ``include_faces`` extends the document
        to per-face oracle_text — a documented EXTENSION: the reference
        tsvector (init.sql:144-146) covers only the top-level columns,
        leaving multiface card text unsearchable."""
        tok = self._face_tokens() if include_faces else self._doc_tokens()
        return self.cards.filter(fts_match_all(tok, terms))

    def fulltext_any(
        self, terms: Sequence[str], include_faces: bool = False
    ) -> DataFrame:
        tok = self._face_tokens() if include_faces else self._doc_tokens()
        return self.cards.filter(fts_match_any(tok, terms))

    def _face_tokens(self) -> F.Column:
        face_text = F.when(
            F.col("card_faces").isNotNull(),
            F.concat_ws(
                " ",
                F.transform(
                    "card_faces",
                    lambda f: F.concat_ws(
                        " ",
                        F.coalesce(f["name"], F.lit("")),
                        F.coalesce(f["oracle_text"], F.lit("")),
                    ),
                ),
            ),
        ).otherwise(F.lit(""))
        doc = F.concat_ws(
            " ",
            F.coalesce(F.col("name"), F.lit("")),
            F.coalesce(F.col("oracle_text"), F.lit("")),
            face_text,
        )
        return ts_tokens(doc)

    # -- Q9: layout/ENUM equality (init.sql:47; README.md:18) ------------
    def by_layout(self, layout: str) -> DataFrame:
        return self.cards.filter(F.col("layout") == layout)

    def by_rarity(self, rarity: str) -> DataFrame:
        return self.cards.filter(F.col("rarity") == rarity)

    # -- Q10: cards ⋈ sets enrichment (init.sql:71-72,110-111) -----------
    def with_set_info(self, how: str = "left") -> DataFrame:
        """Broadcast join — sets is ~10³ rows; the fact side never
        shuffles (SURVEY §2.5 Q10)."""
        if self.sets is None:
            raise ValueError("CardQuery built without a sets table")
        sets = self.sets.select(
            F.col("id").alias("_set_pk"),
            F.col("name").alias("set_full_name"),
            F.col("set_type").alias("set_category"),
            F.col("released_at").alias("set_released_at"),
            F.col("card_count").alias("set_card_count"),
        )
        return self.cards.join(
            F.broadcast(sets), self.cards.set_id == sets._set_pk, how
        ).drop("_set_pk")

    # -- Q11-adjacent: printing dedup/ranking per logical card -----------
    def latest_printing_per_oracle(self) -> DataFrame:
        """One row per logical card: the newest printing (window-rank
        dedup on oracle_id — the exact-dedup pattern, SURVEY §2.6)."""
        w = Window.partitionBy("oracle_id").orderBy(
            F.col("released_at").desc_nulls_last(), F.col("id")
        )
        return (
            self.cards.filter(F.col("oracle_id").isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def printings_count(self) -> DataFrame:
        return (
            self.cards.filter(F.col("oracle_id").isNotNull())
            .groupBy("oracle_id")
            .agg(
                F.count("*").alias("n_printings"),
                F.min("released_at").alias("first_released"),
                F.max("released_at").alias("last_released"),
            )
        )

    # -- convenience: price extraction from the prices map ---------------
    def priced_in(self, currency: str = "usd") -> DataFrame:
        """Prices are currency→decimal-string maps (init.sql:99); cast
        per-query as documented in SURVEY §1.3."""
        return self.cards.withColumn(
            f"price_{currency}",
            F.col("prices").getItem(currency).try_cast("double"),
        )
