"""CardQuery operator tests (SURVEY §2.5 Q1-Q11): each access path is
checked against a plain-Python oracle computed over the same fixture
dicts — an engine-independent statement of the semantics."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.functions.text import ENGLISH_STOPWORDS
from mtg_bulk_database_spark.ingest.transform import prepare_cards, prepare_sets
from mtg_bulk_database_spark.operators.query import CardQuery
from mtg_bulk_database_spark.schemas import SETS_RAW_SCHEMA
from mtg_bulk_database_spark.sources.scryfall import read_cards_json

from .fixtures import make_cards, make_sets, write_raw_json

N = 400


@pytest.fixture(scope="module")
def fixture_cards():
    return [c for c in make_cards(n=N) if c["id"] is not None]


@pytest.fixture(scope="module")
def q(spark, tmp_path_factory, fixture_cards):
    path = tmp_path_factory.mktemp("cq") / "cards.json"
    write_raw_json(make_cards(n=N), str(path))
    cards = prepare_cards(read_cards_json(spark, str(path))).cache()
    sets = prepare_sets(spark.createDataFrame(make_sets(), SETS_RAW_SCHEMA)).cache()
    return CardQuery(cards, sets)


def _tokens(c):
    doc = f"{c['name'] or ''} {c['oracle_text'] or ''}"
    return {
        t.lower()
        for t in re.split(r"[^a-zA-Z0-9]+", doc)
        if t and t.lower() not in ENGLISH_STOPWORDS
    }


def test_q1_point_lookup(q, fixture_cards):
    target = fixture_cards[3]
    rows = q.by_id(target["id"]).collect()
    assert len(rows) == 1 and rows[0]["name"] == target["name"]


def test_q2_oracle_id(q, fixture_cards):
    oid = fixture_cards[5]["oracle_id"]
    expect = sum(1 for c in fixture_cards if c["oracle_id"] == oid)
    assert q.by_oracle_id(oid).count() == expect


def test_q3_keyword_containment(q, fixture_cards):
    expect = sum(1 for c in fixture_cards if c["keywords"] and "Flying" in c["keywords"])
    assert q.by_keyword("Flying").count() == expect
    two = q.by_keywords_all(["Flying", "Trample"])
    expect2 = sum(
        1
        for c in fixture_cards
        if c["keywords"] and {"Flying", "Trample"} <= set(c["keywords"])
    )
    assert two.count() == expect2


def test_q4_color_identity_within(q, fixture_cards):
    got = q.color_identity_within(["W", "U"]).count()
    expect = sum(
        1
        for c in fixture_cards
        if c["color_identity"] is not None and set(c["color_identity"]) <= {"W", "U"}
    )
    assert got == expect


def test_q5_q6_substring(q, fixture_cards):
    got = q.name_contains("BOLT").count()  # case-insensitive, ILIKE parity
    expect = sum(1 for c in fixture_cards if "bolt" in (c["name"] or "").lower())
    assert got == expect
    got2 = q.oracle_text_contains("draw").count()
    expect2 = sum(1 for c in fixture_cards if "draw" in (c["oracle_text"] or "").lower())
    assert got2 == expect2


def test_q7_cmc_range(q, fixture_cards):
    assert q.cmc_at_most(2).count() == sum(1 for c in fixture_cards if c["cmc"] <= 2)
    assert q.cmc_between(0.5, 3).count() == sum(
        1 for c in fixture_cards if 0.5 <= c["cmc"] <= 3
    )


def test_q8_fulltext(q, fixture_cards):
    got_all = q.fulltext_all(["deal", "damage"]).count()
    expect_all = sum(1 for c in fixture_cards if {"deal", "damage"} <= _tokens(c))
    assert got_all == expect_all
    got_any = q.fulltext_any(["exile", "counter"]).count()
    expect_any = sum(1 for c in fixture_cards if {"exile", "counter"} & _tokens(c))
    assert got_any == expect_any
    # stopwords never match: "the" occurs in texts but is filtered
    assert q.fulltext_any(["the"]).count() == 0


def test_q9_layout(q, fixture_cards):
    got = q.by_layout("split").count()
    assert got == sum(1 for c in fixture_cards if c["layout"] == "split")


def test_q10_set_join(q, fixture_cards):
    joined = q.with_set_info()
    assert joined.count() == len(fixture_cards)  # left join keeps all
    row = joined.filter(F.col("set") == "s01").select("set_full_name").first()
    assert row["set_full_name"] == "Set 1"
    # broadcast hint survives to the plan
    assert "Broadcast" in joined._jdf.queryExecution().executedPlan().toString()


def test_q11_latest_printing_dedup(q, fixture_cards):
    latest = q.latest_printing_per_oracle()
    n_logical = len({c["oracle_id"] for c in fixture_cards})
    assert latest.count() == n_logical
    assert latest.select("oracle_id").distinct().count() == n_logical


def test_printings_count(q, fixture_cards):
    pc = {r["oracle_id"]: r["n_printings"] for r in q.printings_count().collect()}
    from collections import Counter

    expect = Counter(c["oracle_id"] for c in fixture_cards)
    assert pc == dict(expect)


def test_price_extraction(q, fixture_cards):
    priced = q.priced_in("usd")
    got = {
        r["id"]: r["price_usd"]
        for r in priced.select("id", "price_usd").collect()
    }
    for c in fixture_cards[:50]:
        raw = (c["prices"] or {}).get("usd")
        assert got[c["id"]] == (float(raw) if raw is not None else None)


def test_fulltext_include_faces_extension(q, fixture_cards):
    # face oracle_texts say "deal damage" / "draw a card"; top-level FTS
    # must not see them, the include_faces extension must
    base = q.fulltext_all(["fire", "deals"]).count()
    multiface = [c for c in fixture_cards if c["card_faces"]]
    with_faces = q.fulltext_all(["face", "damage"], include_faces=True)
    assert with_faces.count() == len(multiface)
    without = q.fulltext_all(["face", "damage"], include_faces=False)
    assert without.count() == 0
