"""Deterministic cards/sets fixtures per FIXTURES.md — every edge case
row the transform layer must handle (seeded, no I/O)."""

from __future__ import annotations

import json
import random

LAYOUT_POOL = [
    "normal",
    "split",
    "flip",
    "transform",
    "modal_dfc",
    "adventure",
    "token",
]
COLORS = ["W", "U", "B", "R", "G"]
KEYWORD_POOL = ["Flying", "Trample", "Haste", "Lifelink", "Deathtouch", "Vigilance"]
RARITIES = ["common", "uncommon", "rare", "mythic"]
WORDS = [
    "bolt",
    "deal",
    "damage",
    "target",
    "creature",
    "player",
    "draw",
    "card",
    "destroy",
    "exile",
    "counter",
    "spell",
    "flying",
    "until",
    "end",
    "turn",
    "the",
    "a",
    "of",
    "to",
]


def _uuid(rng: random.Random) -> str:
    return "%08x-%04x-%04x-%04x-%012x" % (
        rng.getrandbits(32),
        rng.getrandbits(16),
        rng.getrandbits(16),
        rng.getrandbits(16),
        rng.getrandbits(48),
    )


def make_sets(n: int = 25, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    sets = []
    for i in range(n):
        code = f"s{i:02d}"
        sets.append(
            {
                "id": _uuid(rng),
                "code": code,
                "name": f"Set {i}",
                "uri": f"https://api.example/sets/{code}",
                "scryfall_uri": f"https://example/sets/{code}",
                "search_uri": f"https://api.example/cards/search?set={code}",
                "released_at": f"20{10 + i % 15}-0{1 + i % 9}-1{i % 9}",
                "set_type": ["core", "expansion", "masters", "token"][i % 4],
                "card_count": 100 + i,
                "parent_set_code": f"s{i - 1:02d}" if i % 7 == 0 and i > 0 else None,
                "digital": i % 5 == 0,
                "nonfoil_only": i % 3 == 0,
                "foil_only": i % 11 == 0,
                "icon_svg_uri": f"https://example/icons/{code}.svg",
            }
        )
    return sets


def make_cards(
    n: int = 1000, seed: int = 42, sets: list[dict] | None = None
) -> list[dict]:
    """~n cards over ~0.7n oracle_ids and the first 20 sets (2 orphan
    sets left cardless for the left-join NULL side)."""
    rng = random.Random(seed)
    sets = sets or make_sets()
    usable_sets = sets[:20]
    oracle_ids = [_uuid(rng) for _ in range(int(n * 0.7))]
    cards: list[dict] = []
    for i in range(n):
        s = usable_sets[i % len(usable_sets)]
        layout = LAYOUT_POOL[i % len(LAYOUT_POOL)] if i % 97 != 0 else "bogus_layout"
        multiface = layout in ("split", "flip", "transform", "modal_dfc", "adventure")
        has_top_image = (not multiface) or (i % 3 == 0)
        n_kw = rng.randint(0, 3)
        keywords = (
            sorted(rng.sample(KEYWORD_POOL, n_kw)) if i % 11 != 0 else None
        )
        if keywords is not None and i % 10 == 0:
            keywords = ["Flying"] + [k for k in keywords if k != "Flying"]
        colors = sorted(rng.sample(COLORS, rng.randint(0, 3))) or (
            [] if i % 4 else None
        )
        text_words = rng.sample(WORDS, rng.randint(4, 10))
        oracle_text = " ".join(text_words) if i % 13 != 0 else None
        released = (
            f"20{rng.randint(0, 24):02d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
            if i % 17 != 0
            else ("not-a-date" if i % 2 else None)
        )
        faces = (
            [
                {
                    "name": f"Face A {i}",
                    "mana_cost": "{1}{R}",
                    "type_line": "Instant",
                    "oracle_text": "deal damage",
                    "power": None,
                    "toughness": None,
                    "colors": ["R"],
                    "image_uris": {"normal": f"https://img/{i}/a.jpg"},
                },
                {
                    "name": f"Face B {i}",
                    "mana_cost": "{1}{U}",
                    "type_line": "Sorcery",
                    "oracle_text": "draw a card",
                    "power": None,
                    "toughness": None,
                    "colors": ["U"],
                    "image_uris": {"normal": f"https://img/{i}/b.jpg"},
                },
            ]
            if multiface
            else None
        )
        cards.append(
            {
                "id": _uuid(rng) if i % 101 != 0 else None,  # F1 rows
                "oracle_id": oracle_ids[i % len(oracle_ids)],
                "object": "card",
                "multiverse_ids": [i, i + 100000] if i % 2 else [],
                "mtgo_id": i if i % 3 else None,
                "tcgplayer_id": i * 2,
                "cardmarket_id": i * 3,
                "name": f"{'Lightning ' if i % 9 == 0 else ''}Card {i} "
                f"{'Bolt' if i % 6 == 0 else 'Wisp'}",
                "lang": "en",
                "released_at": released,
                "uri": f"https://api.example/cards/{i}",
                "scryfall_uri": f"https://example/cards/{i}",
                "layout": layout,
                "highres_image": i % 2 == 0,
                "image_status": "highres_scan",
                "image_uris": {"normal": f"https://img/{i}.jpg"}
                if has_top_image
                else None,
                "mana_cost": "{%d}{%s}" % (i % 5, rng.choice(COLORS)),
                "cmc": [0.0, 0.5, 2.0, 3.0, 16.0][i % 5],
                "type_line": "Creature — Test" if i % 2 else "Instant",
                "oracle_text": oracle_text,
                "power": ["1", "2", "*", "1+*", None][i % 5],
                "toughness": ["1", "3", "*", "2", None][i % 5],
                "colors": colors,
                "color_identity": colors if colors else [],
                "keywords": keywords,
                "legalities": {
                    "modern": "legal" if i % 2 else "not_legal",
                    "legacy": "legal",
                },
                "games": ["paper", "mtgo"],
                "reserved": False,
                "game_changer": i % 50 == 0,
                "foil": i % 2 == 0,
                "nonfoil": True,
                "finishes": ["nonfoil", "foil"] if i % 2 else ["nonfoil"],
                "oversized": False,
                "promo": i % 25 == 0,
                "reprint": i % 3 == 0,
                "variation": False,
                "set_id": s["id"],
                "set": s["code"],
                "set_name": s["name"],
                "set_type": s["set_type"],
                "set_uri": s["uri"],
                "set_search_uri": s["search_uri"],
                "scryfall_set_uri": s["scryfall_uri"],
                "rulings_uri": f"https://api.example/cards/{i}/rulings",
                "prints_search_uri": "https://api.example/cards/search",
                "collector_number": str(i % 300 + 1),
                "digital": False,
                "rarity": RARITIES[i % 4],
                "watermark": None,
                "flavor_text": None,
                "card_back_id": _uuid(rng),
                "artist": f"Artist {i % 40}",
                "artist_ids": [_uuid(rng)],
                "illustration_id": _uuid(rng),
                "border_color": "black",
                "frame": "2015",
                "frame_effects": ["legendary"] if i % 20 == 0 else None,
                "security_stamp": "oval" if i % 2 else None,
                "full_art": False,
                "textless": False,
                "booster": True,
                "story_spotlight": False,
                "edhrec_rank": i * 7 % 20000 if i % 4 else None,
                "preview": {
                    "source": "preview-site",
                    "source_uri": "https://example/preview",
                    "previewed_at": "2024-01-01",
                }
                if i % 15 == 0
                else None,
                "prices": {"usd": f"{(i % 500) / 100:.2f}", "eur": None}
                if i % 2
                else {"usd": None},
                "related_uris": {"edhrec": f"https://edhrec/{i}"},
                "purchase_uris": {"tcgplayer": f"https://tcg/{i}"},
                "card_faces": faces,
                # all_parts extension: every 10th card is part of a
                # meld/token relation (SURVEY §0 known discrepancy)
                "all_parts": [
                    {
                        "id": _uuid(rng),
                        "object": "related_card",
                        "component": "meld_part" if i % 20 == 0 else "token",
                        "name": f"Related {i}",
                        "type_line": "Token Creature — Test",
                        "uri": f"https://api.example/cards/related/{i}",
                    }
                ]
                if i % 10 == 0
                else None,
            }
        )
    return cards


def write_raw_json(cards: list[dict], path: str, extra_unknown_keys: bool = True) -> None:
    """The Scryfall-bulk-shaped raw file: one top-level JSON array, with
    unknown keys that projection must drop (FIXTURES.md §3)."""
    out = []
    for i, c in enumerate(cards):
        obj = dict(c)
        if extra_unknown_keys and i % 2 == 0:
            obj["unknown_field"] = {"nested": True}
            obj["another_extra"] = [1.25, 2.5]
        out.append(obj)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f)
