"""Fuzz-data generator: schema-compatible randomized versions of the
driver's testdata tables (including the nano-timestamp events quirk),
used to differential-test every oracle pair on data the fixed corpus
never exercises — boundary gaps, ties, NULL patterns, different dup
structure."""

from __future__ import annotations

import os
import random

import numpy as np
import pandas as pd

WORDS = (
    "the a spark join filter window row data slow small customer line batch "
    "value merge table agg sort part column key big fast vector hash query "
    "stream scan order dup group"
).split()

#: Locale/portability trap palette (r5): tokens whose CASE MAPPING or
#: CHARACTER CLASS membership differs between the JVM, ICU/DuckDB and
#: Python — the exact inputs where lower-then-split, ``\s``, and
#: Unicode-aware folds fork between engines. Injected into a fraction
#: of fuzz documents so EVERY oracled text query is differential-tested
#: on them, not just the curated pin palettes in test_pipeline_ops.
TRAP_TOKENS = (
    "İstanbul", "ıssız", "DİYARBAKIR",        # Turkish dotted/dotless I
    "straße", "STRASSE", "ẞARP",              # ß / capital sharp S
    "ΣΊΣΥΦΟΣ", "σίσυφος",                     # Greek final sigma
    "KELVİN", "\u212a",                        # Kelvin sign U+212A
    "NOËL", "naïve", "ﬁle", "ǅungla",          # latin-1, ligature, digraph
    "ＦＵＬＬ１２３", "e\u0301tude",       # fullwidth forms, combining acute
    "→x", "🙂ok", "#tag", "3.14",              # symbols through BPE-ish
)
#: Separators spanning the ASCII-whitespace class boundary (VT is the
#: Java-vs-RE2 ``\s`` fork) plus non-whitespace glue.
TRAP_SEPS = (
    " ", " ", " ", "\t", "\n", "\x0b", "\x0c", "\r\n",
    "\xa0", "　", "-", "_", "--", ". ",
)


def make_fuzz_dir(out_dir: str, seed: int, scale: int = 1) -> str:
    rng = random.Random(seed)
    nprng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, df: pd.DataFrame) -> None:
        # the driver corpus stores micro timestamps everywhere EXCEPT
        # events (nanos) — mirror that exactly, incl. the nanos quirk
        for col in df.columns:
            if str(df[col].dtype).startswith("datetime64") and name != "events":
                df[col] = df[col].astype("datetime64[us]")
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)

    n_nation, n_cust, n_supp, n_part = 25, 120 * scale, 12, 150 * scale
    n_orders, n_li = 900 * scale, 3600 * scale
    n_events, n_docs, n_emb = 800 * scale, 300, 400

    write(
        "region",
        pd.DataFrame(
            {"r_regionkey": np.arange(5, dtype="int32"),
             "r_name": [f"REGION_{i}" for i in range(5)]}
        ),
    )
    write(
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.arange(n_nation, dtype="int32"),
                "n_name": [f"NATION_{i}" for i in range(n_nation)],
                "n_regionkey": nprng.randint(0, 5, n_nation).astype("int32"),
            }
        ),
    )
    write(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.arange(n_cust, dtype="int64"),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": nprng.randint(0, n_nation, n_cust).astype("int32"),
                "c_acctbal": np.round(nprng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": nprng.choice(
                    ["AUTOMOBILE", "BUILDING", "MACHINERY"], n_cust
                ),
            }
        ),
    )
    write(
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": np.arange(n_supp, dtype="int64"),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": nprng.randint(0, n_nation, n_supp).astype("int32"),
                "s_acctbal": np.round(nprng.uniform(0, 9999, n_supp), 2),
            }
        ),
    )
    write(
        "part",
        pd.DataFrame(
            {
                "p_partkey": np.arange(n_part, dtype="int64"),
                "p_name": [
                    " ".join(rng.sample(WORDS, 3)) for _ in range(n_part)
                ],
                "p_brand": nprng.choice([f"Brand#{i}" for i in range(1, 6)], n_part),
                "p_type": nprng.choice(["STANDARD", "SMALL", "LARGE"], n_part),
                "p_size": nprng.randint(1, 50, n_part).astype("int32"),
                "p_retailprice": np.round(nprng.uniform(900, 2000, n_part), 2),
            }
        ),
    )
    order_dates = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        nprng.randint(0, 2400, n_orders), unit="D"
    )
    write(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.arange(n_orders, dtype="int64"),
                "o_custkey": nprng.randint(0, n_cust, n_orders).astype("int64"),
                "o_orderstatus": nprng.choice(["O", "F", "P"], n_orders),
                "o_totalprice": np.round(nprng.uniform(900, 500000, n_orders), 2),
                "o_orderdate": order_dates,
                "o_orderpriority": nprng.choice(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW"], n_orders
                ),
            }
        ),
    )
    ship_dates = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        nprng.randint(0, 2500, n_li), unit="D"
    )
    write(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": nprng.randint(0, n_orders, n_li).astype("int64"),
                "l_partkey": nprng.randint(0, n_part, n_li).astype("int64"),
                "l_suppkey": nprng.randint(0, n_supp, n_li).astype("int64"),
                "l_linenumber": (np.arange(n_li) % 7 + 1).astype("int32"),
                "l_quantity": nprng.randint(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(nprng.uniform(900, 100000, n_li), 2),
                "l_discount": np.round(nprng.uniform(0, 0.1, n_li), 2),
                "l_tax": np.round(nprng.uniform(0, 0.08, n_li), 2),
                "l_returnflag": nprng.choice(["A", "N", "R"], n_li),
                "l_linestatus": nprng.choice(["O", "F"], n_li),
                "l_shipdate": ship_dates,
            }
        ),
    )
    # events with NANOSECOND timestamps and gaps straddling the 1800s
    # session boundary (including sub-second fractions around it)
    base = pd.Timestamp("2024-03-01").value
    gaps_s = nprng.choice(
        [30.0, 300.0, 1799.5, 1800.0, 1800.2, 1801.0, 4000.0],
        n_events,
        p=[0.35, 0.3, 0.08, 0.07, 0.07, 0.07, 0.06],
    ) + nprng.uniform(-0.4, 0.4, n_events)
    user_ids = nprng.randint(0, 40, n_events).astype("int64")
    ts_ns = np.zeros(n_events, dtype="int64")
    cursor: dict[int, int] = {}
    for i, (u, g) in enumerate(zip(user_ids, gaps_s)):
        prev = cursor.get(int(u), base)
        nxt = prev + int(abs(g) * 1e9) + int(nprng.randint(0, 1000))
        ts_ns[i] = nxt
        cursor[int(u)] = nxt
    write(
        "events",
        pd.DataFrame(
            {
                "event_id": np.arange(n_events, dtype="int64"),
                "ts": pd.to_datetime(ts_ns),
                "user_id": user_ids,
                # ~1.5% NULL event_type / value: instrumentation gaps
                # in real clickstreams; filter/agg twins must agree on
                # NULL-drop semantics
                "event_type": [
                    None if rng.random() < 0.015
                    else rng.choice(
                        ["click", "view", "purchase", "error", "signup"]
                    )
                    for _ in range(n_events)
                ],
                "value": [
                    None if rng.random() < 0.015
                    else round(rng.uniform(0, 100), 3)
                    for _ in range(n_events)
                ],
                # ~3% dirty props: malformed / empty / NULL JSON —
                # the engine's contract is get_json_object-style NULL
                # tolerance, and the oracles must express the same
                "props": [
                    rng.choice(["not json", "", None, '{"k":'])
                    if rng.random() < 0.03
                    else f'{{"k": {rng.randint(0, 100)}}}'
                    for _ in range(n_events)
                ],
            }
        ),
    )
    # documents: word salad + engineered near-dups (shuffled/perturbed
    # copies) + exact dups + an empty-ish doc + locale-trap docs
    texts = []
    for i in range(n_docs):
        n_words = rng.randint(3, 120)
        if rng.random() < 0.25:
            # adversarial doc: trap tokens glued by boundary separators
            toks = [
                rng.choice(TRAP_TOKENS if rng.random() < 0.4 else WORDS)
                for _ in range(n_words)
            ]
            parts = [toks[0]]
            for t in toks[1:]:
                parts.append(rng.choice(TRAP_SEPS))
                parts.append(t)
            texts.append("".join(parts))
        else:
            texts.append(" ".join(rng.choice(WORDS) for _ in range(n_words)))
    for i in range(0, 30, 3):  # near-dups: drop one word from a copy
        words = texts[i].split()
        if len(words) > 5:
            drop = rng.randrange(len(words))
            texts.append(" ".join(words[:drop] + words[drop + 1 :]))
    texts += [texts[0], texts[1]]  # exact dups
    texts.append("x")  # single-token doc (shingle edge)
    texts.append("")  # empty doc
    texts.append("\x0b\xa0　")  # whitespace-only (VT/NBSP/ideographic)
    texts.append("İ ı ẞ ΣΊΣΥΦΟΣ \u212a")  # trap-only doc (no ASCII-alnum at all)
    # one giant single token: no separator anywhere, so tokenizers see
    # ONE 50k-char token — chunkers, shinglers and quality scores must
    # not blow up or disagree on it
    texts.append("z" * 50_000)
    texts.append(None)  # NULL text: SQL-null propagation through every twin
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            # ~2% NULL lang/source: scraped corpora carry missing
            # metadata, and group-by/stratify twins must agree on the
            # NULL group across engines
            "lang": [
                None if rng.random() < 0.02
                else rng.choice(["en", "de", "fr", "es", "zh"])
                for _ in texts
            ],
            "source": [
                None if i % 97 == 96 else f"src{i % 12}"
                for i in range(len(texts))
            ],
            "n_chars": np.array(
                [len(t) if t is not None else 0 for t in texts], dtype="int64"
            ),
        }
    )
    write("documents", docs)
    emb = nprng.randn(n_emb, 64).astype("float32")
    # engineered similarity edges: an all-zero vector (norm 0 — cosine
    # must not divide by zero), an exact duplicate pair (cosine == 1.0
    # ties that rank/top-k twins must break identically), and a
    # near-duplicate (1e-3 nudge) that sits right at the top of top-k
    emb[1] = 0.0
    emb[3] = emb[2]
    emb[5] = emb[4]
    emb[5][0] += 1e-3
    write(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": np.arange(n_emb, dtype="int64"),
                # ~1.5% NULL embeddings (failed-embedder rows): the
                # similarity twins must agree they drop out of top-k
                "embedding": [
                    None
                    if (i >= 8 and rng.random() < 0.015)
                    else list(map(float, v))
                    for i, v in enumerate(emb.astype("float32"))
                ],
                "label": nprng.randint(0, 8, n_emb).astype("int32"),
            }
        ),
    )
    return out_dir
