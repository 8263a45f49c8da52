"""Registry entries, round 2: warehouse change-tracking shapes (latest
row per key, SCD2 intervals), and the curation operators a training-data
run adds around the core dedup family — chunking, decontamination, PII
scrubbing, deterministic stratified sampling, winnowing fingerprints,
embedding quantization, and distribution-tail filters.

Every deterministic operator carries an exact DuckDB twin; the one
sketch-based entry (approx quantiles) registers rows-only with its
error bound pinned in tests (the q72 HLL++ pattern).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.text import sql_tokens
from .operators import dedup, sampling, similarity, text_analysis
from .operators.text_analysis import PII_PATTERNS
from .registry import query

_TOKS = sql_tokens("text")


# ---------------------------------------------------------------------------
# change-tracking shapes: latest-row-per-key and SCD2 validity intervals
# ---------------------------------------------------------------------------
@query(
    "q78_latest_by_key",
    """WITH r AS (
         SELECT user_id, event_id, ts, event_type, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events)
       SELECT user_id, event_id AS last_event_id, ts AS last_ts,
              event_type AS last_type, value AS last_value
       FROM r WHERE rn = 1""",
)
def q78(spark, sf_dir):
    """Current-state view of an event stream: one row per key, the
    latest by (ts, id) — the QUALIFY/dedup-by-rank pattern every
    warehouse mirrors a CDC feed with. One hash shuffle on the key;
    row_number (not max+join) makes it a single window pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "q79_scd2_intervals",
    """SELECT user_id, event_id, value,
              ts AS valid_from,
              lead(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS valid_to,
              (lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) IS NULL) AS is_current
       FROM events""",
)
def q79(spark, sf_dir):
    """SCD Type-2 dimension build: each change row gets a validity
    interval [valid_from, valid_to) via lead(), open-ended for the
    current row — history tables from an append-only change feed in one
    window pass (same single shuffle as q78; both stay sorted within
    the key partition, so an as-of probe on the output is a range
    lookup, not a scan)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# training-sample preparation: context-window chunking
# ---------------------------------------------------------------------------
@query(
    "q80_doc_chunks",
    f"""WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
        st AS (SELECT doc_id, t, unnest(range(0, len(t), 12)) AS s FROM nz)
        SELECT doc_id, s // 12 AS chunk_idx,
               array_to_string(list_slice(t, s + 1, s + 16), ' ') AS chunk_text,
               len(list_slice(t, s + 1, s + 16)) AS n_chunk_tokens
        FROM st""",
)
def q80(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return text_analysis.chunk_documents(
        docs, chunk_tokens=16, overlap=4
    ).withColumn("chunk_idx", F.col("chunk_idx").cast("long"))


# ---------------------------------------------------------------------------
# decontamination: n-gram overlap against a benchmark set
# ---------------------------------------------------------------------------
@query(
    "q81_decontaminate",
    f"""WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT doc_id,
                      list_distinct(list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
               FROM toks WHERE len(t) >= 3),
        tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh
               WHERE doc_id % 41 <> 0),
        be AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
               WHERE doc_id % 41 = 0)
        SELECT tr.doc_id, count(*) AS n_overlapping_ngrams
        FROM tr JOIN be USING (s)
        GROUP BY tr.doc_id""",
)
def q81(spark, sf_dir):
    """Benchmark leakage check: docs sharing ≥1 distinct n-gram with the
    held-out set (docs with id ≡ 0 mod 41 stand in for the eval corpus;
    trigrams here — real decontamination uses 8-13-grams, but the
    synthetic corpus shares no n-gram that long except exact dups).
    The benchmark n-gram set is broadcast — corpus rows never shuffle."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    train = docs.filter(F.col("doc_id") % 41 != 0)
    return dedup.benchmark_ngram_overlap(
        train, bench, "text", "doc_id", n=3, min_hits=1
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------
def _pii_oracle() -> str:
    (e_name, e_pat, e_repl), (i_name, i_pat, i_repl), (p_name, p_pat, p_repl) = (
        PII_PATTERNS
    )
    return f"""
        WITH s1 AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '{e_pat}')) AS n_{e_name},
                 regexp_replace(text, '{e_pat}', '{e_repl}', 'g') AS t1
          FROM documents),
        s2 AS (
          SELECT doc_id, n_{e_name},
                 len(regexp_extract_all(t1, '{i_pat}')) AS n_{i_name},
                 regexp_replace(t1, '{i_pat}', '{i_repl}', 'g') AS t2
          FROM s1)
        SELECT doc_id, n_{e_name}, n_{i_name},
               len(regexp_extract_all(t2, '{p_pat}')) AS n_{p_name},
               regexp_replace(t2, '{p_pat}', '{p_repl}', 'g') AS redacted_text
        FROM s2"""


@query("q82_pii_redaction", _pii_oracle())
def q82(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return text_analysis.with_pii_redacted(docs).select(
        "doc_id", "n_email", "n_ip", "n_phone", "redacted_text"
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling (corpus mixing)
# ---------------------------------------------------------------------------
_MIX = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.25, "zh": 0.1}


@query(
    "q83_stratified_sample",
    f"""SELECT doc_id, lang FROM documents
        WHERE {sampling.sql_sample_predicate('lang', _MIX, 'doc_id')}""",
)
def q83(spark, sf_dir):
    """Corpus mixing by content hash: keep all English, half German,
    a quarter Romance, a tenth Chinese — reproducible on any engine or
    partitioning (no RNG), as a codegen'd filter with zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_hash_sample(docs, "lang", _MIX, "doc_id").select(
        "doc_id", "lang"
    )


# ---------------------------------------------------------------------------
# winnowing (rolling-hash) fingerprints
# ---------------------------------------------------------------------------
@query(
    "q84_winnow_fingerprints",
    """WITH b AS (
         SELECT doc_id,
                lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS base
         FROM documents),
       h AS (
         SELECT doc_id,
                CASE WHEN len(base) - 4 >= 1
                     THEN list_transform(range(1, len(base) - 3),
                            i -> substr(md5(substr(base, i, 5)), 1, 8))
                     ELSE []::VARCHAR[] END AS hs
         FROM b)
       SELECT doc_id,
              coalesce(array_to_string(
                CASE WHEN len(hs) = 0 THEN []::VARCHAR[]
                     WHEN len(hs) < 4 THEN [list_min(hs)]
                     ELSE list_sort(list_distinct(
                            list_transform(range(1, len(hs) - 2),
                              j -> list_min(list_slice(hs, j, j + 3)))))
                END, ' '), '') AS winnow_fps
       FROM h""",
)
def q84(spark, sf_dir):
    # Registered output is the space-joined fingerprint string, not the
    # array: the driver's canonicalizer sorts result cells with pandas,
    # which cannot hash list cells (r2 `err` row). The operator itself
    # still returns the typed array (tests/test_curation2.py). Both
    # sides coalesce to '' — DuckDB's array_to_string maps an EMPTY
    # list to NULL where Spark's array_join yields ''.
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return text_analysis.with_winnow_fingerprints(docs, k=5, window=4).select(
        "doc_id",
        F.coalesce(F.array_join("winnow_fps", " "), F.lit("")).alias(
            "winnow_fps"
        ),
    )


# ---------------------------------------------------------------------------
# embedding scalar quantization
# ---------------------------------------------------------------------------
@query(
    "q85_quantize_embeddings",
    """WITH v AS (
         SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vd
         FROM embeddings),
       s AS (
         SELECT vec_id, vd,
                CASE WHEN list_max(list_transform(vd, x -> abs(x))) > 0
                     THEN 127.0 / list_max(list_transform(vd, x -> abs(x)))
                     ELSE 1.0 END AS q_scale
         FROM v)
       SELECT vec_id,
              coalesce(array_to_string(
                list_transform(vd, x -> floor(x * q_scale + 0.5)::INT),
                ' '), '') AS q_embedding,
              q_scale
       FROM s""",
)
def q85(spark, sf_dir):
    # Same scalar-shape rule as q84: ints join identically in Spark and
    # DuckDB ("-5", "127"), so the value hash is unchanged by the cast.
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.with_quantized_embedding(emb).select(
        "vec_id",
        F.coalesce(
            F.array_join(
                F.transform("q_embedding", lambda x: x.cast("string")), " "
            ),
            F.lit(""),
        ).alias("q_embedding"),
        "q_scale",
    )


# ---------------------------------------------------------------------------
# distribution-tail filter (exact) + approx-quantile sketch (scale path)
# ---------------------------------------------------------------------------
@query(
    "q86_length_outlier_filter",
    """WITH b AS (
         SELECT quantile_cont(n_chars, 0.05) AS p05,
                quantile_cont(n_chars, 0.95) AS p95
         FROM documents)
       SELECT doc_id, n_chars FROM documents, b
       WHERE n_chars BETWEEN p05 AND p95""",
)
def q86(spark, sf_dir):
    """Winsorizing gate: drop documents outside the [p05, p95] length
    band. The two exact percentiles are one tiny aggregate broadcast
    back over the scan (crossJoin of a 1-row frame) — at 100 TB swap in
    approx_percentile (q87's sketch) for a single-pass bound."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.expr("percentile(n_chars, 0.05)").alias("p05"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .filter(F.col("n_chars").between(F.col("p05"), F.col("p95")))
        .select("doc_id", "n_chars")
    )


@query("q87_approx_quantiles")  # t-digest-style sketch → rows-only;
# tests pin the rank error against the exact percentiles
def q87(spark, sf_dir):
    # Unpacked to scalar columns (not one array cell) so that if driver
    # rotation ever oracles this entry it never hits the pandas
    # list-canonicalization failure that bit q84/q85 in round 2.
    docs = load_table(spark, sf_dir, "documents")
    q = F.percentile_approx("n_chars", [0.05, 0.5, 0.95], 10_000)
    return docs.agg(q.alias("q")).select(
        F.col("q")[0].alias("approx_p05"),
        F.col("q")[1].alias("approx_p50"),
        F.col("q")[2].alias("approx_p95"),
    )


# ---------------------------------------------------------------------------
# keyless range join: clicks from ANY user in the hour before a purchase
# (no equi-key ⇒ Spark would nested-loop it; the binned operator makes
# it an equi-join on time bins — see operators/rangejoin.py)
# ---------------------------------------------------------------------------
@query(
    "q88_global_interval_join",
    """WITH c AS (
         SELECT event_id AS click_id, ts AS click_ts
         FROM events WHERE event_type = 'click'),
       p AS (
         SELECT event_id AS purchase_id,
                ts - INTERVAL 60 MINUTE AS start_ts, ts AS end_ts
         FROM events WHERE event_type = 'purchase')
       SELECT p.purchase_id, count(c.click_id) AS n_any_clicks_1h
       FROM p LEFT JOIN c
         ON c.click_ts >= p.start_ts AND c.click_ts < p.end_ts
       GROUP BY p.purchase_id""",
)
def q88(spark, sf_dir):
    from .operators.rangejoin import binned_range_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 60 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    pairs = binned_range_join(
        clicks, purchases, "click_ts", "start_ts", "end_ts", bin_width=3600
    )
    counts = pairs.groupBy("purchase_id").agg(
        F.count("*").alias("n_any_clicks_1h")
    )
    # LEFT semantics compose on top of the inner binned join: purchases
    # with no click in the window come back at 0
    return purchases.select("purchase_id").join(
        counts, on="purchase_id", how="left"
    ).select(
        "purchase_id", F.coalesce("n_any_clicks_1h", F.lit(0)).alias("n_any_clicks_1h")
    )
