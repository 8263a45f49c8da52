"""Custom function surface: pandas UDAF and Python UDTF examples
(SURVEY §2.6 "UDF/UDAF/UDTF: absent in reference" — engine policy is
built-ins first, so these exist as the documented escape hatch, each in
the fastest available flavor: Arrow-batched grouped aggregation, and
Spark 4's vectorized-exchange UDTF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_weighted_quality(docs_with_scores: DataFrame) -> DataFrame:
    """Grouped-agg pandas UDAF: token-count-weighted mean quality per
    source — the aggregation shape built-ins can't express when the
    weighting logic gets genuinely custom. Arrow moves each group as a
    pair of numpy arrays; no per-row Python."""

    @F.pandas_udf("double")
    def weighted_mean(scores: pd.Series, weights: pd.Series) -> float:
        # Order-independent accumulation: scores are 6-dp doubles (see
        # with_quality_score), so recovering exact integer micro-units and
        # summing in int64 makes the result identical no matter how Spark
        # partitions the group — which is what lets this UDAF carry a
        # DuckDB oracle (decimal-exact SUM(score*w)/SUM(w)).
        # SQL-aggregate NULL semantics: rows where either input is NULL
        # (e.g. NULL-text docs — n_tokens is NULL) drop out of BOTH
        # sums, exactly as DuckDB's SUM skips them in the oracle.
        ok = scores.notna() & weights.notna()
        w = weights[ok].astype("int64")
        total = int(w.sum())
        if total == 0:
            return 0.0
        micros = (scores[ok] * 1_000_000).round().astype("int64")
        return float(int((micros * w).sum())) / 1e6 / total

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg —
    # compute the count separately and join (both aggs share the shuffle
    # key, so AQE coalesces them onto the same exchange). eqNullSafe:
    # groupBy forms a NULL-source group on both sides, and a plain
    # equi-join would silently drop it (NULL never equals NULL).
    weighted = docs_with_scores.groupBy("source").agg(
        F.round(
            weighted_mean(F.col("quality_score"), F.col("n_tokens").cast("double")),
            6,
        ).alias("weighted_quality")
    )
    counts = docs_with_scores.groupBy("source").agg(
        F.count("*").alias("n_docs")
    ).withColumnRenamed("source", "_cnt_source")
    return weighted.join(
        counts, weighted["source"].eqNullSafe(counts["_cnt_source"])
    ).drop("_cnt_source")


def shingle_udtf_class():
    """Python UDTF (Spark 4): one input row → k-shingle rows. The
    set-returning-function shape; the relational operators stay the
    preferred path (`dedup.with_shingles`), this is the API coverage."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, shingle string")
    class ShingleExpander:
        def eval(self, doc_id: int, text: str, k: int):  # noqa: D102
            import re

            toks = [
                t.lower()
                for t in re.split(r"[^a-zA-Z0-9]+", text or "")
                if t
            ]
            seen = set()
            for i in range(max(len(toks) - k + 1, 0)):
                s = " ".join(toks[i : i + k])
                if s not in seen:
                    seen.add(s)
                    yield (doc_id, s)

    return ShingleExpander
