"""q263 epoch-shard-plan invariants beyond the DuckDB parity hash:
instance-count identity vs the manifest, shard-id domain, hash
balance, and share closure."""

from __future__ import annotations

from pyspark.sql import functions as F

from mtg_bulk_database_spark.pipeline_queries16 import _Q263_SHARDS
from mtg_bulk_database_spark.registry import load_registry

QUERIES, _ = load_registry()
SF_DIR = "/root/testdata/sf0.01"


def _report(spark):
    return QUERIES["q263_epoch_shard_plan"](spark, SF_DIR).collect()


def test_q263_instance_identity_and_domain(spark):
    """sum of per-shard instances == sum of manifest repeats (every
    scheduled instance lands in exactly one shard), and shard ids
    stay in [0, _Q263_SHARDS)."""
    rows = _report(spark)
    man = QUERIES["q248_mix_manifest"](spark, SF_DIR)
    expected = man.agg(F.sum("n_repeats")).collect()[0][0]
    assert sum(r.n_inst for r in rows) == expected
    assert {r.shard for r in rows} <= set(range(_Q263_SHARDS))


def test_q263_balance_and_share_closure(spark):
    """The 60-bit hash key balances shards (no shard above 4x the
    mean — at the sf0.01 mean of ~14 instances/shard the Poisson tail
    past 4x is ~1e-8, and the fixed corpus makes the check exact-
    reproducible) and the floor-micro token shares close to within
    one floor per shard."""
    rows = _report(spark)
    counts = [r.n_inst for r in rows]
    assert len(rows) == _Q263_SHARDS  # every shard populated at sf0.01
    mean = sum(counts) / len(counts)
    assert max(counts) <= 4 * mean
    s = sum(r.tok_share_micro for r in rows)
    assert 1_000_000 - _Q263_SHARDS <= s <= 1_000_000


def test_write_epoch_shards_layout_and_determinism(spark, tmp_path):
    """The sink writes one directory per shard; every shard file holds
    its rows in the (h60, doc_id, rep_idx) trainer order; the union of
    shard dirs equals the instance stream; and a second write of the
    same manifest produces the identical row sequences (the
    reproducible-epoch contract)."""
    import pandas as pd

    from mtg_bulk_database_spark.operators import shards as SH

    man = spark.createDataFrame(
        [(i, 7 + (i % 5), 1 + (i % 3)) for i in range(200)],
        "doc_id bigint, n_tok bigint, n_repeats bigint",
    )
    n = 8
    inst = SH.manifest_instances(man, n)
    out1, out2 = str(tmp_path / "ep1"), str(tmp_path / "ep2")
    SH.write_epoch_shards(inst, out1, n)
    SH.write_epoch_shards(inst, out2, n)

    expected = sorted(
        (r.shard, r.h60, r.doc_id, r.rep_idx, r.nt)
        for r in inst.collect()
    )
    got = []
    for s in range(n):
        seq1, seq2 = [], []
        for f in SH.shard_files(out1, s):
            df = pd.read_parquet(f)
            seq1 += list(
                zip(df.h60, df.doc_id, df.rep_idx, df.nt)
            )
        for f in SH.shard_files(out2, s):
            df = pd.read_parquet(f)
            seq2 += list(
                zip(df.h60, df.doc_id, df.rep_idx, df.nt)
            )
        assert seq1 == seq2, f"shard {s} not reproducible"
        assert seq1 == sorted(seq1), f"shard {s} not in trainer order"
        got += [(s, *t) for t in seq1]
    assert sorted(got) == [
        (s, h, d, r, t) for (s, h, d, r, t) in expected
    ]


def test_read_epoch_shard_prunes_partitions(spark, tmp_path):
    """Reading one shard scans only its directory (partition pruning
    on the hive-partitioned shard column — at production shard counts
    this is the difference between one directory and the epoch)."""
    from mtg_bulk_database_spark.operators import shards as SH

    man = spark.createDataFrame(
        [(i, 5, 2) for i in range(50)],
        "doc_id bigint, n_tok bigint, n_repeats bigint",
    )
    out = str(tmp_path / "ep3")
    SH.write_epoch_shards(SH.manifest_instances(man, 4), out, 4)
    df = SH.read_epoch_shard(spark, out, 2)
    from mtg_bulk_database_spark.plans import executed_plan

    plan = executed_plan(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "shard" in pf[0], pf
    # the shard predicate lives ONLY in PartitionFilters (directory
    # skipping), never as a post-scan row filter; inputFiles() lists
    # the unpruned relation, so the semantic check is row counts
    assert "DataFilters: []" in plan, plan[:1500]
    full = spark.read.parquet(out)
    want = full.filter(F.col("shard") == 2).count()
    assert 0 < want < full.count()
    assert df.count() == want


def test_write_plan_has_exactly_one_exchange(spark):
    """The sink's pre-write frame plans exactly ONE Exchange (hash on
    shard) followed by the per-partition sort — the epoch shuffle
    costs one pass over the instance stream, no global sort, no
    second shuffle."""
    from mtg_bulk_database_spark.operators import shards as SH
    from mtg_bulk_database_spark.plans import executed_plan

    man = spark.createDataFrame(
        [(i, 5, 2) for i in range(100)],
        "doc_id bigint, n_tok bigint, n_repeats bigint",
    )
    frame = (
        SH.manifest_instances(man, 8)
        .repartition(8, "shard")
        .sortWithinPartitions("shard", "h60", "doc_id", "rep_idx")
    )
    plan = executed_plan(frame)
    assert plan.count("Exchange") == 1, plan[:1200]
    assert "hashpartitioning(shard" in plan
    sort_lines = [
        ln for ln in plan.splitlines() if "Sort [shard" in ln
    ]
    # `Sort [keys], false, 0` — the second operand is the GLOBAL flag;
    # false = partition-local sort, no range-partition exchange
    assert sort_lines and "], false, 0" in sort_lines[0], sort_lines


def test_shard_kernel_matches_python_replica(spark):
    """Third-engine check (the portable-hash discipline): a pure
    Python replica — hashlib md5, int arithmetic, sorted adjacency —
    must reproduce manifest_instances + shard_report EXACTLY on random
    manifests.  Validates the 60-bit key derivation, the shard mod,
    the within-shard order and every report column independently of
    both Spark and DuckDB."""
    import hashlib
    import random

    from mtg_bulk_database_spark.operators import shards as SH

    for seed in (3, 77, 2024):
        rng = random.Random(seed)
        n = rng.choice([4, 8, 16])
        man_rows = [
            (did, rng.randint(1, 40), rng.randint(0, 4))
            for did in rng.sample(range(1, 10_000), rng.randint(1, 120))
        ]
        man = spark.createDataFrame(
            man_rows, "doc_id bigint, n_tok bigint, n_repeats bigint"
        )
        inst = SH.manifest_instances(man, n)
        got = sorted(
            (r.doc_id, r.nt, r.rep_idx, r.h60, r.shard)
            for r in inst.collect()
        )
        # --- replica ---
        rep = []
        for did, nt, reps in man_rows:
            for k in range(reps):
                h60 = int(
                    hashlib.md5(f"{did}:{k}".encode()).hexdigest()[:15],
                    16,
                )
                rep.append((did, nt, k, h60, h60 % n))
        assert got == sorted(rep), f"instances diverged (seed {seed})"

        got_rep = sorted(
            (
                r.shard, r.n_inst, r.n_docs, r.tok_sum,
                r.n_adjacent_same_doc, r.tok_share_micro,
            )
            for r in SH.shard_report(inst).collect()
        )
        want_rep = []
        total = sum(t[1] for t in rep)
        by_shard = {}
        for t in rep:
            by_shard.setdefault(t[4], []).append(t)
        for s, rows in by_shard.items():
            rows.sort(key=lambda t: (t[3], t[0], t[2]))
            adj = sum(
                1
                for a, b in zip(rows, rows[1:])
                if a[0] == b[0]
            )
            tok = sum(t[1] for t in rows)
            want_rep.append((
                s, len(rows), len({t[0] for t in rows}), tok, adj,
                (tok * 1_000_000) // total,
            ))
        assert got_rep == sorted(want_rep), f"report diverged (seed {seed})"


def test_q265_churn_identities(spark):
    """Conservation identities over the churn report: kept+removed ==
    the pinned-plan instance count on the old corpus, kept+added ==
    on the new corpus, and the arriving batch's scheduled instances
    are a lower bound on the additions."""
    from mtg_bulk_database_spark.operators.shards import (
        manifest_instances,
    )
    from mtg_bulk_database_spark.functions.text import tokens
    from mtg_bulk_database_spark.catalog import load_table
    from mtg_bulk_database_spark.pipeline_queries13 import (
        epoch_capped_allocation,
        source_token_counts,
    )
    from mtg_bulk_database_spark.pipeline_queries14 import greedy_manifest
    from mtg_bulk_database_spark.pipeline_queries16 import _Q263_SHARDS

    rows = QUERIES["q265_epoch_shard_churn"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    docs90 = docs.filter(F.col("doc_id") % 7 != 0)
    alloc = epoch_capped_allocation(
        source_token_counts(docs90)
    ).select(
        "source",
        F.col("n_tokens").alias("src_tokens"),
        "alloc_tokens",
    )

    def n_inst(dd):
        d = dd.where(F.col("source").isNotNull()).select(
            "doc_id",
            "source",
            F.coalesce(F.size(tokens("text")), F.lit(0)).alias("nt"),
        )
        return manifest_instances(
            greedy_manifest(d, alloc), _Q263_SHARDS
        ).count()

    kept = sum(r.n_kept for r in rows)
    assert kept + sum(r.n_removed for r in rows) == n_inst(docs90)
    assert kept + sum(r.n_added for r in rows) == n_inst(docs)
    assert sum(r.n_added for r in rows) > 0
    assert all(
        (r.touched == 1) == (r.n_added + r.n_removed > 0) for r in rows
    )
