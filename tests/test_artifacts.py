"""Durable ingest artifacts (VERDICT r9 #2): the prebuilt indexes the
hot paths read must survive the SparkSession — built once at ingest,
committed to ledger tables, read by a FRESH session with ZERO corpus
re-scan, and maintained incrementally on document MERGE with
incremental ≡ rebuild through the readers."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.ingest import artifacts as A

_SCHEMA = "doc_id bigint, text string, source string"

_BOILER = ("nav home about contact privacy terms "
           "login logout search help faq cart")
_PROSE = ("alpha bravo charlie delta echo foxtrot "
          "golf hotel india juliet kilo lima")
_PROSE2 = ("mike november oscar papa quebec romeo "
           "sierra tango uniform victor whiskey xray")


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, t, s in rows], _SCHEMA
    )


def _corpus_v1(spark):
    return _docs(
        spark,
        [
            (1, f"{_BOILER} {_PROSE}", "web"),
            (2, f"{_PROSE} {_PROSE2}", "web"),
            (3, f"{_BOILER} {_PROSE2} {_PROSE}", "books"),
            (4, _PROSE2, "books"),
            (5, f"{_PROSE} {_BOILER}", "web"),
        ],
    )


def _delta(spark):
    # doc 3 SHRINKS (3 paragraphs -> 1: the stale-row case a pure
    # keyed upsert gets wrong), doc 5 changes text, docs 9/10 are new
    return _docs(
        spark,
        [
            (3, _PROSE2, "books"),
            (5, f"{_PROSE2} {_PROSE2}", "web"),
            (9, f"{_BOILER} {_BOILER}", "web"),
            (10, _PROSE, "books"),
        ],
    )


def _corpus_v2(spark):
    # what the corpus IS after merging _delta into _corpus_v1
    return _docs(
        spark,
        [
            (1, f"{_BOILER} {_PROSE}", "web"),
            (2, f"{_PROSE} {_PROSE2}", "web"),
            (3, _PROSE2, "books"),
            (4, _PROSE2, "books"),
            (5, f"{_PROSE2} {_PROSE2}", "web"),
            (9, f"{_BOILER} {_BOILER}", "web"),
            (10, _PROSE, "books"),
        ],
    )


def _rows(df, cols):
    out = []
    for r in df.select(*cols).collect():
        vals = []
        for c in cols:
            v = r[c]
            vals.append(tuple(sorted(v)) if isinstance(v, list) else v)
        out.append(tuple(vals))
    return sorted(out)


_READERS = [
    (A.read_paragraphs, ["pkey", "doc_id", "para_idx", "p_text",
                         "n_ptok"]),
    (A.read_paragraph_shingles, ["pkey", "doc_id", "para_idx",
                                 "shingles", "n_shingles"]),
    (A.read_paragraph_shingle_df, ["s", "df_s"]),
    (A.read_doc_shingles, ["doc_id", "shingles"]),
    (A.read_doc_shingle_df, ["s", "df_s"]),
    (A.read_paragraph_dedup_state, ["fpr", "keeper", "n_copies"]),
]


def test_build_and_read_zero_corpus_scan(spark, tmp_path):
    root = str(tmp_path / "art")
    docs = _corpus_v1(spark)
    versions = A.build_document_artifacts(spark, docs, root)
    assert all(v == 1 for v in versions.values())
    assert A.artifacts_exist(root)

    para = A.read_paragraphs(spark, root)
    psh = A.read_paragraph_shingles(spark, root)
    pdf = A.read_paragraph_shingle_df(spark, root)
    # every input file of every reader resolves under the artifact
    # root — the read plans NEVER touch the documents source
    for df in (para, psh, pdf,
               A.read_doc_shingles(spark, root),
               A.read_doc_shingle_df(spark, root)):
        files = df.inputFiles()
        assert files, "reader resolved no files"
        assert all(root in f for f in files), files

    # stored content == the builder relations recomputed now
    assert _rows(para, ["pkey", "doc_id", "para_idx", "p_text", "n_ptok"]) \
        == _rows(A._paragraph_rows(docs),
                 ["pkey", "doc_id", "para_idx", "p_text", "n_ptok"])
    assert _rows(psh, ["pkey", "shingles"]) == _rows(
        A._paragraph_shingle_rows(A._paragraph_rows(docs)),
        ["pkey", "shingles"],
    )
    assert _rows(pdf, ["s", "df_s"]) == _rows(
        A._df_counts(A._paragraph_shingle_rows(A._paragraph_rows(docs))),
        ["s", "df_s"],
    )


def test_hot_head_matches_scratch(spark, tmp_path):
    root = str(tmp_path / "art")
    docs = _corpus_v1(spark)
    A.build_document_artifacts(spark, docs, root)
    # cap=2: the boilerplate window's trigrams appear in >2 paragraphs
    hot = A.read_paragraph_hot_shingles(spark, root, cap=2)
    scratch = (
        A._df_counts(A._paragraph_shingle_rows(A._paragraph_rows(docs)))
        .filter(F.col("df_s") > 2)
        .select("s")
    )
    assert _rows(hot, ["s"]) == _rows(scratch, ["s"])
    assert hot.count() > 0, "planted boilerplate must exceed the cap"


@pytest.mark.slow
def test_incremental_refresh_equals_rebuild(spark, tmp_path):
    inc_root = str(tmp_path / "inc")
    full_root = str(tmp_path / "full")
    A.build_document_artifacts(spark, _corpus_v1(spark), inc_root)
    A.refresh_documents(spark, inc_root, _delta(spark))
    A.build_document_artifacts(spark, _corpus_v2(spark), full_root)

    for reader, cols in _READERS:
        inc = _rows(reader(spark, inc_root), cols)
        full = _rows(reader(spark, full_root), cols)
        assert inc == full, f"{reader.__name__} diverged from rebuild"

    # the shrunk document's stale paragraph rows are really gone
    para3 = (
        A.read_paragraphs(spark, inc_root)
        .filter(F.col("doc_id") == 3)
        .count()
    )
    assert para3 == 1


@pytest.mark.slow
def test_refresh_is_idempotent(spark, tmp_path):
    """Re-merging the same batch (crash-retry) must not change the
    readers' view — the delete+upsert replace and the signed-delta DF
    maintenance both re-derive the same end state."""
    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    A.refresh_documents(spark, root, _delta(spark))
    before = {
        "para": _rows(A.read_paragraphs(spark, root), ["pkey", "p_text"]),
        "pdf": _rows(A.read_paragraph_shingle_df(spark, root),
                     ["s", "df_s"]),
        "ddf": _rows(A.read_doc_shingle_df(spark, root), ["s", "df_s"]),
    }
    A.refresh_documents(spark, root, _delta(spark))
    assert _rows(A.read_paragraphs(spark, root),
                 ["pkey", "p_text"]) == before["para"]
    assert _rows(A.read_paragraph_shingle_df(spark, root),
                 ["s", "df_s"]) == before["pdf"]
    assert _rows(A.read_doc_shingle_df(spark, root),
                 ["s", "df_s"]) == before["ddf"]


@pytest.mark.slow
def test_append_only_refresh_equals_rebuild(spark, tmp_path):
    """The streaming-norm path: a batch of ONLY-NEW doc_ids takes the
    O(batch) MIN/SUM merge for the dedup state (no rebuild), and every
    reader still equals a from-scratch rebuild — including a keeper
    straggler (the appended doc 0 claims the boilerplate fingerprint's
    keeper from doc 1 via the MIN merge)."""
    inc_root = str(tmp_path / "inc")
    full_root = str(tmp_path / "full")
    A.build_document_artifacts(spark, _corpus_v1(spark), inc_root)
    append = _docs(
        spark,
        [
            (0, _BOILER, "web"),   # pkey sorts BEFORE doc 1's copy
            (9, f"{_BOILER} {_BOILER}", "web"),
        ],
    )
    A.refresh_documents(spark, inc_root, append)
    all_docs = _corpus_v1(spark).unionByName(append)
    A.build_document_artifacts(spark, all_docs, full_root)
    for reader, cols in _READERS:
        inc = _rows(reader(spark, inc_root), cols)
        full = _rows(reader(spark, full_root), cols)
        assert inc == full, f"{reader.__name__} diverged on append"
    # the straggler really re-based: doc 0 owns the boilerplate keeper
    state = A.read_paragraph_dedup_state(spark, inc_root)
    keepers = {r["keeper"] for r in state.collect()}
    assert any(k.startswith("0" * 19 + ":") for k in keepers)


def test_ivf_artifacts_refresh_equals_rebuild(spark, tmp_path):
    root = str(tmp_path / "ivf")
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("vec_id") != 0)
        .limit(200)
        .localCheckpoint(eager=True)
    )
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    A.build_vector_artifacts(spark, old, root, n_lists=4)
    A.refresh_vectors(spark, root, new)

    centroids = A.read_ivf_centroids(spark, root)
    assert len(centroids) == 4
    got = _rows(
        A.read_ivf_assignments(spark, root), ["vec_id", "list_id"]
    )
    want = _rows(
        A.assign_to_frozen_centroids(emb, centroids),
        ["vec_id", "list_id"],
    )
    assert got == want

    # probe read: list pruning + exact filter
    some = A.read_ivf_assignments(spark, root, list_ids=[0])
    assert some.count() == sum(1 for _, l in got if l == 0)
    assert {r["list_id"] for r in some.select("list_id").collect()} == {0}


_FRESH_SESSION_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from mtg_bulk_database_spark.ingest import artifacts as A

root = sys.argv[1]
spark = (SparkSession.builder.master("local[2]")
         .appName("artifact-fresh-read").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
para = A.read_paragraphs(spark, root)
pdf = A.read_paragraph_shingle_df(spark, root)
files = para.inputFiles() + pdf.inputFiles()
assert files and all(root in f for f in files), files
print("FRESH_OK", para.count(), pdf.count())
spark.stop()
"""


@pytest.mark.slow
def test_fresh_session_reads_without_corpus(spark, tmp_path):
    """The whole point of durability: a brand-new JVM + SparkSession
    (separate process — not ``newSession()``, which shares the
    context) reads the artifacts from storage alone.  The corpus is a
    createDataFrame relation that does not even EXIST outside the
    building session, so a re-scan is impossible rather than merely
    unobserved."""
    root = str(tmp_path / "art")
    docs = _corpus_v1(spark)
    A.build_document_artifacts(spark, docs, root)
    n_para = A.read_paragraphs(spark, root).count()
    n_df = A.read_paragraph_shingle_df(spark, root).count()
    out = subprocess.run(
        [sys.executable, "-c", _FRESH_SESSION_SCRIPT, root],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"FRESH_OK {n_para} {n_df}" in out.stdout


@pytest.mark.slow
def test_compacted_paragraphs_prune_to_one_file(spark, tmp_path):
    """Artifact maintenance at scale: after many micro-batch refreshes
    the paragraph table fragments; ``ledger_compact`` (zorder by
    doc_id) re-clusters it so a single-document read plans a scan of
    ONE data file via manifest min/max pruning — the 10k-file-listing
    vs 1-file-scan move the ledger docstring promises, exercised on
    the artifact the sub-document family actually serves."""
    from mtg_bulk_database_spark.ingest.ledger import ledger_compact

    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    # fragment: three append batches -> >= 4 manifest versions
    for i, txt in [(20, _PROSE), (21, _PROSE2), (22, _BOILER)]:
        A.refresh_documents(spark, root, _docs(spark, [(i, txt, "web")]))
    para_root = str(tmp_path / "art" / A.PARAGRAPHS)
    frag = A.read_paragraphs(spark, root)
    assert len(frag.inputFiles()) > 4
    before = _rows(frag, ["pkey", "p_text"])
    ledger_compact(
        spark, para_root, target_files=4, zorder=["doc_id"]
    )
    from mtg_bulk_database_spark.ingest.ledger import ledger_read

    pruned = ledger_read(spark, para_root, prune={"doc_id": (21, 21)})
    assert len(pruned.inputFiles()) == 1
    assert [r["doc_id"] for r in pruned.select("doc_id").distinct()
            .collect()] == [21]
    # compaction is a pure rewrite: reader contents identical
    assert _rows(A.read_paragraphs(spark, root),
                 ["pkey", "p_text"]) == before


def test_half_built_root_reads_as_absent(spark, tmp_path):
    """A root whose tables committed but whose completion marker never
    landed (crash mid-build, or a concurrent builder still writing)
    must read as absent — the accessor rebuilds rather than serving a
    potentially partial artifact set."""
    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    assert A.artifacts_exist(root)
    os.remove(os.path.join(root, A._DOC_COMPLETE))
    assert not A.artifacts_exist(root)
    # rebuilding over the unpublished root republishes (new versions,
    # identical reader view)
    before = _rows(A.read_paragraphs(spark, root), ["pkey", "p_text"])
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    assert A.artifacts_exist(root)
    assert _rows(A.read_paragraphs(spark, root),
                 ["pkey", "p_text"]) == before


@pytest.mark.slow
def test_replacement_keeper_loss_rebases_to_surviving_corpus_member(
    spark, tmp_path
):
    """The rescan leg of the affected-fingerprint merge: the batch
    REMOVES the boilerplate fingerprint's keeper (doc 1's updated text
    drops the paragraph), and the new keeper must come from a corpus
    member NOT in the batch (doc 2's copy) — exactly the case pure
    MIN/SUM arithmetic cannot answer.  A fingerprint owned entirely by
    the replaced doc vanishes from the state."""
    root = str(tmp_path / "art")
    only_doc1 = ("solo unique paragraph living only in document one "
                 "with twelve tokens")
    A.build_document_artifacts(
        spark,
        _docs(spark, [
            (1, f"{_BOILER} {only_doc1}", "web"),
            (2, f"{_PROSE} {_BOILER}", "web"),
        ]),
        root,
    )
    state0 = {
        r["fpr"]: (r["keeper"], r["n_copies"])
        for r in A.read_paragraph_dedup_state(spark, root).collect()
    }
    boiler_fpr = next(
        f for f, (k, n) in state0.items()
        if n == 2 and k.startswith("0" * 18 + "1:")
    )
    solo_fprs = {f for f, (k, n) in state0.items()
                 if k.startswith("0" * 18 + "1:") and n == 1}
    A.refresh_documents(
        spark, root, _docs(spark, [(1, _PROSE2, "web")])
    )
    state1 = {
        r["fpr"]: (r["keeper"], r["n_copies"])
        for r in A.read_paragraph_dedup_state(spark, root).collect()
    }
    # keeper re-based onto doc 2's surviving copy, count corrected
    k, n = state1[boiler_fpr]
    assert k.startswith("0" * 18 + "2:") and n == 1
    # doc-1-only fingerprints vanished
    assert not (solo_fprs & set(state1))
    # and the whole state equals a from-scratch build of the new corpus
    full = str(tmp_path / "full")
    A.build_document_artifacts(
        spark,
        _docs(spark, [
            (1, _PROSE2, "web"),
            (2, f"{_PROSE} {_BOILER}", "web"),
        ]),
        full,
    )
    assert state1 == {
        r["fpr"]: (r["keeper"], r["n_copies"])
        for r in A.read_paragraph_dedup_state(spark, full).collect()
    }


@pytest.mark.slow
def test_replacement_below_k_tokens_drops_doc_shingles(spark, tmp_path):
    """r10 ADVICE: a replaced document whose NEW text has fewer than
    k=3 tokens emits no doc_shingles row, so without the delete leg the
    stale postings row survived while the DF delta subtracted its
    counts — postings and statistic permanently disagreed.  Now the
    doc-grain delete clears it and incremental == rebuild through every
    reader."""
    inc_root = str(tmp_path / "inc")
    full_root = str(tmp_path / "full")
    A.build_document_artifacts(spark, _corpus_v1(spark), inc_root)
    shrink = _docs(spark, [(5, "tiny doc", "web")])  # 2 tokens < k
    A.refresh_documents(spark, inc_root, shrink)
    after = _corpus_v1(spark).filter(F.col("doc_id") != 5).unionByName(
        shrink
    )
    A.build_document_artifacts(spark, after, full_root)
    for reader, cols in _READERS:
        inc = _rows(reader(spark, inc_root), cols)
        full = _rows(reader(spark, full_root), cols)
        assert inc == full, f"{reader.__name__} diverged on sub-k shrink"
    assert (
        A.read_doc_shingles(spark, inc_root)
        .filter(F.col("doc_id") == 5)
        .count()
        == 0
    )


def test_duplicate_doc_id_batch_keeps_tables_in_sync(spark, tmp_path):
    """r10 ADVICE: a batch carrying the same doc_id twice used to
    desync the tables — the keyed upsert dedup'd rows last-wins while
    ``_df_counts`` counted both copies into the deltas.  The up-front
    doc_id dedup makes the stored DF statistic equal the one recomputed
    from the stored postings, whichever copy won."""
    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    dup_batch = _docs(
        spark,
        [(9, f"{_PROSE} {_PROSE}", "web"),
         (9, f"{_PROSE2} {_PROSE2}", "web")],
    )
    A.refresh_documents(spark, root, dup_batch)
    # the invariant the ADVICE names: DF statistic == recount of the
    # stored postings (for both grains)
    assert _rows(A.read_paragraph_shingle_df(spark, root),
                 ["s", "df_s"]) == _rows(
        A._df_counts(A.read_paragraph_shingles(spark, root)),
        ["s", "df_s"],
    )
    assert _rows(A.read_doc_shingle_df(spark, root),
                 ["s", "df_s"]) == _rows(
        A._df_counts(A.read_doc_shingles(spark, root)), ["s", "df_s"]
    )
    # exactly one surviving doc-9 row at doc grain
    assert (
        A.read_doc_shingles(spark, root)
        .filter(F.col("doc_id") == 9)
        .count()
        == 1
    )


@pytest.mark.slow
def test_midfold_crash_replay_is_exactly_once(spark, tmp_path, monkeypatch):
    """r10 ADVICE (the replay-safety hole): crash BETWEEN the
    PARAGRAPH_SHINGLES commit and the DF merge, then replay the same
    batch_id — the old code recomputed the signed deltas against the
    already-updated postings (delta = 0) and lost the batch's DF
    contribution forever.  With the per-table applied-batch stamps the
    replay skips the committed tables and folds the rest from the
    pinned pre-batch snapshots: readers == rebuild."""
    inc_root = str(tmp_path / "inc")
    full_root = str(tmp_path / "full")
    A.build_document_artifacts(spark, _corpus_v1(spark), inc_root)

    real_merge = A._merge_df_counts

    def boom(*a, **k):
        raise RuntimeError("injected crash before the DF merge")

    monkeypatch.setattr(A, "_merge_df_counts", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        A.refresh_documents(spark, inc_root, _delta(spark), batch_id=7)
    monkeypatch.setattr(A, "_merge_df_counts", real_merge)

    # replay exactly as foreachBatch would: same batch, same batch_id
    A.refresh_documents(spark, inc_root, _delta(spark), batch_id=7)
    A.build_document_artifacts(spark, _corpus_v2(spark), full_root)
    for reader, cols in _READERS:
        inc = _rows(reader(spark, inc_root), cols)
        full = _rows(reader(spark, full_root), cols)
        assert inc == full, f"{reader.__name__} lost the crashed batch"


@pytest.mark.slow
def test_bulk_batch_takes_join_path(spark, tmp_path, monkeypatch):
    """VERDICT r10 #7: above the id threshold every membership test
    switches from isin literals to joins (including the stale-row
    delete via ledger_delete_keys).  Forcing the threshold to 1 runs
    the standard replacement corpus through the bulk path — results
    must equal the rebuild exactly."""
    monkeypatch.setattr(A, "_BULK_ID_THRESHOLD", 1)
    inc_root = str(tmp_path / "inc")
    full_root = str(tmp_path / "full")
    A.build_document_artifacts(spark, _corpus_v1(spark), inc_root)
    A.refresh_documents(spark, inc_root, _delta(spark))
    A.build_document_artifacts(spark, _corpus_v2(spark), full_root)
    for reader, cols in _READERS:
        inc = _rows(reader(spark, inc_root), cols)
        full = _rows(reader(spark, full_root), cols)
        assert inc == full, f"{reader.__name__} diverged on bulk path"


@pytest.mark.slow
def test_bulk_backfill_no_plan_blowup(spark, tmp_path):
    """A genuinely bulk batch (30k fresh doc_ids — 3x the threshold,
    no monkeypatch) refreshes through the join path without embedding
    30k literals in any plan; spot-check counts and the DF/postings
    sync invariant."""
    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    big = spark.range(1_000, 31_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha bravo charlie delta unique doc "),
            F.col("id").cast("string"),
        ).alias("text"),
        F.lit("web").alias("source"),
    )
    A.refresh_documents(spark, root, big)
    assert (
        A.read_doc_shingles(spark, root)
        .filter(F.col("doc_id") >= 1_000)
        .count()
        == 30_000
    )
    assert _rows(A.read_doc_shingle_df(spark, root),
                 ["s", "df_s"]) == _rows(
        A._df_counts(A.read_doc_shingles(spark, root)), ["s", "df_s"]
    )


@pytest.mark.slow
def test_structural_splitter_variant_build_and_refresh(spark, tmp_path):
    """VERDICT r10 #4: the durable artifacts can persist the
    STRUCTURAL (double-newline) paragraph definition.  The splitter is
    recorded in the root's meta, a refresh re-derives rows with the
    SAME splitter (no parameter to misuse), and incremental == rebuild
    through the readers on a corpus with real separators."""
    from mtg_bulk_database_spark.pipeline_queries14 import (
        paragraph_table_structural,
    )

    sep_docs = _docs(spark, [
        (1, f"{_BOILER}\n\n{_PROSE}", "web"),
        (2, f"{_PROSE}\n\n{_PROSE2}\n\n{_BOILER}", "web"),
    ])
    inc_root = str(tmp_path / "inc")
    A.build_document_artifacts(spark, sep_docs, inc_root,
                               splitter="structural")
    assert A.artifact_meta(inc_root)["splitter"] == "structural"
    # stored paragraphs follow the STRUCTURAL contract (2 + 3 rows,
    # split at the separators), not the token-window proxy
    got = _rows(A.read_paragraphs(spark, inc_root),
                ["doc_id", "para_idx", "p_text", "n_ptok"])
    want = _rows(paragraph_table_structural(sep_docs),
                 ["doc_id", "para_idx", "p_text", "n_ptok"])
    assert got == want and len(got) == 5

    # refresh derives the increment with the ROOT's splitter: doc 1
    # replaced by a 2-separator text, doc 3 appended
    delta = _docs(spark, [
        (1, f"{_PROSE2}\n\n{_PROSE2}", "web"),
        (3, _BOILER, "web"),
    ])
    A.refresh_documents(spark, inc_root, delta)
    full_root = str(tmp_path / "full")
    after = _docs(spark, [
        (1, f"{_PROSE2}\n\n{_PROSE2}", "web"),
        (2, f"{_PROSE}\n\n{_PROSE2}\n\n{_BOILER}", "web"),
        (3, _BOILER, "web"),
    ])
    A.build_document_artifacts(spark, after, full_root,
                               splitter="structural")
    for reader, cols in _READERS:
        inc = _rows(reader(spark, inc_root), cols)
        full = _rows(reader(spark, full_root), cols)
        assert inc == full, f"{reader.__name__} diverged (structural)"


def test_unknown_splitter_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown paragraph splitter"):
        A.build_document_artifacts(
            spark, _corpus_v1(spark), str(tmp_path / "x"),
            splitter="sentences",
        )


@pytest.mark.slow
def test_vacuum_reclaims_replaced_files_readers_unchanged(spark, tmp_path):
    """After refreshes fragment the tables, vacuum with retention 1
    deletes files only dead versions reference; every reader's view is
    identical before and after."""
    from mtg_bulk_database_spark.ingest.ledger import current_version

    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    A.refresh_documents(spark, root, _delta(spark))
    before = {
        reader.__name__: _rows(reader(spark, root), cols)
        for reader, cols in _READERS
    }
    deleted = A.vacuum_artifacts(root, retain_versions=1,
                                 orphan_min_age_s=0.0)
    assert sum(len(v) for v in deleted.values()) > 0
    after = {
        reader.__name__: _rows(reader(spark, root), cols)
        for reader, cols in _READERS
    }
    assert before == after
    assert current_version(os.path.join(root, A.PARAGRAPHS)) > 1


# ---------------------------------------------------------------------------
# remove_documents — the takedown edge (r11)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_remove_documents_equals_rebuild(spark, tmp_path):
    """Removing docs 1 and 4 from the maintained root must equal a
    from-scratch build of the surviving corpus through every reader —
    including the keeper-loss rebase: doc 1 owned the boilerplate
    fingerprint's keeper, which must move to the surviving doc 3."""
    root = str(tmp_path / "rm")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    A.remove_documents(spark, root, [1, 4])
    want_root = str(tmp_path / "rm_want")
    A.build_document_artifacts(
        spark,
        _docs(
            spark,
            [
                (2, f"{_PROSE} {_PROSE2}", "web"),
                (3, f"{_BOILER} {_PROSE2} {_PROSE}", "books"),
                (5, f"{_PROSE} {_BOILER}", "web"),
            ],
        ),
        want_root,
    )
    for reader, cols in _READERS:
        got = _rows(reader(spark, root), cols)
        want = _rows(reader(spark, want_root), cols)
        assert got == want, f"{reader.__name__} diverged after removal"
    state = A.read_paragraph_dedup_state(spark, root)
    boiler_keepers = [
        r["keeper"]
        for r in state.filter(state["n_copies"] >= 2).collect()
    ]
    assert any(k.startswith("0" * 18 + "3:") for k in boiler_keepers)


@pytest.mark.slow
def test_remove_all_copies_vanishes_fingerprint(spark, tmp_path):
    """Removing every document that held a fingerprint deletes its
    state row and postings entirely (no zero-count ghosts through the
    readers)."""
    root = str(tmp_path / "rmv")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    A.remove_documents(spark, root, [2, 3, 4])
    want_root = str(tmp_path / "rmv_want")
    A.build_document_artifacts(
        spark,
        _docs(
            spark,
            [
                (1, f"{_BOILER} {_PROSE}", "web"),
                (5, f"{_PROSE} {_BOILER}", "web"),
            ],
        ),
        want_root,
    )
    for reader, cols in _READERS:
        got = _rows(reader(spark, root), cols)
        want = _rows(reader(spark, want_root), cols)
        assert got == want, f"{reader.__name__} kept a ghost"


@pytest.mark.slow
def test_remove_absent_id_is_a_noop_and_replay_idempotent(
    spark, tmp_path
):
    """Removing an id the corpus never held changes nothing (DataFrame
    id path); replaying a removal with the same batch_id is a no-op
    under the exactly-once contract."""
    root = str(tmp_path / "rmn")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    before = [
        _rows(reader(spark, root), cols) for reader, cols in _READERS
    ]
    ids = spark.createDataFrame([(42,)], "doc_id bigint")
    A.remove_documents(spark, root, ids)
    after = [
        _rows(reader(spark, root), cols) for reader, cols in _READERS
    ]
    assert before == after
    A.remove_documents(spark, root, [5], batch_id=11)
    mid = [
        _rows(reader(spark, root), cols) for reader, cols in _READERS
    ]
    A.remove_documents(spark, root, [5], batch_id=11)
    assert mid == [
        _rows(reader(spark, root), cols) for reader, cols in _READERS
    ]


def test_remove_vectors_deletes_assignments(spark, tmp_path):
    """Vector takedown: removed ids leave the assignment table (both
    the list path and the bulk DataFrame path), the centroids stay
    frozen, absent ids are a no-op, and the pruned probe reads still
    serve the survivors."""
    root = str(tmp_path / "ivf_rm")
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("vec_id") != 0)
        .limit(200)
        .localCheckpoint(eager=True)
    )
    A.build_vector_artifacts(spark, emb, root, n_lists=4)
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    victims = sorted(all_ids)[:5]
    A.remove_vectors(spark, root, victims)
    left = {
        r["vec_id"]
        for r in A.read_ivf_assignments(spark, root)
        .select("vec_id").collect()
    }
    assert left == all_ids - set(victims)
    assert len(A.read_ivf_centroids(spark, root)) == 4
    # bulk DataFrame path + absent-id no-op
    more = spark.createDataFrame(
        [(sorted(all_ids)[6],), (999_999_999,)], "vec_id bigint"
    )
    A.remove_vectors(spark, root, more)
    left2 = {
        r["vec_id"]
        for r in A.read_ivf_assignments(spark, root)
        .select("vec_id").collect()
    }
    assert left2 == left - {sorted(all_ids)[6]}


def test_vacuum_discovers_every_ledger_table(spark, tmp_path):
    """vacuum_artifacts must DISCOVER tables, not enumerate a fixed
    list — the admission history lives under the same root and a
    fixed list silently skipped it forever."""
    from mtg_bulk_database_spark.ingest import admission as AD

    root = str(tmp_path / "vac")
    A.build_document_artifacts(spark, _corpus_v1(spark), root)
    stats = AD.classify_batch(
        spark, root, _delta(spark), tau=0.5, df_cap=1000
    ).localCheckpoint(eager=True)
    AD.persist_admission_stats(spark, root, stats, batch_id=0)
    # create a dead version in the history so vacuum has work there
    AD.persist_admission_stats(spark, root, stats, batch_id=0)
    out = A.vacuum_artifacts(root, retain_versions=1, orphan_min_age_s=0)
    assert AD.ADMISSION_STATS in out
    assert A.PARAGRAPHS in out
    # readers still serve after vacuum
    assert AD.read_admission_stats(spark, root).count() == stats.count()
