"""End-to-end ingest admission (VERDICT r10 #3): classify an arriving
batch against the durable artifacts, admit documents with enough novel
token mass, fold ONLY the admitted ones — and the folded state equals
a from-scratch rebuild on (corpus ∪ admitted) through every reader."""


from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mtg_bulk_database_spark.ingest import artifacts as A
from mtg_bulk_database_spark.ingest.admission import (
    admit_and_refresh,
    classify_batch,
)

_SCHEMA = "doc_id bigint, text string, source string"

_BOILER = ("nav home about contact privacy terms "
           "login logout search help faq cart")
# one middle token changed: 3 of 10 trigram shingles differ ->
# J = 7/13 ~= 0.538 >= tau 0.5 (near-dup, NOT exact)
_BOILER_VAR = _BOILER.replace("search", "find")
_PROSE = ("alpha bravo charlie delta echo foxtrot "
          "golf hotel india juliet kilo lima")
_NOVEL_A = ("zulu yankee xray whiskey victor uniform "
            "tango sierra romeo quebec papa oscar")
_NOVEL_B = ("apple banana cherry damson elder fig "
            "grape honeydew imbe jackfruit kiwi lemon")

_TAU, _CAP = 0.5, 1000


def _docs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _corpus(spark):
    return _docs(spark, [
        (1, f"{_BOILER} {_PROSE}", "web"),
        (2, f"{_PROSE} {_BOILER}", "web"),
    ])


def _batch(spark):
    return _docs(spark, [
        (100, _BOILER, "web"),                 # exact corpus dup
        (101, _BOILER_VAR, "web"),             # near-dup vs corpus
        (102, _NOVEL_A, "web"),                # fully novel
        (103, f"{_BOILER} {_NOVEL_B}", "web"),  # half novel -> admitted
        (104, _NOVEL_A, "web"),                # batch-internal dup of 102
    ])


def _rows(df, cols):
    out = []
    for r in df.select(*cols).collect():
        vals = [tuple(sorted(v)) if isinstance(v, list) else v
                for v in (r[c] for c in cols)]
        out.append(tuple(vals))
    return sorted(out)


_READERS = [
    (A.read_paragraphs, ["pkey", "doc_id", "para_idx", "p_text", "n_ptok"]),
    (A.read_paragraph_shingles, ["pkey", "shingles", "n_shingles"]),
    (A.read_paragraph_shingle_df, ["s", "df_s"]),
    (A.read_doc_shingles, ["doc_id", "shingles"]),
    (A.read_doc_shingle_df, ["s", "df_s"]),
    (A.read_paragraph_dedup_state, ["fpr", "keeper", "n_copies"]),
]


@pytest.mark.slow
def test_classification_and_admission_decision(spark, tmp_path):
    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus(spark), root)
    stats = {
        r["doc_id"]: r
        for r in classify_batch(
            spark, root, _batch(spark), _TAU, _CAP
        ).collect()
    }
    assert stats[100]["n_dup_corpus"] == 1 and stats[100]["admitted"] == 0
    assert stats[101]["n_near_dup"] == 1 and stats[101]["admitted"] == 0
    assert stats[101]["n_dup_corpus"] == 0  # near, not exact
    assert stats[102]["tok_novel"] == 12 and stats[102]["admitted"] == 1
    # doc 103: boiler para corpus-dup, novel para kept -> exactly half
    assert stats[103]["n_dup_corpus"] == 1
    assert stats[103]["tok_novel"] * 2 == stats[103]["tok_total"]
    assert stats[103]["admitted"] == 1
    # doc 104 loses the batch-internal keeper race to doc 102
    assert stats[104]["n_dup_batch"] == 1 and stats[104]["admitted"] == 0


@pytest.mark.slow
def test_admit_then_refresh_equals_rebuild_on_admitted(spark, tmp_path):
    inc_root = str(tmp_path / "inc")
    full_root = str(tmp_path / "full")
    A.build_document_artifacts(spark, _corpus(spark), inc_root)
    stats, versions = admit_and_refresh(
        spark, inc_root, _batch(spark), _TAU, _CAP
    )
    admitted = sorted(
        r["doc_id"] for r in stats.filter(F.col("admitted") == 1).collect()
    )
    assert admitted == [102, 103]
    assert versions  # something was folded
    rebuilt_corpus = _corpus(spark).unionByName(
        _batch(spark).filter(F.col("doc_id").isin(admitted))
    )
    A.build_document_artifacts(spark, rebuilt_corpus, full_root)
    for reader, cols in _READERS:
        inc = _rows(reader(spark, inc_root), cols)
        full = _rows(reader(spark, full_root), cols)
        assert inc == full, f"{reader.__name__} diverged from rebuild"


@pytest.mark.slow
def test_admission_is_idempotent_after_completed_fold(spark, tmp_path):
    """Replaying the whole admission after a COMPLETED fold admits
    nothing (the previously admitted docs now classify as corpus
    duplicates) and leaves every reader unchanged — end-to-end
    idempotence without any replay bookkeeping."""
    root = str(tmp_path / "art")
    A.build_document_artifacts(spark, _corpus(spark), root)
    admit_and_refresh(spark, root, _batch(spark), _TAU, _CAP)
    before = {
        reader.__name__: _rows(reader(spark, root), cols)
        for reader, cols in _READERS
    }
    stats2, versions2 = admit_and_refresh(
        spark, root, _batch(spark), _TAU, _CAP
    )
    assert stats2.filter(F.col("admitted") == 1).count() == 0
    assert versions2 == {}
    after = {
        reader.__name__: _rows(reader(spark, root), cols)
        for reader, cols in _READERS
    }
    assert before == after
