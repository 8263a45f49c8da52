"""Artifact lifecycle (VERDICT r10 #5): configurable warehouse root,
build catalog, and GC of roots whose corpus signature no longer
resolves — with live-root vacuum wired in."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from mtg_bulk_database_spark.ingest import artifact_catalog as C
from mtg_bulk_database_spark.ingest import artifacts as A

_SCHEMA = "doc_id bigint, text string, source string"
_TEXT = ("alpha bravo charlie delta echo foxtrot "
         "golf hotel india juliet kilo lima")


def test_warehouse_env_override(monkeypatch, tmp_path):
    monkeypatch.delenv(C.WAREHOUSE_ENV, raising=False)
    assert C.warehouse_root().endswith("spark_graft_artifacts")
    monkeypatch.setenv(C.WAREHOUSE_ENV, str(tmp_path / "wh"))
    assert C.warehouse_root() == str(tmp_path / "wh")


def test_register_and_read_newest_wins(tmp_path):
    wh = str(tmp_path / "wh")
    C.register_artifact_root(
        os.path.join(wh, "r1"), source_path=str(tmp_path / "c1"),
        source_size=10, source_mtime_ns=111, fmt=5, subset="all",
        splitter="window", warehouse=wh,
    )
    C.register_artifact_root(
        os.path.join(wh, "r1"), source_path=str(tmp_path / "c1"),
        source_size=20, source_mtime_ns=222, fmt=5, subset="all",
        splitter="window", warehouse=wh,
    )
    entries = C.catalog_entries(wh)
    assert list(entries) == ["r1"]
    assert entries["r1"]["source_size"] == 20
    # torn/garbage line is skipped, not fatal
    with open(os.path.join(wh, "_CATALOG.jsonl"), "a") as f:
        f.write("{not json\n")
    assert list(C.catalog_entries(wh)) == ["r1"]


def _build_root(spark, wh: str, name: str, source: str) -> str:
    """Build a real artifact root under the warehouse, registered
    against ``source`` (a plain file standing in for the corpus)."""
    root = os.path.join(wh, name)
    docs = spark.createDataFrame([(1, _TEXT, "web")], _SCHEMA)
    A.build_document_artifacts(spark, docs, root)
    st = os.stat(source)
    C.register_artifact_root(
        root, source_path=source, source_size=st.st_size,
        source_mtime_ns=st.st_mtime_ns, fmt=A.ARTIFACT_FORMAT,
        subset="all", splitter="window", warehouse=wh,
    )
    return root


def test_gc_drops_orphan_keeps_live_vacuums_live(spark, tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    live_src = str(tmp_path / "live_corpus.parquet")
    dead_src = str(tmp_path / "dead_corpus.parquet")
    for p in (live_src, dead_src):
        with open(p, "w") as f:
            f.write("corpus bytes")
    live = _build_root(spark, wh, "live_root", live_src)
    dead = _build_root(spark, wh, "dead_root", dead_src)
    # fragment the live root so vacuum has something to reclaim
    A.refresh_documents(
        spark, live,
        spark.createDataFrame([(2, _TEXT + " extra", "web")], _SCHEMA),
    )
    # an uncataloged stray dir must be reported, never deleted
    os.makedirs(os.path.join(wh, "stray_dir"))
    os.remove(dead_src)  # the dead corpus vanished -> signature dead

    report = C.gc_artifacts(wh, min_age_s=0.0, retain_versions=1)
    assert report["dropped"] == ["dead_root"]
    assert report["kept"] == ["live_root"]
    assert report["uncataloged"] == ["stray_dir"]
    assert report["vacuumed"].get("live_root", 0) > 0
    assert not os.path.isdir(dead)
    assert os.path.isdir(os.path.join(wh, "stray_dir"))
    # live root still serves after its vacuum
    assert A.read_paragraphs(spark, live).count() > 0
    entries = C.catalog_entries(wh)
    assert list(entries) == ["live_root"]
    assert "last_vacuum" in entries["live_root"]


def test_gc_age_gate_spares_young_stale_roots(spark, tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    src = str(tmp_path / "c.parquet")
    with open(src, "w") as f:
        f.write("x")
    root = _build_root(spark, wh, "young_root", src)
    os.remove(src)
    report = C.gc_artifacts(wh, min_age_s=3600.0)
    assert report["dropped"] == [] and "young_root" in report["kept"]
    assert os.path.isdir(root)


def test_documents_artifact_root_registers_under_warehouse(
    spark, tmp_path, monkeypatch
):
    """The accessor itself builds under the configured warehouse and
    registers in its catalog; a regenerated corpus strands the old
    root, and GC reclaims it."""
    from mtg_bulk_database_spark.pipeline_queries15 import (
        documents_artifact_root,
    )

    wh = str(tmp_path / "wh")
    monkeypatch.setenv(C.WAREHOUSE_ENV, wh)
    sf_dir = str(tmp_path / "sfX")
    os.makedirs(sf_dir)
    src = os.path.join(sf_dir, "documents.parquet")
    spark.createDataFrame(
        [(i, f"{_TEXT} doc {i}", "web") for i in range(1, 30)], _SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    root = documents_artifact_root(spark, sf_dir, subset="all")
    assert root.startswith(wh) and A.artifacts_exist(root)
    name = os.path.basename(root)
    assert name in C.catalog_entries(wh)

    # regenerate the corpus in place -> old root becomes GC-able
    shutil.rmtree(src)
    spark.createDataFrame(
        [(i, f"{_TEXT} regenerated {i}", "web") for i in range(1, 30)],
        _SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    root2 = documents_artifact_root(spark, sf_dir, subset="all")
    assert root2 != root
    report = C.gc_artifacts(wh, min_age_s=0.0)
    assert name in report["dropped"]
    assert os.path.basename(root2) in report["kept"]
    assert not os.path.isdir(root)
    assert A.read_paragraphs(spark, root2).count() > 0
