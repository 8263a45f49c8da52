"""Artifact lifecycle: warehouse root, catalog, garbage collection
(VERDICT r10 #5 — "the operational face of the durable-artifact
feature").

``documents_artifact_root`` keys each artifact root on the corpus's
content signature, which makes serving correct but leaves a lifecycle
gap: when a corpus is regenerated, its OLD root becomes unreachable
garbage that nothing would ever delete (previously it sat under
``tempfile.gettempdir()`` awaiting OS tmp-cleaning).  This module
closes the loop:

- **Warehouse root**: a configurable location for every artifact root
  — the ``SPARK_GRAFT_ARTIFACT_WAREHOUSE`` environment variable, else
  ``<tmp>/spark_graft_artifacts`` (the historical default, so the
  driver sandbox needs no configuration).
- **Catalog**: one JSONL record per built root (root name, source
  path, size/mtime_ns signature, format, subset, splitter, created
  at).  A JSONL file rather than a ledger table deliberately: the
  catalog is |corpora|-row driver-side metadata that must be readable
  BEFORE any SparkSession exists (GC is an ops script), and one
  O_APPEND line per build is atomic on POSIX.  The ledger covers the
  data; this covers the directory of ledgers.
- **GC**: :func:`gc_artifacts` drops roots whose corpus signature no
  longer resolves (source file deleted, or re-stat disagrees with the
  recorded size/mtime_ns — a regenerated corpus necessarily gets a
  NEW root, stranding the old one) once they exceed a minimum age,
  vacuums the live roots (``artifacts.vacuum_artifacts`` — dead
  versions, beaten-writer orphans), stamps ``last_vacuum``, and
  compacts the catalog.  Uncataloged directories (from pre-catalog
  builds) are reported, never deleted — GC only reclaims what it can
  prove stale.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

#: environment override for the warehouse location — the production
#: deployment points this at a durable volume; unset, the driver
#: sandbox default keeps everything under the OS temp dir
WAREHOUSE_ENV = "SPARK_GRAFT_ARTIFACT_WAREHOUSE"

_CATALOG_FILE = "_CATALOG.jsonl"


def warehouse_root() -> str:
    return os.environ.get(WAREHOUSE_ENV) or os.path.join(
        tempfile.gettempdir(), "spark_graft_artifacts"
    )


def _catalog_path(warehouse: str) -> str:
    return os.path.join(warehouse, _CATALOG_FILE)


def register_artifact_root(
    root: str,
    source_path: str,
    source_size: int,
    source_mtime_ns: int,
    fmt: int,
    subset: str,
    splitter: str,
    warehouse: str | None = None,
) -> None:
    """Append the root's build record to the warehouse catalog — one
    JSON line, O_APPEND-atomic.  Re-registration of the same root
    (racing builders, a replayed bootstrap) is harmless: the catalog
    reader keeps the newest record per root."""
    wh = warehouse or warehouse_root()
    os.makedirs(wh, exist_ok=True)
    rec = {
        "root": os.path.basename(os.path.normpath(root)),
        "source_path": os.path.abspath(source_path),
        "source_size": source_size,
        "source_mtime_ns": source_mtime_ns,
        "format": fmt,
        "subset": subset,
        "splitter": splitter,
        "created_at": time.time(),
    }
    line = json.dumps(rec) + "\n"
    fd = os.open(
        _catalog_path(wh), os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644
    )
    try:
        os.write(fd, line.encode("utf-8"))
    finally:
        os.close(fd)


def catalog_entries(warehouse: str | None = None) -> dict[str, dict]:
    """Newest record per root name (torn/corrupt lines skipped — the
    catalog is advisory metadata; data correctness never depends on
    it)."""
    wh = warehouse or warehouse_root()
    out: dict[str, dict] = {}
    try:
        with open(_catalog_path(wh), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    out[rec["root"]] = rec
                except (json.JSONDecodeError, KeyError, TypeError):
                    continue
    except FileNotFoundError:
        pass
    return out


def _rewrite_catalog(warehouse: str, entries: dict[str, dict]) -> None:
    tmp = os.path.join(warehouse, f".catalog_{os.getpid()}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        for rec in entries.values():
            f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _catalog_path(warehouse))


def _signature_resolves(rec: dict) -> bool:
    """Does the recorded corpus signature still describe the live
    source file?  A regenerated/deleted corpus fails this — its root
    can never be resolved again (the accessor keys roots on the
    CURRENT signature) and is safe to reclaim."""
    try:
        st = os.stat(rec["source_path"])
    except OSError:
        return False
    return (
        st.st_size == rec.get("source_size")
        and st.st_mtime_ns == rec.get("source_mtime_ns")
    )


def gc_artifacts(
    warehouse: str | None = None,
    min_age_s: float = 3600.0,
    vacuum_live: bool = True,
    retain_versions: int = 2,
) -> dict:
    """Reclaim stale artifact roots and maintain live ones.

    - Cataloged roots whose signature no longer resolves AND whose
      record is older than ``min_age_s`` are deleted outright (their
      corpus can never request them again); younger stale roots are
      left for the next sweep (an in-flight regeneration may still
      have pinned readers).
    - Live roots are vacuumed (``vacuum_artifacts``) when
      ``vacuum_live``, and their records stamped ``last_vacuum``.
    - Directories with no catalog record are only REPORTED
      (``uncataloged``): GC deletes nothing it cannot prove stale.

    Returns ``{"dropped": [...], "kept": [...], "vacuumed": {root:
    n_deleted_files}, "uncataloged": [...]}``."""
    from .artifacts import vacuum_artifacts

    wh = warehouse or warehouse_root()
    if not os.path.isdir(wh):
        return {"dropped": [], "kept": [], "vacuumed": {},
                "uncataloged": []}
    entries = catalog_entries(wh)
    now = time.time()
    dropped: list[str] = []
    kept: list[str] = []
    vacuumed: dict[str, int] = {}
    for name, rec in list(entries.items()):
        full = os.path.join(wh, name)
        if _signature_resolves(rec):
            kept.append(name)
            if vacuum_live and os.path.isdir(full):
                deleted = vacuum_artifacts(
                    full,
                    retain_versions=retain_versions,
                    orphan_min_age_s=min_age_s,
                )
                vacuumed[name] = sum(len(v) for v in deleted.values())
                rec["last_vacuum"] = now
            continue
        if now - rec.get("created_at", 0.0) < min_age_s:
            kept.append(name)
            continue
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        del entries[name]
        dropped.append(name)
    uncataloged = sorted(
        d
        for d in os.listdir(wh)
        if os.path.isdir(os.path.join(wh, d)) and d not in entries
        and d not in dropped
    )
    _rewrite_catalog(wh, entries)
    return {
        "dropped": dropped,
        "kept": sorted(kept),
        "vacuumed": vacuumed,
        "uncataloged": uncataloged,
    }
