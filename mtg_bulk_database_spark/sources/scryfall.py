"""Scryfall-shaped sources (SURVEY §2.1 S1-S6).

The reference's ingest front end is a driver-side catalog probe + bulk
download + streaming parse of one giant JSON array
(``import_cards.py:287-336, 351-353``). Spark-first version:

- the tiny REST calls (bulk-data catalog, sets list) stay driver-side —
  they're metadata, not data;
- the multi-GB bulk array is read by Spark's JSON source with an explicit
  schema. A single top-level JSON array forces ``multiLine`` (one-task
  parse), so for cluster-scale ingest we pre-split to JSONL once
  (``presplit_to_jsonl``) and get an embarrassingly-parallel scan —
  the distributed answer to ijson's O(1)-memory streaming claim.

Network calls are injectable (``fetch=``) so everything is testable
offline; nothing in the engine's hot path depends on them.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CARDS_RAW_SCHEMA, SETS_RAW_SCHEMA

BULK_DATA_URL = "https://api.scryfall.com/bulk-data"
SETS_URL = "https://api.scryfall.com/sets"

#: reference alias: configured "all_prints" means the "all_cards" bulk
#: entry (import_cards.py:304-307).
BULK_TYPE_ALIASES = {"all_prints": "all_cards"}

#: reference HTTP timeout (import_cards.py:264,299,328).
HTTP_TIMEOUT_S = 10


def default_fetch(url: str) -> dict:
    import requests

    resp = requests.get(url, timeout=HTTP_TIMEOUT_S)
    resp.raise_for_status()
    return resp.json()


def pick_bulk_entry(catalog: dict, bulk_type: str) -> dict:
    """S1 — select the bulk-data entry for the configured type
    (import_cards.py:304-311)."""
    wanted = BULK_TYPE_ALIASES.get(bulk_type, bulk_type)
    for entry in catalog.get("data", []):
        if entry.get("type") == wanted:
            return entry
    raise ValueError(f"no bulk-data entry of type {wanted!r}")


def fetch_bulk_metadata(
    bulk_type: str = "all_prints", fetch: Callable[[str], dict] = default_fetch
) -> dict:
    """Returns the catalog entry: ``download_uri``, ``updated_at`` (the
    freshness watermark, S2), size."""
    return pick_bulk_entry(fetch(BULK_DATA_URL), bulk_type)


def read_cards_json(
    spark: SparkSession, path: str, multiline: bool | None = None
) -> DataFrame:
    """S4 — schema'd scan of a Scryfall bulk file. ``multiLine`` is
    auto-detected: a ``.jsonl`` path is line-delimited (parallel scan),
    anything else is treated as one big JSON array."""
    if multiline is None:
        multiline = not path.endswith((".jsonl", ".ndjson"))
    return (
        spark.read.schema(CARDS_RAW_SCHEMA)
        .option("multiLine", "true" if multiline else "false")
        .json(path)
    )


def presplit_to_jsonl(src_path: str, dst_path: str, chunk_objects: int = 50_000) -> int:
    """One cheap sequential pass: JSON-array → JSONL so the distributed
    scan parallelizes (SURVEY §2.1 S4 scale note). Returns object count.

    Uses a streaming parser when available (ijson semantics); falls back
    to a stdlib incremental decoder — either way O(1) memory in file
    size, like the reference (import_cards.py:5-7).
    """
    n = 0
    with open(dst_path, "w", encoding="utf-8") as out:
        for obj in _iter_json_array(src_path):
            out.write(json.dumps(obj, separators=(",", ":")) + "\n")
            n += 1
    return n


def _iter_json_array(path: str) -> Iterable[dict]:
    try:
        import ijson  # pragma: no cover - not in this environment

        with open(path, "rb") as f:
            yield from ijson.items(f, "item")
        return
    except ImportError:
        pass
    # stdlib incremental fallback: raw_decode objects out of a sliding
    # buffer. EOF with undecodable leftovers (truncated array, missing
    # ']', non-array input) raises instead of spinning forever.
    dec = json.JSONDecoder()
    with open(path, encoding="utf-8") as f:
        buf = ""
        started = False
        eof = False
        while True:
            chunk = f.read(1 << 20)
            eof = chunk == ""
            buf += chunk
            if not started:
                lb = buf.find("[")
                if lb < 0:
                    if eof:
                        raise ValueError(
                            f"{path}: no top-level JSON array found"
                        )
                    continue
                buf = buf[lb + 1 :]
                started = True
            while True:
                buf = buf.lstrip().lstrip(",").lstrip()
                if buf.startswith("]"):
                    return
                if not buf:
                    if eof:
                        return  # tolerate a missing final ']' at clean EOF
                    break
                try:
                    obj, end = dec.raw_decode(buf)
                except json.JSONDecodeError:
                    if eof:
                        raise ValueError(
                            f"{path}: truncated JSON at end of array"
                        ) from None
                    break  # need more data
                yield obj
                buf = buf[end:]
            if eof:
                return


def read_sets_dataframe(
    spark: SparkSession, fetch: Callable[[str], dict] = default_fetch
) -> DataFrame:
    """S5 — sets REST source (~1k rows): driver-side GET, then a tiny
    schema'd DataFrame (import_cards.py:257-269)."""
    data = fetch(SETS_URL).get("data", [])
    projected = [
        {f.name: item.get(f.name) for f in SETS_RAW_SCHEMA.fields} for item in data
    ]
    return spark.createDataFrame(projected, SETS_RAW_SCHEMA)


def download_bulk_file(
    download_uri: str, dst_path: str, fetch_bytes: Callable[[str], bytes] | None = None
) -> str:
    """S3 — fetch the bulk JSON to local/object storage (driver or a
    single task; the distributed scan happens after).

    The default path STREAMS to disk in 8 MiB chunks — a real
    ``all_cards`` drop is multi-GB and buffering it in memory
    (``resp.content``) would contradict the module's O(1)-memory ingest
    claim and can OOM the driver. An injected ``fetch_bytes`` (tests)
    still takes the buffered path.
    """
    os.makedirs(os.path.dirname(dst_path) or ".", exist_ok=True)
    if fetch_bytes is not None:
        with open(dst_path, "wb") as f:
            f.write(fetch_bytes(download_uri))
        return dst_path

    import requests

    with requests.get(download_uri, timeout=HTTP_TIMEOUT_S, stream=True) as resp:
        resp.raise_for_status()
        with open(dst_path, "wb") as f:
            for chunk in resp.iter_content(chunk_size=8 * 1024 * 1024):
                f.write(chunk)
    return dst_path
