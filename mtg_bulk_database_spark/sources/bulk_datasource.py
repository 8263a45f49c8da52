"""Custom Spark 4 Python DataSource for the bulk card feed (S4's scan as
a first-class pluggable source instead of a helper function).

``spark.dataSource.register(ScryfallBulkDataSource)`` then

    spark.read.format("scryfall_bulk")
         .option("path", cards_jsonl)
         .option("partitions", "8")
         .load()

yields an envelope of ``(id, name, raw)`` where ``raw`` is the card's
original JSON text. The split is done the way every distributed text
reader does it (reference behavior: the importer streams one JSON array
sequentially, ``import_cards.py:5-7`` — this source is the
parallel-scan upgrade):

- the planner cuts the file into byte ranges of roughly equal size
  (``partitions()`` — pure metadata, no data read on the driver);
- each task seeks to its range start, skips forward to the first
  newline (that partial line belongs to the PREVIOUS range), and reads
  records until it crosses its range end — so every line is owned by
  exactly one partition regardless of where the cuts land.

Parsing stays minimal in Python (one ``json.loads`` per line to lift
the id/name keys); the full typed decode belongs to the engine —
``with_parsed_cards`` applies ``from_json(CARDS_RAW_SCHEMA)`` JVM-side,
so schema projection and null handling ride whole-stage codegen, not
Python. At 100 TB the same planner logic runs over an object-store
listing (one range set per blob) and the envelope pattern is how you
keep a Python source from becoming the bottleneck: IO + framing in
Python, everything else in the JVM.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ENVELOPE_DDL = "id string, name string, raw string"


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class _BulkReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("scryfall_bulk: option 'path' is required")
        self.n_parts = int(options.get("partitions", "8"))

    def partitions(self):
        size = os.path.getsize(self.path)
        n = max(1, min(self.n_parts, size))  # at least 1 byte per range
        step = size // n or 1
        cuts = list(range(0, size, step))[:n] + [size]
        return [
            _Range(self.path, lo, hi)
            for lo, hi in zip(cuts, cuts[1:])
            if hi > lo
        ]

    def read(self, partition: _Range):
        with open(partition.path, "rb") as f:
            if partition.start > 0:
                f.seek(partition.start - 1)
                # the line straddling the cut belongs to the PREVIOUS
                # range; skip to the first line starting in ours
                f.readline()
            # a line is OWNED here iff it STARTS in [start, end) — a
            # line beginning exactly at `end` belongs to the next range
            while f.tell() < partition.end:
                line = f.readline()
                if not line:
                    break
                s = line.strip()
                if not s:
                    continue
                obj = json.loads(s)
                yield (
                    obj.get("id"),
                    obj.get("name"),
                    s.decode("utf-8"),
                )


class ScryfallBulkDataSource(DataSource):
    """Envelope source: partitioned JSONL framing in Python, typed
    decode left to the JVM (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "scryfall_bulk"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema) -> _BulkReader:
        return _BulkReader(self.options)


def with_parsed_cards(envelope: DataFrame) -> DataFrame:
    """JVM-side typed decode of the envelope's raw JSON — the engine
    half of the source contract (codegen'd, columnar; never row-at-a-
    time Python)."""
    from ..schemas import CARDS_RAW_SCHEMA

    return envelope.select(
        F.from_json("raw", CARDS_RAW_SCHEMA).alias("card")
    ).select("card.*")
