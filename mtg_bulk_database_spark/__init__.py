"""mtg_bulk_database_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (``JakeTurner616/mtg-bulk-database``, a PostgreSQL card-database
ETL + indexed-query system), re-expressed Spark-first:

- ``schemas``   — explicit StructTypes for the ``cards``/``sets`` data model
                  (reference ``mtg-database/init.sql:34-124``).
- ``sources``   — ingest: Scryfall-shaped JSON readers, JSONL pre-split,
                  REST catalog probe (reference ``import_cards.py:287-336``).
- ``ingest``    — the transform layer (projection, coercion, validation,
                  multiface aggregation; reference ``import_cards.py:150-212``)
                  and the MERGE upsert sink (``import_cards.py:214-255``).
- ``operators`` — the query-operator library: the reference's declared access
                  paths (``init.sql:126-146``) plus large-scale pipeline
                  operators (dedup, similarity search, text analysis,
                  multimodal columns).
- ``functions`` — shared column-expression helpers (tokenization, FTS,
                  vector math) kept JVM-side via pyspark.sql.functions.
- ``streaming`` — Structured Streaming variants (incremental ingest,
                  windowed event aggregation).
- ``plans``     — plan-inspection utilities used by tests to assert
                  pushdown / broadcast / codegen properties.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and AQE; Python UDFs appear only where semantics require
them and are Arrow-vectorized.
"""

__version__ = "0.1.0"
