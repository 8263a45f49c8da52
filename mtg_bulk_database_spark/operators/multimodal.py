"""Multimodal column plumbing (north-star extension): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The Spark-side architecture here is real and tested — schema contract,
batch iteration, partition sizing, UDF signatures. The actual media
decode is STUBBED (the decode libraries aren't in this environment):
``decode_image_stub`` derives deterministic fake dimensions from the
byte content and is clearly marked; swap ``_fake_decode`` for
PIL/torchaudio/pyav in production — the plumbing doesn't change.

Scale notes: binary payloads ride the columnar format (parquet/Delta
handle multi-MB binary cells; at 100 TB prefer pointer+object-store for
>10 MB blobs). ``mapInPandas`` streams Arrow batches, so executor memory
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × average
blob size — size those together.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("declared_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media-column shape (text bytes
    stand in for image payloads — the schema/partitioning contract is
    what's under test)."""
    return docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic stand-in for a real image decode.

    Production: ``img = PIL.Image.open(io.BytesIO(payload))`` and return
    ``img.size + (len(img.getbands()),)``. Here: fake dimensions derived
    from the byte length so tests are reproducible without media libs.
    """
    n = len(payload)
    return (n % 1024 + 1, n % 768 + 1, 3)


def decode_images(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas streams record batches
    through the (stubbed) decoder; output schema is the typed feature
    contract downstream stages rely on."""
    import pandas as pd

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content_bytes": pdf["content"].map(len).astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_channels": pd.Series([d[2] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-columnar metadata pass (no Python): byte sizes + declared
    sizes — the cheap pre-filter before any decode fan-out."""
    return media.select(
        "doc_id",
        F.octet_length("content").alias("content_bytes"),
        F.col("meta.declared_bytes").alias("declared_bytes"),
        "media_type",
    )
