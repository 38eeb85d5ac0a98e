"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (the container has no image/audio libs): a
clearly-marked deterministic fake stands in for pillow/ffmpeg, while the
Spark-side plumbing — schema, partition-parallel batch iteration, UDF
signature, Arrow batch shape — is real and tested. On a real cluster
you replace ``_fake_decode`` with the actual library call; nothing else
changes.

Scale notes: ``mapInPandas`` streams Arrow batches per partition, so
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of corpus size; heavy media should also set a small
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits in
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("thumb_width", T.IntegerType()),
    ]
)


def attach_fake_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from the documents fixture: the text bytes
    stand in for an image payload; metadata columns are typed."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.length(text_col) % 640 + 1).cast("int").alias("meta_width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("meta_height"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """STUB: deterministic fake for the image decode step.

    A real deployment does ``PIL.Image.open(io.BytesIO(payload))`` here;
    this container has no imaging libs, so we derive a fake "pixel mean"
    from the bytes themselves — deterministic, so tests are stable.
    """
    if payload is None or len(payload) == 0:
        return [0.0]  # a real decoder would reject; the fake stays total
    return [sum(payload[:256]) / min(len(payload), 256)]


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas (the real
    plumbing; the decoder itself is the stub above)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat_mean": pdf["payload"].map(lambda b: _fake_decode(bytes(b))[0]),
                    "thumb_width": (pdf["meta_width"] // 2).astype("int32"),
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
