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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def resize_media(media: DataFrame, target_width: int = 64) -> DataFrame:
    """Resize (downsample) each payload to roughly ``target_width``.

    STUB resize: a real deployment calls ``PIL.Image.resize`` /
    ``cv2.resize`` on the decoded pixels; here the deterministic fake
    keeps every ``stride``-th byte where
    ``stride = max(1, meta_width // target_width)``, and scales the
    metadata by the same factor (ceil division). The Spark plumbing —
    1:1 Arrow-batched mapInPandas producing a new binary payload plus
    recomputed typed metadata — is exactly what the real kernel needs.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stride = (pdf["meta_width"] // target_width).clip(lower=1).astype("int64")
            payload = [
                bytes(b)[::s] for b, s in zip(pdf["payload"], stride, strict=True)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": payload,
                    "meta_width": (-(-pdf["meta_width"] // stride)).astype("int32"),
                    "meta_height": (-(-pdf["meta_height"] // stride)).astype("int32"),
                    "n_bytes": pd.Series(
                        [len(p) for p in payload], index=pdf.index, dtype="int32"
                    ),
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 8) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames from each payload
    (video-style 1 row → N rows fan-out via mapInPandas).

    STUB frame decode: a real deployment seeks ``n_frames`` keyframes
    with ffmpeg; the deterministic fake slices the byte payload into
    ``n_frames`` near-equal chunks (frame ``i`` spans bytes
    ``[i*L//n, (i+1)*L//n)``) and emits each chunk's size + md5. Empty
    chunks (payload shorter than ``n_frames``) are skipped, as a real
    sampler would skip past-EOF seeks.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"], strict=True):
                data = bytes(b)
                n = len(data)
                for i in range(n_frames):
                    chunk = data[i * n // n_frames : (i + 1) * n // n_frames]
                    if not chunk:
                        continue
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(chunk))
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """:func:`extract_media_features` on Spark 4's ``mapInArrow``: the same
    per-batch logic against raw ``pyarrow.RecordBatch`` — no
    Arrow→pandas→Arrow conversion at the boundary, which removes the
    pandas materialization cost for binary-heavy columns (payload
    bytes stay in Arrow buffers until sliced).  Output is byte-
    identical to the pandas path (asserted in tests); a deployment
    keeping decoded tensors in Arrow extension arrays would build on
    this entry point."""
    import pyarrow as pa

    def extract(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        import hashlib

        for rb in batches:
            # Iterating a pyarrow array yields pa scalars (never Python
            # None) — as_py() is what surfaces nulls as None.  A null
            # payload therefore crashes at len()/md5() below, exactly
            # like the mapInPandas path's .map(len); the fixture has no
            # null payloads and both paths stay byte-identical.
            payloads = rb.column("payload").to_pylist()
            widths = rb.column("meta_width").to_pylist()
            out = pa.RecordBatch.from_pydict(
                {
                    "doc_id": rb.column("doc_id"),
                    "media_type": rb.column("media_type"),
                    "n_bytes": pa.array(
                        [len(b) for b in payloads], type=pa.int32()
                    ),
                    "checksum": pa.array(
                        [hashlib.md5(b).hexdigest() for b in payloads]
                    ),
                    "feat_mean": pa.array(
                        [_fake_decode(b)[0] for b in payloads],
                        type=pa.float64(),
                    ),
                    "thumb_width": pa.array(
                        [w // 2 for w in widths], type=pa.int32()
                    ),
                }
            )
            yield out

    return media.mapInArrow(extract, schema=FEATURE_SCHEMA)
