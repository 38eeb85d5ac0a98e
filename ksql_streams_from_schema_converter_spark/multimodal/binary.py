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


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("h0", T.IntegerType()),
        T.StructField("h1", T.IntegerType()),
        T.StructField("h2", T.IntegerType()),
        T.StructField("h3", T.IntegerType()),
    ]
)

#: dHash geometry: 8 rows x 9 cols of fake grayscale, 8 comparison
#: bits per row, banded 2 rows per 16-bit value
_DHASH_ROWS, _DHASH_COLS = 8, 9


def _fake_pixels(payload: bytes) -> list[int]:
    """STUB: deterministic fake for the decode+resize-to-9x8 step of a
    real dHash (a deployment does ``PIL.Image.open(...).convert('L')
    .resize((9, 8))`` here).  Pixel ``j`` is the payload byte at the
    proportional offset ``(j * len) // 72`` — deterministic, total
    (empty payload -> all-zero grid), and replayable in SQL over the
    fixture's ASCII text (``ord(substr(text, (j*strlen)//72 + 1, 1))``),
    which is what lets the near-dup gate be a value oracle instead of
    rows-only."""
    n = len(payload)
    grid = _DHASH_ROWS * _DHASH_COLS
    if n == 0:
        return [0] * grid
    return [payload[(j * n) // grid] for j in range(grid)]


def perceptual_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over binary payloads via
    Arrow-batched mapInPandas — the image near-dup signature (Krawetz's
    dHash; the standard pHash-family baseline).  Bit (r, c) = 1 iff
    fake-pixel[r][c] > fake-pixel[r][c+1]; the 64 bits are emitted as
    FOUR 16-bit band integers (rows 2i..2i+1 -> ``h{i}``), which (a)
    dodges BIGINT sign pain on both engines and (b) IS the LSH banding
    key layout near_dup_pairs shuffles on."""

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = [_dhash_bands(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "h0": pd.Series([h[0] for h in hs], index=pdf.index, dtype="int32"),
                    "h1": pd.Series([h[1] for h in hs], index=pdf.index, dtype="int32"),
                    "h2": pd.Series([h[2] for h in hs], index=pdf.index, dtype="int32"),
                    "h3": pd.Series([h[3] for h in hs], index=pdf.index, dtype="int32"),
                }
            )

    return media.mapInPandas(dhash, schema=DHASH_SCHEMA)


def _check_banding_exact(max_hamming: int) -> None:
    """The 4-band pigeonhole only guarantees a shared untouched band
    for Hamming distance <= bands - 1 = 3; a larger ``max_hamming``
    would SILENTLY miss pairs whose flipped bits hit all 4 bands —
    fail loudly instead of returning an incomplete answer (ADVICE
    r9)."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4x16 banding's "
            "exactness bound (pigeonhole guarantees a shared band only "
            "for distance <= 3); banded candidates would silently miss "
            "pairs — use more/narrower bands or brute force instead"
        )


def near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Hamming-banded near-duplicate pairs over dHash signatures — the
    same LSH discipline as dedup.py's MinHash banding, NEVER all-pairs:
    the 64-bit hash is already split into 4 disjoint 16-bit bands, and
    candidates are generated by exact-match joins on (band_idx, value)
    buckets.  By pigeonhole, any pair within Hamming distance 3 leaves
    at least one of the 4 bands untouched, so banding + verify is
    EXACT for ``max_hamming <= 3`` (the brute-force oracle proves it);
    the verify step re-checks the distance so >3-bit bucket collisions
    are dropped.

    Scale: one shuffle keyed by the 16-bit bucket per band; hot buckets
    (e.g. flat images hashing to 0) cost O(bucket^2) pairs, the
    standard LSH trade bounded by the 4x16 geometry, and the candidate
    join is AQE-skew-splittable.  The full 4-band signatures RIDE
    THROUGH the bucket join (4 ints per row), so the Hamming verify is
    a map-side expression on the join output — no re-join against the
    signature table, and the plan shape is scale-stable (the r10 probe
    caught the two verify joins flipping broadcast→shuffle at x64).
    Everything after the signature UDF is native Catalyst
    (bitwiseXOR + bit_count)."""
    _check_banding_exact(max_hamming)
    bands = hashes.select(
        F.col(id_col),
        *[F.col(f"h{i}") for i in range(4)],
        F.posexplode(F.array("h0", "h1", "h2", "h3")).alias("band", "v"),
    )
    a = bands.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"__a{i}") for i in range(4)],
        "band",
        "v",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"__b{i}") for i in range(4)],
        "band",
        "v",
    )
    ham = sum(
        F.bit_count(F.col(f"__a{i}").bitwiseXOR(F.col(f"__b{i}")))
        for i in range(4)
    ).cast("long")
    return (
        a.join(b, ["band", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _dhash_bands(payload: bytes) -> tuple[int, int, int, int]:
    """The 64-bit dHash of one payload as 4x16-bit band integers —
    shared by the whole-payload and per-frame signature paths."""
    px = _fake_pixels(payload)
    out = []
    for i in range(4):
        v = 0
        for k in range(16):
            r, c = 2 * i + k // 8, k % 8
            bit = 1 if px[r * 9 + c] > px[r * 9 + c + 1] else 0
            v = (v << 1) | bit
        out.append(v)
    return tuple(out)


FRAME_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("h0", T.IntegerType()),
        T.StructField("h1", T.IntegerType()),
        T.StructField("h2", T.IntegerType()),
        T.StructField("h3", T.IntegerType()),
    ]
)


def frame_dhash(media: DataFrame, n_frames: int = 8) -> DataFrame:
    """Per-frame perceptual dHash (the video twin of
    :func:`perceptual_dhash`): each payload is sliced into
    ``n_frames`` near-equal chunks with :func:`sample_frames`'s exact
    byte spans (frame ``i`` = bytes ``[i*L//n, (i+1)*L//n)``), each
    non-empty chunk gets the 4-band difference hash — one Arrow batch
    pass, 1 row in → up to ``n_frames`` rows out."""

    def hash_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"], strict=True):
                data = bytes(b)
                n = len(data)
                for i in range(n_frames):
                    chunk = data[i * n // n_frames : (i + 1) * n // n_frames]
                    if not chunk:
                        continue
                    ids.append(doc_id)
                    idxs.append(i)
                    hs.append(_dhash_bands(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "h0": pd.Series([h[0] for h in hs], dtype="int32"),
                    "h1": pd.Series([h[1] for h in hs], dtype="int32"),
                    "h2": pd.Series([h[2] for h in hs], dtype="int32"),
                    "h3": pd.Series([h[3] for h in hs], dtype="int32"),
                }
            )

    return media.mapInPandas(hash_frames, schema=FRAME_DHASH_SCHEMA)


def frame_near_dup_pairs(
    fhashes: DataFrame,
    max_hamming: int = 3,
    min_frames: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-level near-duplicate pairs from per-frame dHashes:
    candidates come from exact-match ``(frame_idx, band, value)``
    buckets — temporal alignment is IN the bucket key, so frame 3 of
    one video only ever meets frame 3 of another (the aligned-near-dup
    contract; never all-pairs), the same 4x16 pigeonhole making
    Hamming <= 3 exact per frame.  Verified pairs aggregate to
    ``(id_a, id_b, n_close_frames)`` and a pair is a near-dup when at
    least ``min_frames`` aligned frames are close — whole-video
    re-encodes and single-frame edits both land above any sane
    threshold, disjoint content lands at 0."""
    _check_banding_exact(max_hamming)
    bands = fhashes.select(
        F.col(id_col),
        "frame_idx",
        *[F.col(f"h{i}") for i in range(4)],
        F.posexplode(F.array("h0", "h1", "h2", "h3")).alias("band", "v"),
    )
    a = bands.select(
        F.col(id_col).alias("id_a"),
        "frame_idx",
        *[F.col(f"h{i}").alias(f"__a{i}") for i in range(4)],
        "band",
        "v",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        "frame_idx",
        *[F.col(f"h{i}").alias(f"__b{i}") for i in range(4)],
        "band",
        "v",
    )
    ham = sum(
        F.bit_count(F.col(f"__a{i}").bitwiseXOR(F.col(f"__b{i}")))
        for i in range(4)
    )
    # signatures ride through the aligned bucket join (near_dup_pairs
    # discipline — no verify re-join, scale-stable plan); a pair's
    # aligned frame can match in several bands, so dedup to one row per
    # (pair, frame) before counting close frames
    return (
        a.join(b, ["frame_idx", "band", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(ham <= max_hamming)
        .select("id_a", "id_b", "frame_idx")
        .distinct()
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_close_frames"))
        .where(F.col("n_close_frames") >= min_frames)
    )


PAYLOAD_EMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("v", T.ArrayType(T.DoubleType()), False),
    ]
)

#: the shared caption/media embedding space (the fixture's text
#: embeddings are 64-dim, so the media encoder stub emits 64-dim too)
CROSSMODAL_DIM = 64
#: centering offset for the byte-derived media features: raw bytes are
#: all-positive (ASCII text sits in 32..122), which would make EVERY
#: media pair high-cosine; subtracting ~the corpus byte mean restores
#: a signed, direction-meaningful space (measured: natural
#: caption-media |cosine| tops out ~0.61, media-media non-identical
#: ~0.78 — far below the 0.9 pairing threshold)
PAYLOAD_EMB_CENTER = 80


def payload_embedding(
    media: DataFrame,
    dim: int = CROSSMODAL_DIM,
    center: int = PAYLOAD_EMB_CENTER,
) -> DataFrame:
    """STUB media encoder: a deterministic stand-in for a CLIP-style
    image/audio tower (a deployment runs batched model inference here —
    exactly this Arrow-batched ``mapInPandas`` shape, which is why the
    plumbing is real even though the model is faked).  Component ``d``
    of the embedding is the payload byte at the proportional offset
    ``(d * len) // dim`` minus ``center`` — deterministic, total
    (empty payload → all-zero vector), and replayable in SQL over the
    fixture's ASCII text (``ord(substr(text, (d*strlen)//dim + 1, 1))``),
    which is what lets the cross-modal gate be a VALUE oracle instead
    of rows-only."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf["payload"]:
                data = bytes(b)
                n = len(data)
                if n == 0:
                    vecs.append([0.0] * dim)
                else:
                    vecs.append(
                        [float(data[(d * n) // dim] - center) for d in range(dim)]
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "v": vecs})

    return media.mapInPandas(encode, schema=PAYLOAD_EMB_SCHEMA)


def crossmodal_near_dup_pairs(
    captions: DataFrame,
    media_vecs: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = CROSSMODAL_DIM,
) -> DataFrame:
    """Caption ↔ media alignment ACROSS modalities (VERDICT r9 #2):
    both sides are sketched with the SAME deterministic random
    hyperplanes (operators/similarity.hyperplane_sketch — the shared
    embedding space is what makes one sketch family valid for both
    towers, the CLIP retrieval posture), candidates come from an
    exact-match bucket join on the sketch — NEVER all-pairs — and the
    verify step re-scores exact cosine, keeping pairs ≥ ``threshold``.

    ``captions`` is ``(vec_id, embedding)``, ``media_vecs`` is
    ``(doc_id, v)`` (from :func:`payload_embedding`); output is
    ``(caption_id, media_id, cosine)`` with cosine rounded to 4
    (the embedding_near_dup_pairs hash-gate discipline).

    Scale: one shuffle keyed by the n_planes-bit bucket on each side;
    bucket-skew is AQE-splittable; a caption whose direction equals
    its media twin's sketches into the SAME bucket with certainty, so
    planted/exact alignments have recall exactly 1 (merely-similar
    pairs are subject to the standard LSH recall trade)."""
    from ..operators.similarity import cosine, hyperplane_sketch

    ca = captions.select(
        F.col("vec_id").alias("caption_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    ca = ca.withColumn("__sk", hyperplane_sketch(F.col("cv"), n_planes, dim))
    me = media_vecs.select(
        F.col("doc_id").alias("media_id"),
        F.col("v").alias("mv"),
        hyperplane_sketch(F.col("v"), n_planes, dim).alias("__sk"),
    )
    return (
        ca.join(me, "__sk")
        .select(
            "caption_id",
            "media_id",
            cosine(F.col("cv"), F.col("mv")).alias("__cos"),
        )
        .where(F.col("__cos") >= threshold)
        .select(
            "caption_id", "media_id", F.round("__cos", 4).alias("cosine")
        )
    )


# ---------------------------------------------------------------------------
# Cross-modal top-k retrieval (r10) — the SEARCH complement of
# crossmodal_near_dup_pairs, exact end-to-end
# ---------------------------------------------------------------------------

#: fixed-point scale for caption (float) embeddings; media vectors are
#: already integral (byte - center), so they stay at scale 1 — cosine
#: is scale-invariant, and mixed scales keep every product inside
#: BIGINT/DECIMAL(38,0)
XMODAL_Q_SCALE = 1_000_000


def _int_sketch(qv_col, n_planes: int, dim: int):
    """Hyperplane sketch over an INTEGER vector column: bit p is the
    sign of the exact integer projection against the md5-derived ±1
    plane (operators/similarity.hyperplane_weights).  Unlike the float
    sketch, the projection is an integer sum — engine-exact, so a SQL
    oracle can replay the bits verbatim (the float sketch's summation
    order can never hash across engines)."""
    from ..operators.similarity import hyperplane_weights

    bits = []
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(int(w)) for w in hyperplane_weights(p, dim)]
        )
        proj = F.aggregate(
            F.zip_with(qv_col, plane, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def crossmodal_topk(
    captions: DataFrame,
    media_vecs: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int = CROSSMODAL_DIM,
) -> DataFrame:
    """Top-k media per caption — cross-modal RETRIEVAL (the CLIP
    text→image search posture), where :func:`crossmodal_near_dup_pairs`
    is the dedup join.  Exact end-to-end, which no float pipeline can
    be: captions quantize to BIGINT micro-units (the k-means
    discipline), media vectors are already integral, both towers
    sketch with the SAME ±1 hyperplane family via exact integer
    projections, candidates come from an exact-match bucket join —
    never all-pairs — and ranking uses the exact integer key

        cos2_micro = (dot·1000)² div (|c|²·|m|²),  dot >= 0

    (monotone in cosine on the non-negative side, so the (cos2_micro
    DESC, media_id) election is the exact cosine ranking with a
    deterministic tie-break — floats never enter the ordering).

    Output: ``(caption_id, rank, media_id, cos2_micro)`` for ranks
    1..k per caption (captions with no same-bucket candidate emit
    nothing — the LSH recall trade, measured by the probe families).

    Scale: one bucket-keyed shuffle per side, AQE-splittable bucket
    skew; the per-caption election is a caption-keyed window (bounded
    by the caption's candidate count — never a global sort)."""
    from pyspark.sql import Window

    ca = captions.select(
        F.col("vec_id").alias("caption_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * XMODAL_Q_SCALE).cast("bigint"),
        ).alias("cq"),
    )
    ca = ca.select(
        "caption_id",
        "cq",
        _int_sketch(F.col("cq"), n_planes, dim).alias("__sk"),
        F.aggregate(
            F.expr("transform(cq, x -> x * x)"),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("na"),
    )
    me = media_vecs.select(
        F.col("doc_id").alias("media_id"),
        F.transform(F.col("v"), lambda x: x.cast("bigint")).alias("mq"),
    )
    me = me.select(
        "media_id",
        "mq",
        _int_sketch(F.col("mq"), n_planes, dim).alias("__sk"),
        F.aggregate(
            F.expr("transform(mq, x -> x * x)"),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("nb"),
    )
    cand = (
        ca.join(me, "__sk")
        .where(F.col("na") > 0)
        .where(F.col("nb") > 0)
        .select(
            "caption_id",
            "media_id",
            F.aggregate(
                F.zip_with("cq", "mq", lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("dot"),
            "na",
            "nb",
        )
        .where(F.col("dot") >= 0)
        .select(
            "caption_id",
            "media_id",
            F.expr(
                "CAST(CAST(dot * 1000 AS DECIMAL(19,0)) * CAST(dot * 1000 AS DECIMAL(19,0)) * 1000000 "
                "div (CAST(na AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0)) * 1000000) AS BIGINT)"
            ).alias("cos2_micro"),
        )
    )
    w = Window.partitionBy("caption_id").orderBy(
        F.desc("cos2_micro"), "media_id"
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("caption_id", "rank", "media_id", "cos2_micro")
    )


def crossmodal_topk_oracle_sql(
    k: int = 3,
    n_planes: int = 8,
    dim: int = CROSSMODAL_DIM,
    center: int = PAYLOAD_EMB_CENTER,
    cap_off: int = 1_000_000,
    plant_mod: int = 25,
) -> str:
    """DuckDB replay of :func:`crossmodal_topk` over the driver views:
    media vectors re-derived from the fixture payload bytes, captions
    = embeddings plus the planted ×2 media twins, the ±1 plane weights
    baked as literals (they are md5-derived constants), integer
    sketches, the bucket join, the exact cos2_micro key and the
    (key DESC, media_id) row_number election."""
    from ..operators.similarity import hyperplane_weights

    planes = ", ".join(
        "({}, [{}])".format(
            p, ", ".join(str(int(w)) for w in hyperplane_weights(p, dim))
        )
        for p in range(n_planes)
    )
    return f"""
    WITH planes AS MATERIALIZED (
      SELECT * FROM (VALUES {planes}) AS t(p, w)
    ),
    mv AS MATERIALIZED (
      SELECT doc_id AS media_id,
             list_transform(range(0, {dim}), d ->
               CAST(ord(substr(text,
                               CAST((d * strlen(text)) // {dim} AS BIGINT) + 1,
                               1)) - {center} AS BIGINT)) AS mq
      FROM documents WHERE strlen(text) > 0
    ),
    cap0 AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
      UNION ALL
      SELECT media_id + {cap_off} AS vec_id,
             list_transform(mq, x -> CAST(x * 2 AS DOUBLE)) AS embedding
      FROM mv WHERE media_id % {plant_mod} = 0
    ),
    ca AS MATERIALIZED (
      SELECT vec_id AS caption_id,
             list_transform(embedding,
               x -> CAST(floor(x * {XMODAL_Q_SCALE}) AS BIGINT)) AS cq
      FROM cap0
    ),
    cas AS MATERIALIZED (
      SELECT caption_id, cq, na,
             string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END,
                        '' ORDER BY p) AS sk
      FROM (
        SELECT caption_id, cq, pw.p,
               list_sum(list_transform(generate_series(1, {dim}),
                 d -> cq[d] * pw.w[d])) AS proj,
               CAST(list_sum(list_transform(cq, x -> x * x)) AS BIGINT) AS na
        FROM ca, planes pw
      ) GROUP BY caption_id, cq, na
    ),
    mes AS MATERIALIZED (
      SELECT media_id, mq, nb,
             string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END,
                        '' ORDER BY p) AS sk
      FROM (
        SELECT media_id, mq, pw.p,
               list_sum(list_transform(generate_series(1, {dim}),
                 d -> mq[d] * pw.w[d])) AS proj,
               CAST(list_sum(list_transform(mq, x -> x * x)) AS BIGINT) AS nb
        FROM mv, planes pw
      ) GROUP BY media_id, mq, nb
    ),
    cand AS MATERIALIZED (
      SELECT caption_id, media_id,
             CAST(list_sum(list_transform(generate_series(1, {dim}),
                  d -> c.cq[d] * m.mq[d])) AS BIGINT) AS dot,
             na, nb
      FROM cas c JOIN mes m USING (sk)
      WHERE na > 0 AND nb > 0
    ),
    scored AS (
      SELECT caption_id, media_id,
             CAST((CAST(dot AS HUGEINT) * 1000) * (dot * 1000) * 1000000 //
                  (CAST(na AS HUGEINT) * nb * 1000000) AS BIGINT)
               AS cos2_micro
      FROM cand WHERE dot >= 0
    ),
    ranked AS (
      SELECT caption_id, media_id, cos2_micro,
             CAST(row_number() OVER (PARTITION BY caption_id
                  ORDER BY cos2_micro DESC, media_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT caption_id, rank, media_id, cos2_micro
    FROM ranked WHERE rank <= {k}
    """
