"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schema, binaryFile ingestion, Arrow-batched
mapInPandas decode, partitioning) is real and tested; the codec step itself
is a clearly-marked deterministic stub because no image/audio libraries ship
in this container (BASELINE north-star: "STUB the decode step ... make the
Spark-side plumbing real").

Pattern at 100 TB: content stays in the lake, tasks stream batches through
Arrow; decode fan-out is CPU-bound so `repartition` by content hash spreads
skew (one 4 GB video shouldn't pin a task — split by byte-range upstream).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def read_media_dir(spark: SparkSession, root: str, kind: str = "image") -> DataFrame:
    """Ingest a directory of blobs as a media table (binaryFile source —
    distributed listing + lazy content read, SURVEY §2.1 O12 mapping)."""
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return raw.select(
        F.md5("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def _stub_decode(content: bytes, dim: int = 8) -> list[float]:
    """DETERMINISTIC FAKE decoder. A real deployment plugs Pillow/librosa/
    ffmpeg in here; the container has none, so features are derived from a
    sha256 of the bytes — stable, testable, and shaped exactly like a real
    feature vector."""
    digest = hashlib.sha256(content or b"").digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                rows.append(
                    (
                        r.media_id,
                        r.kind,
                        len(content),
                        hashlib.sha256(content).hexdigest(),
                        _stub_decode(content, dim),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "digest", "features"]
            )

    return media.select("media_id", "kind", "content").mapInPandas(run, FEATURE_SCHEMA)


def decode_image(content: bytes):
    """Real pixel decode — NOT IMPLEMENTED in this container (no Pillow /
    libjpeg). The Spark-side plumbing around it (schema, batching,
    partitioning) is real and tested; plug a codec in here for production."""
    raise NotImplementedError("image codecs are not available in this container")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: validates the plumbing (binary in → binary out with
    updated meta); a real implementation calls decode_image + resample in
    place of the passthrough."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Passthrough content; a real impl decodes+resamples here.
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return media.select("media_id", "content").mapInPandas(run, schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stub for video rows: emits one row per fake frame
    timestamp derived from content length (plumbing: one input row → N output
    rows through mapInPandas, the UDTF shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                n = len(r.content or b"")
                n_frames = max(1, min(5, n // 64))
                for i in range(n_frames):
                    rows.append((r.media_id, i * every_ms, _stub_decode(r.content or b"", 4)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "frame_features"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame_features", T.ArrayType(T.FloatType())),
        ]
    )
    return media.select("media_id", "content").mapInPandas(run, schema)


@query("q60_media_features")
def q60_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline round-trip (rows-only: binary I/O). Builds a tiny
    blob tree under /tmp, ingests via binaryFile, extracts stub features,
    and returns a per-kind profile."""
    import os
    import shutil
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "spark_graft_media_fixture")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "nested"))
    for i in range(6):
        with open(os.path.join(root, "nested" if i % 2 else "", f"blob{i}.bin"), "wb") as f:
            f.write(bytes([i]) * (64 * (i + 1)))

    media = read_media_dir(spark, root, kind="image")
    feats = extract_features(media)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("digest").alias("n_distinct"),
        F.round(F.sum(F.element_at("features", 1)), 4).alias("f0_sum"),
    )


@query("q61_media_similarity")
def q61_media_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline (rows-only): binaryFile ingest → 
    Arrow-batched stub decode to feature vectors → exact cosine top-1
    neighbour per blob via the similarity tier. This is the shape of an
    image-dedup / frame-retrieval pipeline with real codecs dropped in.

    Scale: decode is mapInPandas (CPU-bound, partition-parallel); the ANN
    step reuses operators/similarity (broadcast queries or LSH cells)."""
    import os
    import shutil
    import tempfile
    import uuid

    from ..operators.similarity import cosine_topk

    root = os.path.join(tempfile.gettempdir(), f"spark_graft_media_sim_{uuid.uuid4().hex[:8]}")
    os.makedirs(os.path.join(root, "nested"))
    # 8 blobs; pairs (0,1), (2,3), ... share content prefixes so their stub
    # features correlate deterministically
    for i in range(8):
        payload = bytes([i // 2]) * 256 + bytes([i]) * 32
        sub = "nested" if i % 3 == 0 else ""
        with open(os.path.join(root, sub, f"m{i}.bin"), "wb") as f:
            f.write(payload)

    media = read_media_dir(spark, root, kind="image")
    feats = extract_features(media, dim=16)
    vecs = feats.select(
        F.abs(F.hash("media_id")).alias("vec_id"),
        F.col("features").cast("array<float>").alias("embedding"),
    )
    top1 = cosine_topk(vecs, vecs, k=1)
    rows = top1.collect()  # materialize before cleanup
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, top1.schema)


def extract_features_arrow(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-NATIVE feature extraction (mapInArrow): operates directly on
    pyarrow RecordBatches — no pandas materialization of the binary column,
    which matters when batches carry hundreds of MB of image/video bytes
    (pandas would copy every blob into Python objects; Arrow keeps them as
    zero-copy buffers until the digest loop touches them)."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            media_ids = batch.column("media_id").to_pylist()
            kinds = batch.column("kind").to_pylist()
            contents = batch.column("content").to_pylist()
            n_bytes, digests, feats = [], [], []
            for c in contents:
                c = c or b""
                n_bytes.append(len(c))
                digests.append(hashlib.sha256(c).hexdigest())
                feats.append(_stub_decode(c, dim))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(media_ids, pa.string()),
                    pa.array(kinds, pa.string()),
                    pa.array(n_bytes, pa.int64()),
                    pa.array(digests, pa.string()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "digest", "features"],
            )

    return media.select("media_id", "kind", "content").mapInArrow(run, FEATURE_SCHEMA)
