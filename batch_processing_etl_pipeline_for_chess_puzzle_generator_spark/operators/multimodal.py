"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
processed through ``mapInPandas`` (Arrow-batched — the only sane way to
move binary blobs between JVM and Python). The DECODE step is stubbed:
this container has no image/audio libraries, so ``decode_image_batch``
raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic fake decoder (payload-hash-seeded dimensions) so the
Spark-side plumbing — schema, batching, partition flow — is fully
exercised by tests.

Scale notes: binary payloads never hit a shuffle (the pipeline is
scan → mapInPandas → write); metadata-only columns are projected for
any grouping, so the heavy bytes stay columnar in parquet until the
Arrow batch that decodes them.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("created_ts", T.LongType()),
    ])),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload_hash", T.LongType()),
])


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived
    from a stable payload hash."""
    import hashlib

    h = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return 16 + h % 1024, 16 + (h >> 32) % 1024


def decode_image_batch(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — wire PIL/libvips here in a full deployment."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips, not present in this environment; "
        "use extract_media_features(fake=True) for the deterministic stub"
    )


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary column → per-item features via Arrow-batched mapInPandas.

    The UDF sees pandas DataFrames of whole rows (payload included) in
    Arrow batches; output is a typed features table. Decode is the only
    Python step and it is batch-local — everything before/after stays
    JVM-side.
    """
    decode = _fake_decode if fake else (lambda p: decode_image_batch(p))

    def process(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            dims = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "payload_hash": [
                    int.from_bytes(hashlib.md5(bytes(p)).digest()[:8], "big") >> 1
                    for p in pdf["payload"]
                ],
            })

    return media.mapInPandas(process, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_payload", T.BinaryType()),
])


def resize_image_batch(payload: bytes, width: int, height: int) -> bytes:
    """Real resize hook — wire PIL/libvips here in a full deployment."""
    raise NotImplementedError(
        "image resize requires PIL/libvips; use resize_images(fake=True)"
    )


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = False) -> DataFrame:
    """binary → binary transform (the resize/recompress shape).

    Payload bytes go JVM → Arrow batch → Python → Arrow → JVM exactly
    once; no shuffle touches them (narrow map only). The fake path
    emits an md5-tagged payload so tests can assert determinism and
    batch flow without an imaging lib.
    """

    def process(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if fake:
                out = [
                    hashlib.md5(bytes(p)).digest() + width.to_bytes(2, "big")
                    + height.to_bytes(2, "big")
                    for p in pdf["payload"]
                ]
            else:
                out = [resize_image_batch(bytes(p), width, height)
                       for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out,
                "width": width,
                "height": height,
            })

    return media.mapInPandas(process, schema=RESIZED_SCHEMA)


def extract_frames_batch(payload: bytes, every_n: int) -> list[bytes]:
    """Real frame-sampler hook — wire pyav/ffmpeg here in deployment."""
    raise NotImplementedError(
        "frame sampling requires pyav/ffmpeg; use sample_frames(fake=True)"
    )


def sample_frames(media: DataFrame, every_n: int = 10,
                  fake: bool = False) -> DataFrame:
    """Video → frame rows (1-to-many mapInPandas — the explode shape
    for binary payloads, keeping Arrow batching on both sides).

    The fake sampler emits ⌈n_bytes / 256⌉ capped at 8 deterministic
    frames per payload so partitioning/row-fanout is real in tests.
    """

    def process(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                if fake:
                    n_frames = min(8, max(1, len(raw) // 256))
                    frames = [
                        hashlib.md5(raw + i.to_bytes(4, "big")).digest()
                        for i in range(0, n_frames, 1)
                    ][::max(1, every_n)]
                else:
                    frames = extract_frames_batch(raw, every_n)
                for i, fr in enumerate(frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        process, schema=FRAMES_SCHEMA
    )


def media_summary(features: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches payload bytes."""
    return features.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    )
