"""Multimodal plumbing: binary columns through Arrow-batched
mapInPandas with the deterministic fake decoder."""

from __future__ import annotations

import pytest

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_batch,
    extract_media_features,
    media_summary,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-1", ("camera", 1700000000)),
        (2, "image", "image/jpeg", b"\xff\xd8-fake-2" * 100, ("web", 1700000001)),
        (3, "audio", "audio/wav", b"RIFF-fake" * 10, ("mic", 1700000002)),
        (4, "video", "video/mp4", b"ftypmp4-fake" * 200, ("cam", 1700000003)),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image_batch(b"anything")


def test_extract_media_features_fake(spark, media_df):
    feats = extract_media_features(media_df, fake=True).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id) == 4
    assert by_id[2]["n_bytes"] == len(b"\xff\xd8-fake-2" * 100)
    assert by_id[1]["width"] >= 16 and by_id[1]["height"] >= 16
    # Determinism: same payload → same features.
    feats2 = {r["media_id"]: r for r in extract_media_features(media_df, fake=True).collect()}
    assert feats2[1]["payload_hash"] == by_id[1]["payload_hash"]
    assert (feats2[1]["width"], feats2[1]["height"]) == (by_id[1]["width"], by_id[1]["height"])


def test_real_decoder_surfaces_not_implemented(spark, media_df):
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)) as exc:
        extract_media_features(media_df, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "image decoding" in str(exc.value)


def test_media_summary_metadata_only(spark, media_df):
    out = media_summary(extract_media_features(media_df, fake=True)).collect()
    kinds = {r["kind"]: r for r in out}
    assert kinds["image"]["n_items"] == 2
    assert kinds["audio"]["n_items"] == 1
    assert kinds["video"]["n_items"] == 1


def test_resize_images_fake(spark, media_df):
    out = resize_images(media_df, 224, 224, fake=True).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id) == 4
    assert all((r["width"], r["height"]) == (224, 224) for r in out)
    # Deterministic payload transform: md5(payload) + dims.
    out2 = {r["media_id"]: bytes(r["payload"])
            for r in resize_images(media_df, 224, 224, fake=True).collect()}
    assert out2[1] == bytes(by_id[1]["payload"])
    assert len(out2[1]) == 16 + 4


def test_resize_real_hook_raises(spark, media_df):
    with pytest.raises(Exception) as exc:
        resize_images(media_df, 64, 64, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "resize" in str(exc.value)


def test_real_bmp_decode_through_spark(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import encode_bmp

    rows = [
        (1, "image", "image/bmp", encode_bmp(17, 19, 123), ("synth", 0)),
        (2, "image", "image/bmp", encode_bmp(33, 16, 7), ("synth", 0)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert (feats[1]["width"], feats[1]["height"], feats[1]["mean_pixel"]) == (17, 19, 123.0)
    assert (feats[2]["width"], feats[2]["height"], feats[2]["mean_pixel"]) == (33, 16, 7.0)


def test_real_resize_roundtrip(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rows = [(1, "image", "image/bmp", encode_bmp(32, 24, 50), ("synth", 0))]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = resize_images(media, 8, 8).collect()
    assert len(out) == 1
    # Constant-fill image survives nearest-neighbor resize bit-exactly.
    assert decode_bmp(bytes(out[0]["payload"])) == (8, 8, 50.0)


def test_real_rawv_frame_sampling(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import encode_rawv

    payload = encode_rawv(8, 8, [10, 20, 30, 40, 50])
    media = spark.createDataFrame(
        [(9, "video", "video/rawv", payload, ("synth", 0))], schema=MEDIA_SCHEMA
    )
    frames = sample_frames(media, every_n=2).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]
    assert [bytes(r["frame_payload"])[0] for r in frames] == [10, 30, 50]


def test_wav_codec_roundtrip():
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    assert decode_wav(encode_wav(65, 300, 8100)) == (8100, 1, 65, 300)


def test_sample_frames_fake(spark, media_df):
    frames = sample_frames(media_df, every_n=1, fake=True).collect()
    # Only the video row fans out; ⌈2400/256⌉ capped at 8 frames.
    assert {r["media_id"] for r in frames} == {4}
    assert [r["frame_idx"] for r in frames] == list(range(len(frames)))
    assert len(frames) == 8
    assert len({bytes(r["frame_payload"]) for r in frames}) == len(frames)


def test_binaryfile_source_ingestion(spark, tmp_path):
    """Raw media ingestion from DISK via Spark's binaryFile source —
    how a production pipeline actually picks up image files — feeding
    the same Arrow-batched decode path as the table-backed entries.
    File bytes → (media_id from filename, payload) → real BMP decode."""
    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        encode_bmp,
    )

    d = tmp_path / "raw_media"
    d.mkdir()
    for i, (w, h, v) in enumerate([(4, 3, 10), (8, 2, 200), (5, 5, 77)]):
        (d / f"img_{i}.bmp").write_bytes(encode_bmp(w, h, v))

    raw = spark.read.format("binaryFile").load(str(d))
    media = raw.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp$", 1)
        .cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
    )
    feats = {r["media_id"]: r for r in
             extract_media_features(media).collect()}
    assert (feats[0]["width"], feats[0]["height"]) == (4, 3)
    assert (feats[1]["width"], feats[1]["height"]) == (8, 2)
    assert feats[2]["mean_pixel"] == 77.0
    # length metadata from the source matches the decoded payload size
    sizes = {r["media_id"]: r["n_bytes"] for r in feats.values()}
    disk = {int(p.name[4]): p.stat().st_size for p in d.iterdir()}
    assert sizes == disk
