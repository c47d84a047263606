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


# ------------------------------------------------------------- PNG codec

def test_png_golden_pixels_hand_built():
    """Golden fixture assembled byte-by-byte (not via encode_png):
    2x2 RGB, row 0 filtered with SUB, row 1 with UP — the filtered
    bytes below are hand-computed from the spec, so encoder and
    decoder cannot be wrong in the same way."""
    import struct
    import zlib

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        decode_png,
    )

    # pixels: row0 = (10,20,30) (40,60,80); row1 = (15,25,35) (50,70,90)
    # SUB row0:  10,20,30 then (40-10, 60-20, 80-30) = 30,40,50
    # UP  row1:  (15-10, 25-20, 35-30)=5,5,5  (50-40,70-60,90-80)=10,10,10
    body = (b"\x01" + bytes([10, 20, 30, 30, 40, 50])
            + b"\x02" + bytes([5, 5, 5, 10, 10, 10]))

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(body))
           + chunk(b"IEND", b""))
    w, h, mean = decode_png(png)
    assert (w, h) == (2, 2)
    assert mean == (10 + 20 + 30 + 40 + 60 + 80
                    + 15 + 25 + 35 + 50 + 70 + 90) / 12


def test_png_roundtrip_all_filters_and_color_types():
    import numpy as np

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        decode_image_batch, decode_png, encode_png,
    )

    gray = (np.arange(5 * 9).reshape(5, 9) * 91 % 256).astype(np.uint8)
    rgb = (np.arange(7 * 11 * 3).reshape(7, 11, 3) * 37 % 256).astype(np.uint8)
    ga = (np.arange(4 * 6 * 2).reshape(4, 6, 2) * 29 % 256).astype(np.uint8)
    rgba = (np.arange(6 * 8 * 4).reshape(6, 8, 4) * 53 % 256).astype(np.uint8)
    cases = [
        (gray, 0, gray.mean()),
        (rgb, 2, rgb.mean()),
        (ga, 4, ga[:, :, 0].mean()),        # alpha excluded
        (rgba, 6, rgba[:, :, :3].mean()),   # alpha excluded
    ]
    for ft in range(5):
        for arr, ct, expected in cases:
            w, h, mean = decode_png(encode_png(arr, ct, ft))
            assert (w, h) == (arr.shape[1], arr.shape[0])
            assert abs(mean - expected) < 1e-9, (ft, ct)
    # the magic dispatch routes PNG to the real decoder
    w, h, mean = decode_image_batch(encode_png(rgb, 2, 4))
    assert (w, h, round(mean, 6)) == (11, 7, round(rgb.mean(), 6))


def test_png_palette_decode():
    """Color type 3: indices map through PLTE before the mean."""
    import struct
    import zlib

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        decode_png,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    plte = bytes([255, 0, 0,   0, 255, 0,   0, 0, 255])  # R, G, B
    body = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(body))
           + chunk(b"IEND", b""))
    w, h, mean = decode_png(png)
    # 4 pixels, each one pure channel: mean over RGB bytes = 255*4/12
    assert (w, h) == (2, 2) and mean == 255 * 4 / 12


def test_png_refuses_16bit_and_interlace():
    import struct
    import zlib

    import pytest as _pytest

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        decode_png,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    for depth, interlace in ((16, 0), (8, 1)):
        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 1, 1, depth, 0, 0, 0,
                                   interlace))
               + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
               + chunk(b"IEND", b""))
        with _pytest.raises(NotImplementedError):
            decode_png(png)


def test_png_through_spark_binary_plumbing(spark, tmp_path):
    """mm_image_features' plumbing accepts PNG bytes: binaryFile source
    → mapInPandas decode, dims and means exact."""
    import numpy as np

    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        encode_png, extract_media_features,
    )

    d = tmp_path / "pngs"
    d.mkdir()
    arrs = []
    for i, ft in enumerate(range(5)):
        arr = ((np.add.outer(np.arange(6 + i), np.arange(9 + i)) * 7 + i)
               % 256).astype(np.uint8)
        arrs.append(arr)
        (d / f"img_{i}.png").write_bytes(
            encode_png(np.repeat(arr[:, :, None], 3, axis=2), 2, ft))
    raw = spark.read.format("binaryFile").load(str(d))
    media = raw.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.png$", 1)
        .cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
    )
    feats = {r["media_id"]: r for r in
             extract_media_features(media).collect()}
    for i, arr in enumerate(arrs):
        assert (feats[i]["width"], feats[i]["height"]) == \
            (arr.shape[1], arr.shape[0])
        assert abs(feats[i]["mean_pixel"] - arr.mean()) < 1e-9


def test_gif_lzw_round_trip_and_compression():
    """The GIF LZW pair is the REAL algorithm: repetitive input
    compresses hard, the KwKwK (code == next) case round-trips, and a
    long low-redundancy stream crosses every width boundary
    (512/1024/2048) plus the 4096-entry CLEAR reset."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        _gif_lzw_compress, _gif_lzw_decompress,
    )

    rep = bytes([1, 2, 3, 4] * 500 + [7] * 300)
    c = _gif_lzw_compress(rep)
    assert _gif_lzw_decompress(c) == rep
    assert len(c) < len(rep) // 4  # genuinely compressed

    kwk = b"abababababab" * 16
    assert _gif_lzw_decompress(_gif_lzw_compress(kwk)) == kwk

    hard = bytes(((i * i) // 7) % 256 for i in range(60000))
    assert _gif_lzw_decompress(_gif_lzw_compress(hard)) == hard


def test_gif_container_round_trip_and_refusals():
    import numpy as np
    import pytest

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        decode_gif, encode_gif,
    )

    frames = [(10 + 3 * f + np.add.outer(np.arange(6), np.arange(9)))
              .astype(np.uint8) for f in range(4)]
    w, h, means = decode_gif(encode_gif(frames))
    assert (w, h) == (9, 6)
    assert means == [10 + 3 * f + 4.0 + 2.5 for f in range(4)]

    payload = bytearray(encode_gif(frames[:1]))
    assert decode_gif(bytes(payload))[2] == [16.5]
    # flip the image descriptor's interlace bit → loud refusal
    # (descriptor starts after header 13 + GCT 768 + GCE 8 bytes)
    idesc_flags = 13 + 768 + 8 + 9
    assert payload[13 + 768 + 8] == 0x2C
    payload[idesc_flags] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(payload))
    payload[idesc_flags] = 0x80  # local color table instead
    with pytest.raises(ValueError, match="local color"):
        decode_gif(bytes(payload))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" + bytes(16))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_gif_lzw_property_round_trip(data):
    """Property: ANY byte stream LZW round-trips exactly — the
    adversarial cases hypothesis finds (long runs, alternations,
    high-entropy tails) cover dictionary states the fixed tests
    can't enumerate."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.multimodal import (
        _gif_lzw_compress, _gif_lzw_decompress,
    )

    assert _gif_lzw_decompress(_gif_lzw_compress(data)) == data
