"""Multimodal plumbing: binary columns, Arrow-batched decode/resize,
frame-sample fan-out. The codec is the deterministic fake (real image
libs absent in this container); the Spark-side shapes are real."""

from __future__ import annotations

import pytest

from pqstream_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image_meta,
    encode_fake_image,
    resize_images,
    sample_frames,
    _decode_one,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image", encode_fake_image(i, 640 + i, 480 + i), "image/fake")
        for i in range(20)
    ]
    rows.append((99, "image", b"\x89PNG\r\n not really", "image/png"))  # poison
    rows.append((100, "image", None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4)


def test_decode_meta(media):
    out = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert out[0]["width"] == 640 and out[0]["height"] == 480
    assert out[5]["width"] == 645
    assert out[0]["channels"] == 3
    # poison pill and NULL content degrade to NULL dims, job survives
    assert out[99]["width"] is None and out[99]["n_bytes"] > 0
    assert out[100]["width"] is None and out[100]["n_bytes"] == 0


def test_real_format_raises():
    with pytest.raises(NotImplementedError):
        _decode_one(b"\xff\xd8\xff\xe0 jpeg header")


def test_resize(media):
    out = {r["media_id"]: r for r in resize_images(media, 320).collect()}
    r = out[0]
    assert max(r["width"], r["height"]) == 320
    assert r["content"][:4] == b"FIMG"
    assert out[99]["content"] is None  # poison stays poison, no crash


def test_frame_sample_fanout(spark, media):
    frames = sample_frames(media.filter("content IS NOT NULL"), every_n=2)
    per = {r["media_id"]: r["count"] for r in frames.groupBy("media_id").count().collect()}
    # real images (80 bytes → 5 "frames", step 2 → 3 rows): 1 row → k frame rows
    assert all(per[i] > 1 for i in range(20))
    assert per[99] == 1  # 18-byte poison row still yields its single frame


def test_metadata_projection_prunes_binary(spark, media, tmp_path):
    """Metadata-only query over a parquet media table must not read the
    binary column — column pruning is the point of splitting meta from
    content at 100 TB. (In-memory DataFrames can't show this: a
    Scan ExistingRDD always lists every column.)"""
    path = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(path)
    meta_only = spark.read.parquet(path).select("media_id", "kind", "mime")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    assert "content" not in plan  # binary column pruned from the scan


def test_audio_features(spark):
    from pqstream_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        encode_fake_audio,
        extract_audio_features,
    )

    rows = [
        (i, "audio", encode_fake_audio(i, 16000, 2048), "audio/fake")
        for i in range(8)
    ]
    rows.append((98, "audio", b"RIFF not really wav", "audio/wav"))  # poison
    rows.append((99, "audio", None, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4)
    out = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    r = out[0]
    assert r["sample_rate"] == 16000 and r["n_samples"] == 2048
    assert abs(r["duration_s"] - 2048 / 16000) < 1e-9
    assert r["rms"] is not None and r["peak"] is not None and r["peak"] <= 128
    assert r["zero_crossings"] > 0
    # determinism: same media_id -> identical features
    again = {x["media_id"]: x for x in extract_audio_features(media).collect()}
    assert again[3] == out[3]
    # poison and NULL degrade to NULL features, job survives
    assert out[98]["rms"] is None and out[99]["rms"] is None


def test_video_frame_extraction(spark):
    from pqstream_spark.functions.multimodal import (
        VIDEO_FRAMES_SCHEMA,
        encode_fake_video,
        extract_video_frames,
    )

    rows = [
        (i, "video", encode_fake_video(i, n_frames=25, width=4, height=4),
         "video/fake")
        for i in range(6)
    ]
    rows.append((98, "video", b"\x00\x00\x00 ftypmp42 not really", "video/mp4"))
    rows.append((99, "video", None, None))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)
    out = extract_video_frames(df, every_n=10)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,frame_idx:int,width:int,height:int,"
        "frame:binary>"
    ), VIDEO_FRAMES_SCHEMA
    got = out.collect()
    by_vid = {}
    for r in got:
        by_vid.setdefault(r["media_id"], []).append(r)
    # 25 frames sampled every 10 -> indices 0, 10, 20
    assert sorted(r["frame_idx"] for r in by_vid[0]) == [0, 10, 20]
    f0 = {r["frame_idx"]: r for r in by_vid[3]}
    assert f0[10]["width"] == 4 and len(f0[10]["frame"]) == 16
    # payload is per-(video, frame) deterministic and frames differ
    assert f0[0]["frame"] != f0[10]["frame"]
    assert f0[0]["frame"] == encode_fake_video(3, 1, 4, 4)[16:]
    # poison container and NULL content degrade to one NULL row, job lives
    assert by_vid[98][0]["frame_idx"] is None
    assert by_vid[99][0]["frame"] is None


def _ppm_bytes(w, h, pixel_fn):
    header = f"P6\n{w} {h}\n255\n".encode()
    body = bytes(
        v for y in range(h) for x in range(w) for v in pixel_fn(x, y)
    )
    return header + body


def test_real_stdlib_image_decode(spark):
    """PPM/BMP/PNG headers decode for REAL — no image library, just
    bytes. Only compressed pixel formats stay stubbed."""
    import struct as st

    from pqstream_spark.functions.multimodal import MEDIA_SCHEMA, decode_image_meta

    ppm = _ppm_bytes(6, 4, lambda x, y: (x * 40, y * 60, 7))
    # minimal BMP: 54-byte header, 3x2, 24bpp
    bmp = (b"BM" + st.pack("<IHHI", 54 + 24, 0, 0, 54)
           + st.pack("<IiiHH", 40, 3, 2, 1, 24) + b"\x00" * 24 + b"\x00" * 24)
    # PNG signature + IHDR: 8x5, bit depth 8, color type 2 (truecolor)
    png = (b"\x89PNG\r\n\x1a\n" + st.pack(">I", 13) + b"IHDR"
           + st.pack(">IIBB", 8, 5, 8, 2) + b"\x00\x00\x00" + b"\x00" * 4)
    rows = [
        (1, "image", ppm, "image/x-portable-pixmap"),
        (2, "image", bmp, "image/bmp"),
        (3, "image", png, "image/png"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (6, 4, 3)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (3, 2, 3)
    assert (out[3]["width"], out[3]["height"], out[3]["channels"]) == (8, 5, 3)


def test_real_ppm_resize_pixels(spark):
    """PPM resize is a REAL pixel operation: 4x4 checkerboard -> 2x2
    keeps the exact sampled pixels (floor index map: rows/cols 0,2)."""
    from pqstream_spark.functions.multimodal import MEDIA_SCHEMA, resize_images

    # checkerboard: (x+y) even -> white, odd -> black
    ppm = _ppm_bytes(4, 4, lambda x, y: (255, 255, 255) if (x + y) % 2 == 0
                     else (0, 0, 0))
    df = spark.createDataFrame([(1, "image", ppm, None)], MEDIA_SCHEMA)
    r = resize_images(df, 2).collect()[0]
    assert (r["width"], r["height"]) == (2, 2)
    assert r["content"].startswith(b"P6\n2 2\n255\n")
    px = r["content"][len(b"P6\n2 2\n255\n"):]
    # sampled source pixels (0,0) (2,0) (0,2) (2,2) are all white
    assert px == bytes([255] * 12)


def test_real_wav_audio_features(spark):
    """PCM WAV decodes through the stdlib wave module: a 16-bit square
    wave has exact rms == amplitude, peak == amplitude, and one zero
    crossing per half-period boundary."""
    import io
    import struct as st
    import wave as wave_mod

    from pqstream_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    amp, rate, n = 1000, 8000, 800
    samples = [amp if (i // 100) % 2 == 0 else -amp for i in range(n)]
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(st.pack("<h", s) for s in samples))
    wav = buf.getvalue()

    df = spark.createDataFrame(
        [(1, "audio", wav, "audio/wav"), (2, "audio", b"RIFFbroken", None)],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    r = out[1]
    assert r["sample_rate"] == rate and r["n_samples"] == n
    assert r["duration_s"] == round(n / rate, 6)
    assert r["rms"] == float(amp)      # square wave: rms == amplitude
    assert r["peak"] == amp
    assert r["zero_crossings"] == 7    # 8 blocks of 100 -> 7 boundaries
    # corrupt RIFF degrades to NULLs, batch survives
    assert out[2]["rms"] is None


def test_corrupt_and_16bit_ppm_degrade_to_null(spark):
    """Poison PPM bytes — truncated header, zero dims, 16-bit maxval —
    degrade to NULL rows in both decode and resize, never a crashed
    batch (caught in review: _ppm_header's ValueError used to escape
    decode_image_meta's NotImplementedError-only catch)."""
    from pqstream_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_image_meta,
        resize_images,
    )

    rows = [
        (1, "image", b"P6", None),                       # truncated
        (2, "image", b"P6\xffgarbage", None),            # non-digit
        (3, "image", b"P6\n0 0\n255\n", None),           # zero dims
        (4, "image", b"P6\n2 2\n65535\n" + b"\x00" * 24, None),  # 16-bit
        (5, "image", _ppm_bytes(2, 2, lambda x, y: (1, 2, 3)), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    for mid in (1, 2, 3, 4):
        assert meta[mid]["width"] is None, mid
    assert meta[5]["width"] == 2  # the healthy one still decodes
    res = {r["media_id"]: r for r in resize_images(df, 1).collect()}
    for mid in (1, 2, 3, 4):
        assert res[mid]["content"] is None, mid
    assert res[5]["width"] == 1
