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
