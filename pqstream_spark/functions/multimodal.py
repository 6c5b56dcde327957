"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched operators over mapInPandas (north-star requirement;
SURVEY.md §7 M5).

The Spark-side plumbing — schema, batch shape, partition behavior — is
real and tested. The codec layer is REAL where stdlib bytes suffice:
PPM (P6) decodes AND resizes with actual pixels (numpy
nearest-neighbor), BMP and PNG headers decode for metadata, and PCM
WAV decodes through the stdlib `wave` module for real rms/peak/
zero-crossing features. Only COMPRESSED codecs (JPEG/WebP pixels,
MP3/FLAC) remain stubbed behind the FIMG/FAUD/FVID fakes — this
container ships no Pillow/librosa (probe-gated:
tests/test_transport_probe.py fails the moment one appears). Swapping
one in means replacing ONE pure function inside the batch loop;
nothing about the Spark plan changes.

Scale design: media bytes never leave the executor (mapInPandas
processes Arrow record batches in place); metadata-only projections
(`width`, `duration`) are separate columns so Catalyst prunes the
binary column away for queries that don't touch pixels — at 100 TB the
scan reads KBs of metadata, not TBs of media.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_MAGIC = b"FIMG"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

IMAGE_META_SCHEMA = (
    "media_id long, width int, height int, channels int, n_bytes long"
)


def encode_fake_image(media_id: int, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake codec: 4-byte magic + packed dims + payload
    bytes derived from media_id. Stands in for a real JPEG/PNG."""
    header = FAKE_MAGIC + struct.pack("<III", width, height, channels)
    body = bytes((media_id + i) % 256 for i in range(min(width * height, 64)))
    return header + body


def _ppm_header(content: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 PPM header (magic, whitespace/comments, width,
    height, maxval) → (width, height, channels, pixel_offset)."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and content[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("bad PPM header")
        fields.append(int(content[start:pos]))
    if fields[0] <= 0 or fields[1] <= 0:
        raise ValueError("bad PPM dimensions")
    if not 0 < fields[2] <= 255:
        # spec allows maxval up to 65535 (2 bytes/sample); decoding that
        # as 1-byte samples would be silent corruption, so refuse
        raise ValueError("16-bit PPM (maxval > 255) not supported")
    return fields[0], fields[1], 3, pos + 1  # single whitespace after maxval


def _decode_one(content: bytes) -> tuple[int, int, int]:
    """Image header decode. REAL for the formats stdlib bytes can parse
    — PPM (P6), BMP, PNG (IHDR) — plus the FIMG fake. Compressed
    formats (JPEG, WebP, …) need an image library this container lacks
    (probe-gated in tests/test_transport_probe.py)."""
    if content is not None and len(content) >= 16 and content[:4] == FAKE_MAGIC:
        w, h, c = struct.unpack("<III", content[4:16])
        return w, h, c
    if content is not None and content[:2] == b"P6":
        w, h, c, _off = _ppm_header(content)
        return w, h, c
    if content is not None and content[:2] == b"BM" and len(content) >= 54:
        w = int.from_bytes(content[18:22], "little", signed=True)
        h = abs(int.from_bytes(content[22:26], "little", signed=True))
        bpp = int.from_bytes(content[28:30], "little")
        return w, h, max(1, bpp // 8)
    if (content is not None and content[:8] == b"\x89PNG\r\n\x1a\n"
            and len(content) >= 33):
        w, h = struct.unpack(">II", content[16:24])
        color_type = content[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return w, h, channels
    raise NotImplementedError(
        "compressed image formats (JPEG/WebP/...) require an image "
        "library not present in this container; PPM/BMP/PNG headers and "
        "the FIMG fake codec decode for real"
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """BINARY content → (width, height, channels) via mapInPandas.

    Arrow-batched: each pandas batch is decoded in a tight loop without
    per-row serialization. Undecodable rows yield NULL dims rather than
    failing the job (poison-pill tolerance — at 100 TB there WILL be
    corrupt files)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "width": [], "height": [],
                   "channels": [], "n_bytes": []}
            for content in pdf["content"]:
                try:
                    w, h, c = _decode_one(content)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                except (NotImplementedError, ValueError, struct.error):
                    # NotImplementedError: needs a codec library.
                    # ValueError/struct.error: corrupt header (e.g. a
                    # b"P6" prefix with garbage after) — poison rows
                    # degrade to NULL dims, never fail the job
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                out["n_bytes"].append(len(content) if content is not None else 0)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(decode, IMAGE_META_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def _resize_ppm(content: bytes, max_dim: int) -> tuple[int, int, bytes]:
    """REAL nearest-neighbor resize of a P6 PPM: numpy index-map over
    the raw pixel block, re-encoded as P6. Deterministic (floor index
    mapping), pure stdlib+numpy."""
    import numpy as np

    w, h, _c, off = _ppm_header(content)
    px = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=off)
    px = px.reshape(h, w, 3)
    scale = min(1.0, max_dim / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    xi = (np.arange(nw) * w) // nw
    yi = (np.arange(nh) * h) // nh
    out = px[yi][:, xi]
    header = f"P6\n{nw} {nh}\n255\n".encode()
    return nw, nh, header + out.tobytes()


def resize_images(df: DataFrame, max_dim: int) -> DataFrame:
    """Resize-to-fit. REAL pixel path for PPM (raw pixels → numpy
    nearest-neighbor → PPM); dim-only re-encode for the FIMG fake;
    formats whose pixels need a codec library (PNG/BMP compressed
    variants, JPEG) yield NULL rows rather than failing the batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is not None and content[:2] == b"P6":
                    try:
                        nw, nh, out = _resize_ppm(content, max_dim)
                        rows.append((mid, nw, nh, out))
                        continue
                    except (ValueError, IndexError):
                        rows.append((mid, None, None, None))
                        continue
                try:
                    w, h, _c = _decode_one(content)
                except NotImplementedError:
                    rows.append((mid, None, None, None))
                    continue
                if content[:4] != FAKE_MAGIC:
                    # header decoded (BMP/PNG) but pixel transcode needs
                    # a codec library: poison-tolerant NULL, not a crash
                    rows.append((mid, None, None, None))
                    continue
                if max(w, h) <= 0:
                    # poison blob with zero/negative header dims: the
                    # module contract is degrade-to-NULL, never fail
                    # the task (the PPM path validates dims; this is
                    # the fake path's equivalent guard)
                    rows.append((mid, None, None, None))
                    continue
                scale = min(1.0, max_dim / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                new_content = encode_fake_image(int(mid), nw, nh)
                rows.append((mid, nw, nh, new_content))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return df.select("media_id", "content").mapInPandas(op, RESIZE_SCHEMA)


FAKE_AUDIO_MAGIC = b"FAUD"

AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_s double, "
    "rms double, peak int, zero_crossings int"
)


def encode_fake_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic fake PCM: 4-byte magic + rate + signed-byte samples
    derived from media_id. Stands in for a real WAV/FLAC."""
    header = FAKE_AUDIO_MAGIC + struct.pack("<I", sample_rate)
    body = bytes(
        (media_id * 31 + i * 7) % 256 for i in range(min(n_samples, 4096))
    )
    return header + body


def _wav_samples(content: bytes) -> tuple[int, list[int]]:
    """REAL WAV decode via the stdlib `wave` module: (sample_rate,
    channel-0 integer samples) for 8/16-bit PCM. Raises on non-WAV or
    compressed encodings."""
    import io
    import wave

    with wave.open(io.BytesIO(content)) as wf:
        rate = wf.getframerate()
        width = wf.getsampwidth()
        nch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # unsigned 8-bit → centered
        samples = [b - 128 for b in raw[::nch]]
    elif width == 2:
        import array

        a = array.array("h")
        a.frombytes(raw)
        samples = list(a[::nch])
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM needs soundfile")
    return rate, samples


def extract_audio_features(df: DataFrame) -> DataFrame:
    """BINARY audio → scalar features (rms / peak / zero-crossings) via
    mapInPandas — the feature-extraction stage of an audio pipeline.
    REAL decode for PCM WAV (stdlib `wave`: 8/16-bit, channel 0) and
    the FAUD fake; compressed codecs (MP3/FLAC/OGG) need
    librosa/soundfile, absent here and probe-gated."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "duration_s",
                "rms", "peak", "zero_crossings")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                if content is not None and content[:4] == b"RIFF":
                    try:
                        rate, samples = _wav_samples(content)
                    except Exception:  # corrupt/compressed: poison-tolerant
                        for k in ("sample_rate", "n_samples", "duration_s",
                                  "rms", "peak", "zero_crossings"):
                            out[k].append(None)
                        continue
                    n = len(samples)
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(n)
                    out["duration_s"].append(round(n / rate, 6) if rate else None)
                    out["rms"].append(
                        round((sum(s * s for s in samples) / n) ** 0.5, 6)
                        if n else None
                    )
                    out["peak"].append(max(abs(s) for s in samples) if n else None)
                    out["zero_crossings"].append(
                        sum(1 for i in range(1, n)
                            if (samples[i - 1] < 0) != (samples[i] < 0))
                    )
                    continue
                if (content is None or len(content) < 8
                        or content[:4] != FAKE_AUDIO_MAGIC):
                    for k in ("sample_rate", "n_samples", "duration_s",
                              "rms", "peak", "zero_crossings"):
                        out[k].append(None)
                    continue
                (rate,) = struct.unpack("<I", content[4:8])
                samples = [b - 128 for b in content[8:]]
                n = len(samples)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_s"].append(round(n / rate, 6) if rate else None)
                out["rms"].append(
                    round((sum(s * s for s in samples) / n) ** 0.5, 6) if n else None
                )
                out["peak"].append(max(abs(s) for s in samples) if n else None)
                out["zero_crossings"].append(
                    sum(1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0))
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        feats, AUDIO_FEATURES_SCHEMA
    )


FAKE_VIDEO_MAGIC = b"FVID"
_FRAME_HEADER = 16  # magic + n_frames + width + height, 4 bytes each

VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, frame binary"
)


def encode_fake_video(
    media_id: int, n_frames: int, width: int = 8, height: int = 8
) -> bytes:
    """Deterministic fake container: 4-byte magic + frame count + dims,
    then one (width*height)-byte payload per frame derived from
    (media_id, frame index). Stands in for a real MP4/WebM."""
    header = FAKE_VIDEO_MAGIC + struct.pack("<III", n_frames, width, height)
    frame_len = width * height
    body = b"".join(
        bytes((media_id * 131 + f * 17 + i) % 256 for i in range(frame_len))
        for f in range(n_frames)
    )
    return header + body


def extract_video_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """BINARY video → one row per SAMPLED frame with its pixel payload,
    via mapInPandas — the decode half of video frame-sampling (the
    fan-out *shape* alone is sample_frames below). A real
    implementation swaps the fake-container slicing for PyAV/OpenCV
    seek-and-decode (tests/test_transport_probe.py fails the moment
    either appears); the Arrow batch shape, schema, and poison-pill
    tolerance are the real engine surface. Frame bytes never visit the
    driver: each executor slices its own batch's videos in place, and
    sampling drops (every_n - 1)/every_n of the payload BEFORE any
    shuffle or sink sees it."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if (content is None or len(content) < _FRAME_HEADER
                        or content[:4] != FAKE_VIDEO_MAGIC):
                    rows.append((mid, None, None, None, None))  # poison
                    continue
                n, w, h = struct.unpack("<III", content[4:_FRAME_HEADER])
                flen = w * h
                for f in range(0, n, every_n):
                    off = _FRAME_HEADER + f * flen
                    rows.append((mid, f, w, h, content[off:off + flen]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "frame"],
            )

    return df.select("media_id", "content").mapInPandas(
        frames, VIDEO_FRAMES_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video: emit one row per sampled frame index.
    Frame *extraction* is the stubbed codec step; the fan-out shape
    (1 video row → k frame rows) is the part that matters to the plan."""
    n_frames = (F.length("content") / F.lit(16)).cast("int")
    return (
        df.withColumn("n_frames", n_frames)
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames"), F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
