"""Header-only media probing: MP3 frame-walk and MP4 box-walk metadata,
plus the skip-and-flag Spark probe over a mixed corpus.

MP3/MP4 test vectors are constructed bit-by-bit from the public specs
(ISO 11172-3 frame headers, ISO 14496-12 boxes) — the probe never reads
entropy data, so dummy payload bytes behind real headers are exact."""

import struct

import numpy as np
import pytest

from time_series_databse_engine_spark.operators.media_probe import (
    probe_features,
    probe_media,
    probe_mp3,
    probe_mp4,
)


def _mp3_frame(bitrate_idx=9, sr_idx=0, pad=0):
    """One MPEG1 Layer III frame: header + dummy payload of exact size."""
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1), 0x00])
    bitrate = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][bitrate_idx - 1]
    sr = [44100, 48000, 32000][sr_idx]
    size = 144 * bitrate * 1000 // sr + pad
    return hdr + b"\xAA" * (size - 4)


def _id3v2(size=64):
    return b"ID3\x04\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    ) + b"\x00" * size


def _box(btype, body):
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4(timescale=1000, duration=5432, v1=False):
    if v1:
        mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + struct.pack(">IQ", timescale, duration)
        mvhd += b"\x00" * 80
    else:
        mvhd = b"\x00" + b"\x00" * 3 + b"\x00" * 8 + struct.pack(">II", timescale, duration)
        mvhd += b"\x00" * 76
    return _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(b"moov", _box(b"mvhd", mvhd))


def test_mp3_cbr_duration_exact():
    # 38 frames x 1152 samples at 44100 Hz = 992 ms
    mp3 = b"".join(_mp3_frame() for _ in range(38))
    d = probe_mp3(mp3)
    assert d["n_frames"] == 38
    assert d["sample_rate"] == 44100
    assert d["duration_ms"] == int(38 * 1152 * 1000 / 44100)
    assert d["bitrate_kbps"] == 128


def test_mp3_id3_skip_vbr_mean_and_padding():
    # ID3v2 prefix + frames of varying bitrate (VBR) incl. padded frames
    frames = [_mp3_frame(bitrate_idx=i, pad=i % 2) for i in (5, 9, 13, 9)]
    d = probe_mp3(_id3v2() + b"".join(frames))
    assert d["n_frames"] == 4
    assert d["bitrate_kbps"] == round((64 + 128 + 256 + 128) / 4)
    # trailing garbage after a valid chain is tolerated
    d2 = probe_mp3(_id3v2() + b"".join(frames) + b"TAG" + bytes(125))
    assert d2["n_frames"] == 4


def test_mp3_rejects_noise():
    with pytest.raises(ValueError):
        probe_mp3(bytes(512))
    with pytest.raises(ValueError):
        probe_mp3(b"\xff\xff" + bytes(64))  # reserved version bits


def test_mp4_mvhd_both_versions():
    assert probe_mp4(_mp4())["duration_ms"] == 5432
    d = probe_mp4(_mp4(timescale=90000, duration=90000 * 7 + 45000, v1=True))
    assert d["duration_ms"] == 7500
    assert d["brand"] == "isom"
    with pytest.raises(ValueError):
        probe_mp4(_box(b"ftyp", b"isom\x00\x00\x02\x00"))  # no moov


def test_probe_media_dispatch_all_containers():
    from time_series_databse_engine_spark.operators.jpeg import encode_jpeg
    from time_series_databse_engine_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav,
    )

    png = probe_media(encode_png(3, 2, bytes(range(18))))
    assert (png["container"], png["width"], png["height"]) == ("png", 3, 2)
    bmp = probe_media(encode_bmp(2, 2, bytes(12)))
    assert bmp["container"] == "bmp"
    wav = probe_media(encode_wav([0] * 16000, sample_rate=16000))
    assert (wav["container"], wav["duration_ms"]) == ("wav", 1000)
    jp = probe_media(encode_jpeg(4, 4, bytes(48), progressive=True))
    assert (jp["container"], jp["width"]) == ("jpeg", 4)
    mp3 = probe_media(b"".join(_mp3_frame() for _ in range(5)))
    assert mp3["container"] == "mp3"
    mp4 = probe_media(_mp4())
    assert (mp4["container"], mp4["duration_ms"]) == ("mp4", 5432)
    with pytest.raises(ValueError):
        probe_media(b"\x00" * 32)


def test_probe_features_spark_skip_and_flag(spark):
    from time_series_databse_engine_spark.operators.multimodal import encode_png

    rows = [
        (1, "image", bytearray(encode_png(4, 4, bytes(48)))),
        (2, "audio", bytearray(b"".join(_mp3_frame() for _ in range(10)))),
        (3, "video", bytearray(_mp4(duration=1234))),
        (4, "image", bytearray(b"\x00garbage\x00garbage\x00")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in probe_features(df).collect()}
    assert out[1].ok and out[1].container == "png" and out[1].width == 4
    assert out[2].ok and out[2].container == "mp3" and out[2].sample_rate == 44100
    assert out[3].ok and out[3].duration_ms == 1234
    assert (out[4].ok, out[4].container) == (False, None)
