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
    from time_series_databse_engine_spark.operators.media_probe import (
        synth_flac,
        synth_ogg_vorbis,
    )

    fl = probe_media(synth_flac(2010))
    assert (fl["container"], fl["sample_rate"], fl["duration_ms"]) == ("flac", 44100, 2010)
    og = probe_media(synth_ogg_vorbis(1234))
    assert (og["container"], og["sample_rate"], og["duration_ms"]) == ("ogg", 16000, 1234)
    with pytest.raises(ValueError):
        probe_media(b"\x00" * 32)


def test_flac_streaminfo_probe():
    from time_series_databse_engine_spark.operators.media_probe import (
        probe_flac,
        synth_flac,
    )

    d = probe_flac(synth_flac(2010, sample_rate=44100, channels=2, bps=16))
    assert (d["sample_rate"], d["channels"], d["duration_ms"]) == (44100, 2, 2010)
    # odd rate exercises the 20-bit packing (96 kHz spills past 16 bits)
    d = probe_flac(synth_flac(500, sample_rate=96000, channels=1, bps=24))
    assert (d["sample_rate"], d["channels"], d["duration_ms"]) == (96000, 1, 500)
    with pytest.raises(ValueError):
        probe_flac(b"fLaC" + bytes(8))  # too short for STREAMINFO
    with pytest.raises(ValueError):  # first block not STREAMINFO (type 4)
        probe_flac(b"fLaC" + bytes([0x04]) + bytes(40))


def test_ogg_vorbis_and_opus_probe():
    from time_series_databse_engine_spark.operators.media_probe import (
        _ogg_crc,
        _ogg_page,
        probe_ogg,
        synth_ogg_vorbis,
    )

    stream = synth_ogg_vorbis(1234, sample_rate=16000)
    d = probe_ogg(stream)
    assert (d["codec"], d["sample_rate"], d["duration_ms"]) == ("vorbis", 16000, 1234)
    # the synthesized pages carry REAL RFC 3533 CRCs (zeroed-field rule)
    first_page_len = 27 + stream[26] + sum(stream[27 : 27 + stream[26]])
    page = stream[:first_page_len]
    assert struct.unpack_from("<I", page, 22)[0] == _ogg_crc(
        page[:22] + b"\x00\x00\x00\x00" + page[26:]
    )
    # Opus: granule clock is 48 kHz regardless of input rate; pre-skip
    # (312 samples here) is subtracted per RFC 7845 §4
    opus_head = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
        + struct.pack("<I", 16000) + struct.pack("<hB", 0, 0)
    )
    stream = _ogg_page(opus_head, 0, 7, 0, 0x02) + _ogg_page(
        b"", 48000 * 2 + 312, 7, 1, 0x04
    )
    d = probe_ogg(stream)
    assert (d["codec"], d["sample_rate"], d["duration_ms"]) == ("opus", 16000, 2000)
    with pytest.raises(ValueError):
        probe_ogg(_ogg_page(b"\x00unknowncodec", 0, 7, 0, 0x02))


def test_image_probe_is_header_only():
    """r7 ADVICE: width/height must come from IHDR / SOFn, not a full
    decode — a payload truncated right after its frame header (entropy
    data gone) still probes its dimensions."""
    from time_series_databse_engine_spark.operators.jpeg import encode_jpeg
    from time_series_databse_engine_spark.operators.multimodal import encode_png

    png = encode_png(4, 4, bytes(48))
    d = probe_media(png[:33])  # signature + IHDR only, IDAT gone
    assert (d["width"], d["height"]) == (4, 4)

    jp = encode_jpeg(4, 4, bytes(48), progressive=True)
    sos = jp.find(b"\xff\xda")
    assert sos > 0
    d = probe_media(jp[: sos + 2])  # everything after SOS marker gone
    assert (d["width"], d["height"]) == (4, 4)
    # baseline too
    jb = encode_jpeg(4, 4, bytes(48))
    d = probe_media(jb[: jb.find(b"\xff\xda") + 2])
    assert (d["width"], d["height"]) == (4, 4)


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
