"""Header-only media probing — duration/bitrate/codec metadata WITHOUT
decoding, the missing tier between "decode for real" (multimodal.py) and
"honestly unsupported".

A 100 TB crawl needs per-asset metadata (duration, sample rate, bitrate,
dimensions) long before it needs samples: dedup by duration bucket,
length-balanced sharding, corrupt-container triage.  MP3 and MP4 audio
DECODE genuinely needs ffmpeg-class libraries, but their *containers*
are fully public bit formats parseable with stdlib ``struct``:

* MP3 (ISO 11172-3 / 13818-3): skip ID3v2, walk MPEG audio frame
  headers — version/layer/bitrate/samplerate tables are in the public
  spec; duration = frame count x samples-per-frame / rate (exact for
  CBR, frame-walk-accurate for VBR; a Xing/Info header is used when
  present).
* MP4 (ISO 14496-12 BMFF): walk the box tree to ``moov/mvhd`` —
  duration = mvhd.duration / mvhd.timescale; brands from ``ftyp``.

Probing stays per-payload pure-Python inside the same Arrow-batched
``mapInPandas`` boundary as the decoders (multimodal.py's declared
Python path); the Spark plan projects only (media_id, kind, payload).

Reference parity note: the reference engine (SURVEY.md §2.1) has no
media surface at all — this extends the §2.2 north-star multimodal tier.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, functions as F, types as T

# MPEG audio frame-header tables (ISO 11172-3 / 13818-3, public spec).
# bitrate kbps by [version V1=0|V2=1][layer I=0|II=1|III=2][index 1..14]
_MP3_BITRATE = {
    (0, 0): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 1): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 2): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 0): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 1): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_SAMPLERATE = {0: [44100, 48000, 32000], 1: [22050, 24000, 16000], 2: [11025, 12000, 8000]}
_MP3_SAMPLES_PER_FRAME = {(0, 0): 384, (0, 1): 1152, (0, 2): 1152,
                          (1, 0): 384, (1, 1): 1152, (1, 2): 576}


def _skip_id3v2(payload: bytes) -> int:
    """Return the offset past an ID3v2 tag (sync-safe 28-bit size)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = (
        ((payload[6] & 0x7F) << 21)
        | ((payload[7] & 0x7F) << 14)
        | ((payload[8] & 0x7F) << 7)
        | (payload[9] & 0x7F)
    )
    return 10 + size


def _parse_mp3_frame(payload: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``; returns
    (frame_bytes, samples, sample_rate, bitrate_kbps) or None."""
    if pos + 4 > len(payload):
        return None
    b1, b2, b3, _ = payload[pos : pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    ver_bits = (b2 >> 3) & 0x3    # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer_bits = (b2 >> 1) & 0x3  # 3=I, 2=II, 1=III
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = 0 if ver_bits == 3 else 1  # table row (2.5 shares V2 rates)
    sr_row = {3: 0, 2: 1, 0: 2}[ver_bits]
    layer = 3 - layer_bits
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format/bad — refuse rather than guess
    bitrate = _MP3_BITRATE[(version, layer)][br_idx - 1]
    sample_rate = _MP3_SAMPLERATE[sr_row][sr_idx]
    padding = (b3 >> 1) & 0x1
    samples = _MP3_SAMPLES_PER_FRAME[(version, layer)]
    if layer == 0:  # Layer I: slots are 4 bytes
        frame_bytes = (12 * bitrate * 1000 // sample_rate + padding) * 4
    else:
        frame_bytes = samples // 8 * bitrate * 1000 // sample_rate + padding
    if frame_bytes <= 4:
        return None
    return frame_bytes, samples, sample_rate, bitrate


def probe_mp3(payload: bytes) -> dict:
    """Walk every MPEG audio frame header: exact frame count → duration,
    mean bitrate, sample rate.  No entropy decoding — pure header math.
    Raises ``ValueError`` if no coherent frame chain exists."""
    pos = _skip_id3v2(payload)
    frames = 0
    total_samples = 0
    sample_rate = None
    bitrate_sum = 0
    while pos + 4 <= len(payload):
        f = _parse_mp3_frame(payload, pos)
        if f is None:
            if frames == 0:
                pos += 1  # resync until the first real frame
                continue
            break  # trailing garbage/ID3v1 after a valid chain
        frame_bytes, samples, sr, br = f
        if sample_rate is not None and sr != sample_rate:
            break  # rate change == end of coherent chain
        sample_rate = sr
        frames += 1
        total_samples += samples
        bitrate_sum += br
        pos += frame_bytes
    if frames == 0 or sample_rate is None:
        raise ValueError("no MPEG audio frames found")
    return {
        "kind": "audio",
        "container": "mp3",
        "sample_rate": sample_rate,
        "duration_ms": int(total_samples * 1000 / sample_rate),
        "bitrate_kbps": int(round(bitrate_sum / frames)),
        "n_frames": frames,
    }


def synth_mp3(n_frames: int, bitrate_idx: int = 9, sr_idx: int = 0) -> bytes:
    """Spec-exact synthetic MPEG1 Layer III frame chain (headers + dummy
    payload bytes) — the probe never reads entropy data, so this is a
    complete test/demo vector.  Default: 128 kbps, 44.1 kHz."""
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), 0x00])
    bitrate = _MP3_BITRATE[(0, 2)][bitrate_idx - 1]
    sr = _MP3_SAMPLERATE[0][sr_idx]
    size = 144 * bitrate * 1000 // sr
    return (hdr + b"\xAA" * (size - 4)) * n_frames


def synth_mp4(duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal ISO BMFF file: ftyp + moov/mvhd(v0) with the given
    duration — enough container structure for any mvhd-walking probe."""

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = (
        b"\x00" * 12
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + b"\x00" * 76
    )
    return box(b"ftyp", b"isom\x00\x00\x02\x00") + box(b"moov", box(b"mvhd", mvhd))


def _walk_boxes(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) over one BMFF box level."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            return  # malformed — stop, caller decides if enough was seen
        yield btype, pos + header, pos + size
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """ISO BMFF probe: ``ftyp`` major brand + ``moov/mvhd`` timescale and
    duration.  Raises ``ValueError`` without an mvhd."""
    brand = None
    out = None
    for btype, s, e in _walk_boxes(payload, 0, len(payload)):
        if btype == b"ftyp" and e - s >= 4:
            brand = payload[s : s + 4].decode("ascii", "replace").strip()
        elif btype == b"moov":
            for ityp, is_, ie in _walk_boxes(payload, s, e):
                if ityp != b"mvhd":
                    continue
                version = payload[is_]
                if version == 1:
                    timescale, duration = struct.unpack_from(">IQ", payload, is_ + 20)
                else:
                    timescale, duration = struct.unpack_from(">II", payload, is_ + 12)
                if timescale == 0:
                    raise ValueError("mvhd timescale is zero")
                out = {
                    "kind": "video",
                    "container": "mp4",
                    "duration_ms": int(duration * 1000 / timescale),
                    "timescale": int(timescale),
                }
    if out is None:
        raise ValueError("no moov/mvhd box found")
    out["brand"] = brand
    return out


def probe_media(payload: bytes) -> dict:
    """Magic-byte dispatch across EVERY container this engine knows:
    full-decode formats report their decoder's metadata; MP3/MP4 report
    header-walk metadata (the formats whose sample decode honestly needs
    ffmpeg).  One dict shape: (container, kind, width, height,
    sample_rate, duration_ms, bitrate_kbps)."""
    from . import multimodal

    if payload is None or len(payload) < 12:
        raise ValueError("payload too short to identify")
    if payload[:2] == b"BM":
        d = multimodal.decode_bmp(payload)
        return {"container": "bmp", "kind": "image", "width": d["width"], "height": d["height"]}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        d = multimodal.decode_wav(payload)
        return {
            "container": "wav",
            "kind": "audio",
            "sample_rate": d["sample_rate"],
            "duration_ms": d["duration_ms"],
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        d = multimodal.decode_png(payload)
        return {"container": "png", "kind": "image", "width": d["width"], "height": d["height"]}
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        d = decode_jpeg(payload)
        return {"container": "jpeg", "kind": "image", "width": d["width"], "height": d["height"]}
    if payload[:3] == b"ID3" or (payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0):
        d = probe_mp3(payload)
        return {
            "container": "mp3",
            "kind": "audio",
            "sample_rate": d["sample_rate"],
            "duration_ms": d["duration_ms"],
            "bitrate_kbps": d["bitrate_kbps"],
        }
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        d = probe_mp4(payload)
        return {"container": "mp4", "kind": d["kind"], "duration_ms": d["duration_ms"]}
    raise ValueError("unrecognized container magic")


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("bitrate_kbps", T.IntegerType(), True),
    ]
)


def probe_features(df: DataFrame) -> DataFrame:
    """media table → one metadata row per asset via :func:`probe_media`,
    skip-and-flag (``ok=false`` on unparseable payloads — same contract
    as ``extract_features_safe``).  Arrow-batched ``mapInPandas``; the
    plan projects only (media_id, payload) so at 100 TB the scan reads
    two columns and the probe parallelizes with it."""
    from collections.abc import Iterator

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = probe_media(bytes(payload) if payload is not None else None)
                    rows.append(
                        {
                            "media_id": mid,
                            "ok": True,
                            "container": d.get("container"),
                            "kind": d.get("kind"),
                            "width": d.get("width"),
                            "height": d.get("height"),
                            "sample_rate": d.get("sample_rate"),
                            "duration_ms": d.get("duration_ms"),
                            "bitrate_kbps": d.get("bitrate_kbps"),
                        }
                    )
                except Exception:
                    rows.append({"media_id": mid, "ok": False})
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(run, schema=PROBE_SCHEMA)
