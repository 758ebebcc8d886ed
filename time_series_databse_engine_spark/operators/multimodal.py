"""Multimodal column plumbing (north-star op, BASELINE.json).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side shape is real and tested — schema, partition-friendly batch
iteration via ``mapInPandas`` (Arrow batches, never per-row Python), stable
output schemas.

Codecs: BMP (uncompressed 24-bit, Windows BITMAPINFOHEADER), WAV (RIFF
PCM 16-bit) and PNG (EVERY legal static layout — 1/2/4/8/16-bit
gray/RGB/RGBA/palette, sequential or Adam7-interlaced; zlib inflate +
full scanline unfiltering — W3C spec) are decoded for real with
pure-stdlib ``struct``/``zlib`` parsing — header fields plus per-pixel /
per-sample statistics; JPEG (baseline AND progressive, restart
intervals, 4:2:0/4:2:2/4:4:4) decodes through the pure-numpy codec in
``jpeg.py``.  Formats needing external libraries (arithmetic-coded or
12-bit JPEG, MP3/MP4) raise ``NotImplementedError`` in real mode (they
light up automatically if Pillow is present); ``fake=True`` keeps the
deterministic bytes-derived stand-in for them.  Swapping in PIL/ffmpeg
later changes only the inner decode function, not the Spark plan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes → FEATURE_DIM floats."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


# ---------------------------------------------------------------------------
# Real stdlib codecs — BMP (24-bit uncompressed) and WAV (PCM 16-bit).
# Both formats are fully public (Windows BMP / Microsoft RIFF specs).
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bit bottom-up BMP writer.  ``pixels`` is ``width*height*3``
    BGR bytes, row 0 first (stored bottom-up per the format)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 BGR bytes")
    row_size = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_size - width * 3)
    body = b"".join(
        pixels[(height - 1 - r) * width * 3 : (height - r) * width * 3] + pad
        for r in range(height)
    )
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + info + body


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP: dimensions + per-channel pixel means."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) // 4 * 4
    import numpy as np

    px = (
        np.frombuffer(payload, dtype=np.uint8, count=height * row_size, offset=offset)
        .reshape(height, row_size)[:, : width * 3]
        .reshape(-1, 3)
    )
    means = px.mean(axis=0) if px.size else np.zeros(3)
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "bpp": bpp,
        "top_down": top_down,
        "mean_b": float(means[0]),
        "mean_g": float(means[1]),
        "mean_r": float(means[2]),
    }


def encode_wav(samples: list[int], sample_rate: int = 16_000, channels: int = 1) -> bytes:
    """Minimal PCM-16 mono/stereo WAV writer (``samples`` are interleaved
    int16 values)."""
    import array

    data = array.array("h", samples).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def _wav_chunks(payload: bytes) -> tuple[tuple, bytes]:
    """Walk the RIFF chunk list and return (fmt fields, data chunk bytes).
    The data chunk is located by its chunk header — never by slicing from
    the end of the file — so trailing LIST/INFO metadata chunks and
    odd-size padding never contaminate the PCM samples."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, end = 12, len(payload)
    fmt_fields, data = None, None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return fmt_fields, data


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM-16 payload: format fields + sample statistics
    (mean, RMS, peak) computed vectorized over all frames."""
    import numpy as np

    fmt_fields, data = _wav_chunks(payload)
    audio_format, channels, sample_rate, _, _, bits = fmt_fields
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only PCM-16 WAV supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype("float64")
    n = int(samples.size)
    mean = float(samples.mean()) if n else 0.0
    rms = float(np.sqrt((samples * samples).mean())) if n else 0.0
    peak = int(np.abs(samples).max()) if n else 0
    frames = n // channels if channels else 0
    return {
        "kind": "audio",
        "channels": channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_samples": n,
        "duration_ms": int(frames * 1000 / sample_rate) if sample_rate else 0,
        "mean": mean,
        "rms": rms,
        "peak": peak,
    }


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal PNG writer (spec: W3C PNG, RFC 2083 — fully public).
    ``pixels`` is ``width*height*channels`` bytes, row 0 first, RGB order
    (channels=1 gray, 2 gray+alpha, 3 RGB, 4 RGBA); scanlines use filter
    type 0 and the stream is a single zlib-compressed IDAT."""
    import zlib

    if len(pixels) != width * height * channels:
        raise ValueError("pixels must be width*height*channels bytes")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = b"".join(b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int):
    """Reverse the per-scanline PNG filters (types 0–4: None, Sub, Up,
    Average, Paeth).  Sub/Average/Paeth are sequential in x, so the inner
    loop is per-byte — acceptable because payload decode is already the
    Arrow-batched Python path; rows are independent of rows two back, and
    Up/None rows vectorize."""
    import numpy as np

    out = np.zeros((height, stride), dtype=np.uint16)  # u16 avoids overflow mid-sum
    prev = np.zeros(stride, dtype=np.uint16)
    pos = 0
    for r in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.uint16)
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:  # Sub
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    cur[x] = (cur[x] + ((int(a) + int(b)) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pr) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur
        prev = cur
    return out.astype(np.uint8)


# Adam7 interlace passes: (x_start, y_start, x_step, y_step).  The
# deflate stream concatenates seven independent sub-images, each with its
# own per-scanline filter bytes (PNG spec §8.2).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

# legal (color_type -> sample channels / allowed bit depths) per PNG spec
# §11.2.2 — anything outside this table is a corrupt file, not an
# unimplemented variant
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}


def _png_samples(raw, width, height, channels, bit_depth, np):
    """Unfilter + bit-unpack one (sub)image's scanline stream.

    Returns ``(samples, bytes_consumed)`` where samples is a
    ``(height, width, channels)`` uint16 array of RAW samples (palette
    indices for color_type 3; unscaled 1/2/4/16-bit values otherwise).
    Shared by the sequential and each Adam7-pass decode."""
    bits_px = channels * bit_depth
    stride = (width * bits_px + 7) // 8
    fbpp = max(1, bits_px // 8)  # filter byte-offset unit (spec: >=1 byte)
    nbytes = height * (1 + stride)
    if len(raw) < nbytes:
        raise ValueError("PNG scanline data has wrong length")
    rows = _png_unfilter(raw[:nbytes], height, stride, fbpp)
    if bit_depth == 8:
        samples = rows[:, : width * channels].astype(np.uint16)
    elif bit_depth == 16:
        samples = rows.view(np.dtype(">u2"))[:, : width * channels].astype(np.uint16)
    else:  # 1/2/4-bit: MSB-first packed within each scanline byte
        bits = np.unpackbits(rows, axis=1)[:, : width * channels * bit_depth]
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint16)
        samples = (
            bits.reshape(height, width * channels, bit_depth) * weights
        ).sum(axis=2).astype(np.uint16)
    return samples.reshape(height, width, channels), nbytes


def _png_rgb(payload: bytes):
    """Full-format PNG parse shared by :func:`decode_png` (metadata +
    means) and :func:`_png_pixels` (phash): returns
    ``(width, height, color_type, bit_depth, rgb)`` with ``rgb`` a
    ``(height, width, 3)`` uint8 array in the 8-bit domain."""
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, end = 8, len(payload)
    width = height = None
    idat = []
    plte = None
    bit_depth = color_type = interlace = None
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            if size % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size  # len + tag + body + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None or bit_depth not in _PNG_DEPTHS[color_type] or interlace not in (0, 1):
        raise ValueError(
            f"illegal PNG layout (depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace})"
        )
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        px, used = _png_samples(raw, width, height, channels, bit_depth, np)
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        px = np.zeros((height, width, channels), dtype=np.uint16)
        ofs = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, used = _png_samples(raw[ofs:], pw, ph, channels, bit_depth, np)
            px[y0::dy, x0::dx, :] = sub
            ofs += used
        used = ofs
    if len(raw) != used:
        raise ValueError("PNG scanline data has wrong length")
    # raw samples -> 8-bit RGB domain
    if color_type == 3:
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[px[:, :, 0]]
    else:
        if bit_depth == 16:
            px8 = (px.astype(np.float64) / 257.0).round().astype(np.uint8)
        elif bit_depth < 8:
            px8 = (px * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
        else:
            px8 = px.astype(np.uint8)
        rgb = px8[:, :, :3] if channels >= 3 else np.repeat(px8[:, :, :1], 3, axis=2)
    return width, height, color_type, bit_depth, rgb


def decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decoder (zlib inflate + scanline unfiltering) for
    EVERY legal static-PNG pixel layout: 1/2/4/8/16-bit grayscale,
    8/16-bit RGB(A) and gray+alpha, 1/2/4/8-bit palette (PLTE), sequential
    or Adam7-interlaced — returns the same dict shape as :func:`decode_bmp`
    so downstream feature layout is codec-agnostic.  Illegal depth/color
    combinations and short streams raise ``ValueError`` (corrupt, per spec
    §11.2.2), no longer ``NotImplementedError``: the stdlib path covers the
    whole format.  tRNS transparency is ignored — features are RGB means."""
    import numpy as np

    width, height, color_type, bit_depth, rgb = _png_rgb(payload)
    channels = _PNG_CHANNELS[color_type]
    means = rgb.reshape(-1, 3).mean(axis=0).astype("float64") if rgb.size else np.zeros(3)
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "bpp": 24 if color_type == 3 else bit_depth * channels,
        "top_down": True,
        # keep decode_bmp's BGR field naming; PNG stores RGB
        "mean_b": float(means[2]),
        "mean_g": float(means[1]),
        "mean_r": float(means[0]),
    }


def decode_pil_image(payload: bytes) -> dict:
    """JPEG/PNG decode behind an OPTIONAL-PIL gate: if Pillow is
    importable the payload is decoded for real (dimensions + per-channel
    pixel means, the same dict shape :func:`decode_bmp` returns, so the
    feature layout downstream is codec-agnostic); without Pillow it
    raises the same honest ``NotImplementedError`` as before — behavior
    is decided by the environment, not by editing code.  The Spark plan
    is identical either way: only the inner decode function changes."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "JPEG/PNG decoding needs Pillow, which is not installed in this "
            "environment — pass fake=True for the deterministic stand-in "
            "decoder, or install Pillow to light up this path"
        ) from exc
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        arr = np.asarray(im.convert("RGB"), dtype="float64")
    means = arr.reshape(-1, 3).mean(axis=0) if arr.size else np.zeros(3)
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "bpp": 24,
        "top_down": True,
        # keep decode_bmp's BGR naming: PIL decodes RGB, so reverse
        "mean_b": float(means[2]),
        "mean_g": float(means[1]),
        "mean_r": float(means[0]),
    }


def decode_media(payload: bytes) -> dict:
    """Magic-byte dispatch to the real decoders.  JPEG/PNG go through the
    optional-PIL gate (:func:`decode_pil_image`); MP3/MP4 and other
    library-needing codecs stay honestly unimplemented."""
    if payload is None or len(payload) < 12:
        raise ValueError("payload too short to identify")
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # stdlib zlib path covers every legal static-PNG layout — no Pillow
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        try:
            from .jpeg import decode_jpeg  # pure-numpy baseline decoder

            d = decode_jpeg(payload)
            d.pop("pixels", None)  # keep the metadata dict lean
            return d
        except NotImplementedError:
            return decode_pil_image(payload)  # arithmetic/12-bit → PIL
    raise NotImplementedError(
        "real decoding implemented for BMP, PCM-16 WAV, all static PNG and "
        "baseline JPEG; exotic variants light up with Pillow; MP3/MP4 need "
        "ffmpeg — pass fake=True for the deterministic stand-in decoder"
    )


def _real_features(payload: bytes) -> list[float]:
    """Real decode → fixed FEATURE_DIM feature vector.

    Layout (zero-padded to FEATURE_DIM):
    image: [1, width, height, bpp, mean_b, mean_g, mean_r]
    audio: [2, channels, sample_rate, bits, n_samples, duration_ms, mean, rms, peak]
    """
    d = decode_media(payload)
    if d["kind"] == "image":
        v = [1.0, d["width"], d["height"], d["bpp"], d["mean_b"], d["mean_g"], d["mean_r"]]
    else:
        v = [
            2.0,
            d["channels"],
            d["sample_rate"],
            d["bits"],
            d["n_samples"],
            d["duration_ms"],
            d["mean"],
            d["rms"],
            d["peak"],
        ]
    return [float(x) for x in v] + [0.0] * (FEATURE_DIM - len(v))


def extract_features(df: DataFrame, fake: bool = False, batch_hint: int | None = None) -> DataFrame:
    """media table → (media_id, kind, features array<double>).

    ``mapInPandas``: Arrow-batched, per-partition iterator — the decode cost
    parallelizes with the scan and never collects to the driver.  At 100 TB
    the binary payloads dominate scan bytes; project only (media_id, kind,
    payload) into the UDF and repartition upstream by size if payloads skew.

    Real mode (``fake=False``) decodes BMP images and PCM-16 WAV audio with
    the stdlib parsers above; other codecs raise ``NotImplementedError``.
    ``fake=True`` keeps the bytes-derived deterministic stand-in for
    payloads in formats this container can't decode.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )
    featurize = _fake_features if fake else _real_features

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(featurize),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, schema=out_schema)


def extract_features_safe(df: DataFrame) -> DataFrame:
    """Skip-and-flag decode — what a real 100 TB media crawl needs.

    :func:`extract_features` re-raises on a bad payload, so ONE truncated
    or arithmetic-coded JPEG in a batch fails the whole job.  This variant
    returns (media_id, kind, ok, err_kind, features) per row: decode
    failures become data (``ok=false`` + a coarse error class) instead of
    exceptions, the pipeline survives, and the bad-shard rate is one
    ``groupBy(err_kind).count()`` away.  ``err_kind``:

    * ``unsupported`` — format variant the codec honestly refuses
      (arithmetic-coded or 12-bit JPEG, MP3 …): re-queue for a
      library-equipped cluster.
    * ``corrupt`` — truncated/garbled bytes: count, sample, drop.

    Same Arrow-batched ``mapInPandas`` plan as the strict variant; the
    try/except adds nothing to the per-row cost of the healthy path.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("err_kind", T.StringType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def safe(payload):
        try:
            return True, None, _real_features(payload)
        except NotImplementedError:
            return False, "unsupported", None
        except Exception:  # truncated/garbled bytes: struct, zlib, value…
            return False, "corrupt", None

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            trip = [safe(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "ok": [t[0] for t in trip],
                    "err_kind": [t[1] for t in trip],
                    "features": [t[2] for t in trip],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, schema=out_schema)


def resize_bmp(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbour resize of a 24-bit BMP payload → a new BMP
    payload at (out_w, out_h).  Pure numpy index arithmetic on the decoded
    pixel grid — no image library needed; the pixel-center mapping
    ``src = floor((i + 0.5) * src_dim / out_dim)`` is the standard
    nearest-neighbour kernel.  Raises on non-BMP input like decode_bmp
    (JPEG/PNG stay honestly unsupported in this container)."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _, width, height = struct.unpack_from("<Iii", payload, 14)
    _, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * row_size, offset=offset
    ).reshape(height, row_size)[:, : width * 3]
    px = rows.reshape(height, width, 3)
    if not top_down:
        px = px[::-1]  # normalize to row-0-first like encode_bmp expects
    ys = np.minimum(((np.arange(out_h) + 0.5) * height / out_h).astype("int64"), height - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * width / out_w).astype("int64"), width - 1)
    resized = px[ys][:, xs]
    return encode_bmp(out_w, out_h, resized.tobytes())


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """media table → (media_id, payload) with every BMP image payload
    resized to (out_w, out_h) — the preprocessing step a multimodal
    training pipeline runs before feature extraction.

    Same Arrow plumbing contract as :func:`extract_features`: project
    only (media_id, kind, payload) into ``mapInPandas``, decode/resize/
    re-encode per batch, non-image rows pass through untouched so the
    operator composes with mixed-media tables.  Non-BMP images raise —
    honest, like the codec layer.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                resize_bmp(p, out_w, out_h) if k == "image" else p
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "payload": payloads}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame offset,
    derived from metadata only (sequence over duration) — the decode of each
    frame is the stubbed step.  Shows the explode-then-decode shape that
    keeps frame extraction parallel."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


MJB_MAGIC = b"MJB0"


def encode_mjb(frames: list[bytes], frame_ms: int = 40) -> bytes:
    """Build a deterministic motion-BMP container: ``MJB0`` magic,
    uint32 frame count, uint32 per-frame duration, then each BMP
    payload length-prefixed (uint32 LE).  The stand-in for MP4/MKV in
    this no-ffmpeg sandbox — the container PARSING and per-frame decode
    plumbing are real; only the codec inside each frame is the
    already-real stdlib BMP path."""
    import struct

    out = [MJB_MAGIC, struct.pack("<II", len(frames), frame_ms)]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_mjb_index(payload: bytes) -> list[tuple[int, int, int]]:
    """Parse ONLY the container index: [(frame_idx, byte_offset,
    byte_length)] — no pixel decode.  This is the metadata pass a real
    pipeline runs to plan frame extraction (seek table), kept separate
    so sampling can skip bytes it never needs."""
    import struct

    if payload[:4] != MJB_MAGIC:
        raise ValueError("not an MJB container")
    n, _frame_ms = struct.unpack_from("<II", payload, 4)
    idx, off = [], 12
    for i in range(n):
        (length,) = struct.unpack_from("<I", payload, off)
        idx.append((i, off + 4, length))
        off += 4 + length
    if off != len(payload):
        raise ValueError("trailing bytes in MJB container")
    return idx


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling (upgrades :func:`frame_sample_plan`,
    whose decode step was stubbed): for each ``video`` row, parse the
    MJB seek table, slice out every ``every_n``-th frame's bytes, and
    decode it with the real BMP codec — one output row per sampled
    frame: (media_id, frame_idx, frame_ms, width, height, frame).

    Scale shape: ``mapInPandas`` over (media_id, payload) Arrow batches
    — per-video Python work is one index parse plus O(sampled frames)
    buffer slices; unsampled frames are never touched past their length
    field, and frames fan out WITHIN the batch so downstream per-frame
    ops (resize, features) inherit the parallelism of the video rows.
    """
    import struct

    import pandas as pd

    out_schema = (
        "media_id long, frame_idx int, frame_ms int, width int, height int,"
        " frame binary"
    )

    def run(pdfs):
        for pdf in pdfs:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                (_, per_ms) = struct.unpack_from("<II", payload, 4)
                for i, off, length in decode_mjb_index(payload):
                    if i % every_n:
                        continue
                    fb = payload[off : off + length]
                    meta = decode_bmp(fb)
                    rows.append(
                        (int(mid), i, i * per_ms, meta["width"], meta["height"], fb)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_idx",
                    "frame_ms",
                    "width",
                    "height",
                    "frame",
                ],
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=out_schema)
    )


def phash64(payload: bytes) -> int:
    """Perceptual 64-bit image hash (classic pHash recipe — public):
    decode → grayscale → nearest-neighbour 32×32 → 2-D DCT → keep the
    top-left 8×8 low-frequency block → threshold each coefficient
    against the block's MEDIAN (DC excluded from the median so flat
    images don't degenerate).  Robust to resize, recompression and
    brightness shifts; near-duplicate images differ in a few bits, so
    pairing is :func:`hamming64` / ``hamming_topk`` over the hashes —
    the image twin of text MinHash."""
    import numpy as np

    if payload[:2] == b"BM":
        rgb = _bmp_pixels(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        rgb = _png_pixels(payload)
    elif payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        rgb = decode_jpeg(payload)["pixels"].astype(np.float64)
    else:
        raise ValueError("phash64 needs a BMP/PNG/JPEG image payload")
    gray = rgb @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    small = gray[np.ix_(ys, xs)]
    n = 32
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.where(
        k == 0, np.sqrt(1.0 / n), np.sqrt(2.0 / n)
    )
    coef = c @ small @ c.T
    block = coef[:8, :8].reshape(-1)
    med = np.median(block[1:])  # DC excluded
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed 64-bit


def _bmp_pixels(payload: bytes):
    """24-bit BMP → H×W×3 RGB float array (top-down)."""
    import numpy as np

    (offset,) = struct.unpack_from("<I", payload, 10)
    _, width, height = struct.unpack_from("<Iii", payload, 14)
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) // 4 * 4
    px = (
        np.frombuffer(payload, dtype=np.uint8, count=height * row_size, offset=offset)
        .reshape(height, row_size)[:, : width * 3]
        .reshape(height, width, 3)
    )
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].astype(np.float64)  # BGR -> RGB


def _png_pixels(payload: bytes):
    """PNG → H×W×3 RGB float array via the shared full-format parser
    (:func:`_png_rgb`) — phash now accepts every legal PNG layout."""
    return _png_rgb(payload)[4].astype("float64")


def image_phash(df: DataFrame, fake: bool = False) -> DataFrame:
    """media table → (media_id, phash bigint) via ``mapInPandas`` — the
    Arrow-batched decode boundary shared by :func:`extract_features`.
    Downstream near-dup pairing is pure JVM (`bit_count(xor)`), so the
    image-dedup pipeline's only Python is the codec itself.  ``fake=True``
    hashes the payload bytes deterministically for undecodable formats."""
    import hashlib

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image":
                    continue
                if fake:
                    h = int.from_bytes(
                        hashlib.sha256(bytes(payload or b"")).digest()[:8],
                        "big",
                        signed=True,
                    )
                else:
                    h = phash64(bytes(payload))
                out.append((int(mid), h))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return df.mapInPandas(run, schema="media_id long, phash long")


def audio_fingerprint(payload: bytes, frame: int = 2048, hop: int = 1024,
                      bands: int = 17) -> list[int]:
    """Philips/Haitsma–Kalker-style robust audio fingerprint (public
    literature, ISMIR 2002): per overlapping frame, FFT → ``bands`` log-
    spaced band energies → one bit per band-pair from the SIGN of the
    energy difference derivative ``(E[b]−E[b+1]) − (prevE[b]−prevE[b+1])``
    — invariant to volume scaling (signs survive any positive gain) and
    robust to mild noise.  Returns one ``bands−1``-bit integer per frame;
    match score between clips = mean Hamming distance over aligned
    frames (JVM `bit_count(xor)` once the ints are in a column)."""
    import numpy as np

    fmt_fields, data = _wav_chunks(payload)
    audio_format, ch, _, _, _, bits = fmt_fields
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 WAV supported (fmt={audio_format}, bits={bits})"
        )
    samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
        np.float64
    )
    # mono mixdown
    if ch > 1:
        n = len(samples) // ch * ch
        samples = samples[:n].reshape(-1, ch).mean(axis=1)
    if len(samples) < frame:
        samples = np.pad(samples, (0, frame - len(samples)))
    edges = np.unique(
        np.geomspace(2, frame // 2, bands + 1).astype(int)
    )
    while len(edges) < bands + 1:  # tiny frames: pad distinct edges
        edges = np.append(edges, edges[-1] + 1)
    prev = None
    out = []
    win = np.hanning(frame)
    for start in range(0, len(samples) - frame + 1, hop):
        spec = np.abs(np.fft.rfft(samples[start : start + frame] * win)) ** 2
        e = np.array([spec[edges[b] : edges[b + 1]].sum() for b in range(bands)])
        if prev is not None:
            diff = (e[:-1] - e[1:]) - (prev[:-1] - prev[1:])
            bits = 0
            for i, v in enumerate(diff):
                if v > 0:
                    bits |= 1 << i
            out.append(bits)
        prev = e
    return out


def audio_fingerprints(df: DataFrame) -> DataFrame:
    """media table → (media_id, frame_idx, fp) via ``mapInPandas`` — one
    row per analysis frame; matching/joining happens JVM-side on the
    integer fingerprints (same discipline as :func:`image_phash`)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "audio":
                    continue
                for j, fp in enumerate(audio_fingerprint(bytes(payload))):
                    out.append((int(mid), j, fp))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "fp"])

    return df.mapInPandas(run, schema="media_id long, frame_idx int, fp long")
