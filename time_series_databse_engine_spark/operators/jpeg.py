"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF — fully public spec).

Decoder: baseline sequential DCT, 8-bit, grayscale or YCbCr with any
h/v sampling factors ≤ 2 (4:4:4, 4:2:2, 4:2:0), single interleaved scan,
canonical Huffman tables, FF00 byte unstuffing.  Progressive (SOF2),
arithmetic coding, 12-bit precision and restart intervals raise
``NotImplementedError`` honestly.

Encoder: baseline 4:4:4 (or grayscale) with the Annex-K example
quantization (quality-scaled, IJG formula) and Annex-K typical Huffman
tables — enough to produce real, spec-conformant payloads for tests and
for the Spark-side multimodal plumbing.

This is the last of the multimodal codecs that could be implemented
without external libraries; entropy coding runs per 8×8 block in Python,
which is fine inside the Arrow-batched ``mapInPandas`` decode stage where
payload parsing is already the declared Python boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — example luminance/chrominance quantization tables
K1_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
K1_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 — typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: IDCT is C.T @ coef @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (libjpeg jcparam.c formula —
    public source)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (tbl * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _build_huffman_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: map (code_length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code_length, code)."""
    return {v: k for k, v in _build_huffman_decode(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError("restart markers not supported")
            else:
                # marker reached — per spec the decoder pads with 1-bits
                b = 0xFF
                self.pos -= 1  # leave marker for the caller
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw ``size``-bit value to its signed
    coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _csize(v: int) -> int:
    """Coefficient magnitude category (number of bits)."""
    a = abs(v)
    s = 0
    while a:
        a >>= 1
        s += 1
    return s


def _encode_block(bw: _BitWriter, plane: np.ndarray, ys: int, xs: int,
                  qtbl: np.ndarray, dc_enc: dict, ac_enc: dict, prev_dc: int) -> int:
    """FDCT + quantize + Huffman-encode one 8×8 block (the caller pads
    every plane to whole MCUs); returns the new DC predictor."""
    block = plane[ys : ys + 8, xs : xs + 8]
    coef = _fdct2(block - 128.0)
    zz = np.round(coef / qtbl).astype(np.int64).reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    size = _csize(diff)
    length, code = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
        size = _csize(v)
        length, code = ac_enc[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        length, code = ac_enc[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(width: int, height: int, pixels: bytes, quality: int = 90,
                grayscale: bool = False, subsampling: str = "444") -> bytes:
    """Baseline JFIF encoder.  ``pixels`` is ``width*height*3`` RGB bytes
    (row 0 first) — or ``width*height`` gray bytes with ``grayscale=True``.
    ``subsampling``: "444" (every component full resolution) or "420"
    (chroma averaged 2×2 and coded at quarter resolution — the common
    camera/web layout, and the path that exercises the decoder's
    multi-block MCU interleave).  Annex-K tables quality-scaled with the
    IJG formula."""
    ncomp = 1 if grayscale else 3
    if len(pixels) != width * height * ncomp:
        raise ValueError("pixels length must match width*height*components")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, ncomp).astype(np.float64)
    if grayscale:
        planes = [arr[:, :, 0]]
        factors = [(1, 1)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            def down2(p):
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                full = np.empty((ph, pw))
                full[: p.shape[0], : p.shape[1]] = p
                full[p.shape[0] :, : p.shape[1]] = p[-1:, :]
                full[:, p.shape[1] :] = full[:, p.shape[1] - 1 : p.shape[1]]
                return (full[0::2, 0::2] + full[1::2, 0::2] + full[0::2, 1::2] + full[1::2, 1::2]) / 4.0

            planes = [y, down2(cb), down2(cr)]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]

    qt = [_quality_scale(K1_LUMA, quality).reshape(8, 8)]
    if not grayscale:
        qt.append(_quality_scale(K1_CHROMA, quality).reshape(8, 8))

    dc_enc = [_build_huffman_encode(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_enc = [_build_huffman_encode(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not grayscale:
        dc_enc.append(_build_huffman_encode(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_enc.append(_build_huffman_encode(AC_CHROMA_BITS, AC_CHROMA_VALS))

    bw = _BitWriter()
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to whole MCUs with edge replication
    planes = [
        np.pad(
            p,
            ((0, mcuy * fv * 8 - p.shape[0]), (0, mcux * fh * 8 - p.shape[1])),
            mode="edge",
        )
        for p, (fh, fv) in zip(planes, factors)
    ]
    prev_dc = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                ti = 0 if ci == 0 else 1
                fh, fv = factors[ci]
                for v in range(fv):
                    for h in range(fh):
                        ys = (my * fv + v) * 8
                        xs = (mx * fh + h) * 8
                        prev_dc[ci] = _encode_block(
                            bw, planes[ci], ys, xs, qt[ti],
                            dc_enc[ti], ac_enc[ti], prev_dc[ci],
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, t in enumerate(qt):
        out += seg(0xFFDB, bytes([ti]) + bytes(int(x) for x in t.reshape(-1)[ZIGZAG]))
    comp = b"".join(
        struct.pack(
            "BBB", i + 1, (factors[i][0] << 4) | factors[i][1], 0 if i == 0 else 1
        )
        for i in range(ncomp)
    )
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, ncomp) + comp)
    huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not grayscale:
        huffs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in huffs:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    scomp = b"".join(
        struct.pack("BB", i + 1, 0x00 if i == 0 else 0x11) for i in range(ncomp)
    )
    out += seg(0xFFDA, bytes([ncomp]) + scomp + b"\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JPEG decoder → the same dict shape as ``decode_bmp``
    (dimensions + per-channel means) plus the full pixel array under
    ``"pixels"`` (H×W×3 uint8 RGB) for tests and feature extraction."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    width = height = None
    scan_comps = None
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential DCT (SOF0) supported, got SOF{marker - 0xC0}"
            )
        elif marker == 0xC0:  # SOF0
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 0xF
                if hs > 2 or vs > 2:
                    raise NotImplementedError("sampling factors > 2 not supported")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(body[p + 17 : p + 17 + nvals])
                huff[(tc, th)] = _build_huffman_decode(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            data_start = pos + seglen
            break
        pos += seglen
    if comps is None or scan_comps is None:
        raise ValueError("missing SOF/SOS segment")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        c = by_id[sc["id"]]
        c["dcsel"], c["acsel"] = sc["dc"], sc["ac"]
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["prev_dc"] = 0

    br = _BitReader(payload, data_start)
    order = [by_id[sc["id"]] for sc in scan_comps]
    for my in range(mcuy):
        for mx in range(mcux):
            for c in order:
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        dc_tab = huff[(0, c["dcsel"])]
                        ac_tab = huff[(1, c["acsel"])]
                        size = br.decode_symbol(dc_tab)
                        diff = _extend(br.read_bits(size), size)
                        c["prev_dc"] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = c["prev_dc"]
                        i = 1
                        while i < 64:
                            sym = br.decode_symbol(ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                i += 16
                                continue
                            i += run
                            if i > 63:
                                raise ValueError("AC run overflows block")
                            zz[i] = _extend(br.read_bits(size), size)
                            i += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qt[c["tq"]].reshape(-1)[ZIGZAG]
                        px = _idct2(coef.reshape(8, 8)) + 128.0
                        ys = (my * c["v"] + v) * 8
                        xs = (mx * c["h"] + h) * 8
                        c["plane"][ys : ys + 8, xs : xs + 8] = px

    out_planes = []
    for c in comps:
        p = c["plane"]
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:height, :width])
    if len(out_planes) == 1:
        y = out_planes[0]
        rgb = np.clip(np.stack([y, y, y], axis=2), 0, 255).astype(np.uint8)
    else:
        y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
    means = rgb.reshape(-1, 3).mean(axis=0).astype("float64")
    return {
        "kind": "image",
        "width": int(width),
        "height": int(height),
        "bpp": 24,
        "top_down": True,
        "mean_b": float(means[2]),
        "mean_g": float(means[1]),
        "mean_r": float(means[0]),
        "pixels": rgb,
    }
