"""Baseline JPEG codec tests (ITU-T T.81; pure numpy).

The encoder/decoder pair is validated three ways: analytically (a uniform
block is DC-only, and a DC value on the quantization lattice must
roundtrip EXACTLY), perceptually (smooth gradients reconstruct within a
few levels at high quality — the DCT's design case), and structurally
(markers, dimensions, subsampling factors, honest rejects)."""

import numpy as np
import pytest

from time_series_databse_engine_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def test_uniform_block_roundtrips_exactly_both_samplings():
    # v=130: level-shifted DC = 8*(130-128) = 16, divisible by the
    # quality-50 luma DC quant step (16) -> zero quantization error
    img = np.full((16, 16, 3), 130, dtype=np.uint8)
    for ss in ("444", "420"):
        d = decode_jpeg(encode_jpeg(16, 16, img.tobytes(), quality=50, subsampling=ss))
        assert (d["width"], d["height"]) == (16, 16)
        assert d["pixels"].min() == d["pixels"].max() == 130


def test_gradient_reconstruction_within_tolerance():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([(yy * 8) % 256, (xx * 8) % 256, ((xx + yy) * 4) % 256], axis=2).astype(
        np.uint8
    )
    d444 = decode_jpeg(encode_jpeg(32, 32, img.tobytes(), quality=90))
    assert np.abs(d444["pixels"].astype(int) - img.astype(int)).max() <= 5
    d420 = decode_jpeg(encode_jpeg(32, 32, img.tobytes(), quality=90, subsampling="420"))
    # chroma is quarter-resolution: bounded but looser
    assert np.abs(d420["pixels"].astype(int) - img.astype(int)).max() <= 16


def test_grayscale_and_odd_dimensions():
    yy, xx = np.mgrid[0:19, 0:13]
    img = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(13, 19, img.tobytes(), quality=90, grayscale=True))
    assert (d["width"], d["height"]) == (13, 19)
    assert d["pixels"].shape == (19, 13, 3)
    assert np.abs(d["pixels"][:, :, 0].astype(int) - img.astype(int)).max() <= 3
    # grayscale replicates into the three channel means
    assert d["mean_r"] == d["mean_g"] == d["mean_b"]


def test_honest_rejects():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(encode_jpeg(8, 8, img.tobytes()))
    # flip SOF0 -> SOF9 (arithmetic coding): must refuse, not mis-decode
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00not a jpeg")


def _noise_rgb(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_progressive_is_bit_identical_to_baseline():
    """progressive=True re-orders the SAME quantized coefficients into a
    successive-approximation scan script (DC first/refine + two spectral
    AC bands first/refine, per-scan K.2-optimal Huffman tables) — so the
    decoder must reproduce the baseline pixels EXACTLY, at every size and
    sampling.  This cross-checks the whole Annex-G scan machinery."""
    for w, h in [(8, 8), (13, 19), (17, 7), (32, 32), (1, 1), (9, 2)]:
        img = _noise_rgb(w, h, seed=w * 100 + h)
        for ss in ("444", "420"):
            pb = decode_jpeg(encode_jpeg(w, h, img.tobytes(), subsampling=ss))["pixels"]
            pp = decode_jpeg(
                encode_jpeg(w, h, img.tobytes(), subsampling=ss, progressive=True)
            )["pixels"]
            assert np.array_equal(pb, pp), (w, h, ss)
    g = _noise_rgb(21, 11)[:, :, 0]
    pb = decode_jpeg(encode_jpeg(21, 11, g.tobytes(), grayscale=True))["pixels"]
    pp = decode_jpeg(encode_jpeg(21, 11, g.tobytes(), grayscale=True, progressive=True))[
        "pixels"
    ]
    assert np.array_equal(pb, pp)


def test_progressive_eob_runs_across_blocks():
    """A mostly-flat image makes long runs of AC-empty blocks, forcing
    EOBn (n>=1) symbols and the decoder's cross-block EOB-run skip path;
    one bright feature ensures the runs start and stop mid-scan."""
    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    img[30:34, 30:34] = 255
    pb = decode_jpeg(encode_jpeg(64, 64, img.tobytes()))["pixels"]
    pp = decode_jpeg(encode_jpeg(64, 64, img.tobytes(), progressive=True))["pixels"]
    assert np.array_equal(pb, pp)


def test_restart_intervals_roundtrip_and_resync():
    """restart_interval=N emits DRI + RSTn every N MCUs; the decoder
    byte-aligns, checks the marker sequence and resets DC predictors —
    output must equal the no-restart encoding exactly.  A corrupted
    restart sequence number must raise, not desync silently."""
    img = _noise_rgb(40, 24, seed=7)
    plain = encode_jpeg(40, 24, img.tobytes())
    rst = encode_jpeg(40, 24, img.tobytes(), restart_interval=2)
    assert any(rst[i] == 0xFF and 0xD0 <= rst[i + 1] <= 0xD7 for i in range(len(rst) - 1))
    assert np.array_equal(decode_jpeg(plain)["pixels"], decode_jpeg(rst)["pixels"])
    # 420 multi-block MCUs + grayscale
    rst420 = encode_jpeg(40, 24, img.tobytes(), subsampling="420", restart_interval=1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(40, 24, img.tobytes(), subsampling="420"))["pixels"],
        decode_jpeg(rst420)["pixels"],
    )
    # corrupt the first RSTn's sequence number
    bad = bytearray(rst)
    for i in range(len(bad) - 1):
        if bad[i] == 0xFF and 0xD0 <= bad[i + 1] <= 0xD7:
            bad[i + 1] = 0xD0 + ((bad[i + 1] - 0xD0 + 3) & 7)
            break
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(bad))


def test_progressive_through_media_pipeline(spark):
    """The production decode path (decode_media -> extract_features_safe)
    accepts progressive payloads without the PIL fallback: ok=true rows
    with real features."""
    from time_series_databse_engine_spark.operators.multimodal import (
        decode_media,
        extract_features_safe,
    )

    img = _noise_rgb(16, 16, seed=1)
    prog = encode_jpeg(16, 16, img.tobytes(), progressive=True)
    assert decode_media(prog)["kind"] == "image"
    df = spark.createDataFrame(
        [(1, "image", bytearray(prog))], "media_id long, kind string, payload binary"
    )
    row = extract_features_safe(df).collect()[0]
    assert (row.ok, row.err_kind) == (True, None)
    assert row.features is not None


def test_dispatch_through_decode_media_and_spark_features(spark):
    from time_series_databse_engine_spark.operators.multimodal import (
        decode_media,
        extract_features,
    )

    img = np.full((16, 16, 3), 130, dtype=np.uint8)
    enc = encode_jpeg(16, 16, img.tobytes(), quality=50)
    d = decode_media(enc)
    assert (d["kind"], d["width"], d["height"]) == ("image", 16, 16)
    assert "pixels" not in d  # metadata dict stays lean through dispatch
    df = spark.createDataFrame(
        [(1, "image", bytearray(enc))], "media_id long, kind string, payload binary"
    )
    f = extract_features(df, fake=False).collect()[0].features
    assert (f[0], f[1], f[2]) == (1.0, 16.0, 16.0)
    assert f[4] == f[5] == f[6] == 130.0  # exact uniform roundtrip
