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
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00not a jpeg")


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
