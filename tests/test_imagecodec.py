import numpy as np

from moonlink_spark.functions.imagecodec import (
    decode,
    encode,
    png_decode,
    png_encode,
    psnr,
    qjpg_decode,
    qjpg_encode,
    synth_pixels,
)


def test_png_roundtrip_exact():
    px = synth_pixels(7, 64, 32)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_qjpg_lossy_psnr():
    px = synth_pixels(11, 96, 128)
    out = qjpg_decode(qjpg_encode(px))
    assert out.shape == px.shape
    p = psnr(px, out)
    assert 40.0 <= p < 60.0, p


def test_dispatch():
    px = synth_pixels(3, 32, 32)
    assert np.array_equal(decode(encode(px, "png"), "png"), px)
    assert psnr(px, decode(encode(px, "jpeg"), "jpeg")) >= 40.0


def test_determinism():
    a = synth_pixels(5, 32, 64)
    b = synth_pixels(5, 32, 64)
    assert np.array_equal(a, b)
    assert encode(a, "png") == encode(b, "png")
