"""PNG codec + phash unit tests (pure numpy, no Spark)."""

import numpy as np
import pytest

from scrapeulous_spark.codec.png import (
    QPNG_STEP,
    encode,
    png_decode,
    png_encode,
    psnr,
    quantize,
)
from scrapeulous_spark.codec.phash import phash64
from scrapeulous_spark.sources.corpus import image_pixels


def test_png_roundtrip_exact():
    pix = image_pixels("img_00000001", 32, 24)
    assert pix.shape == (24, 32, 3) and pix.dtype == np.uint8
    out = png_decode(png_encode(pix))
    np.testing.assert_array_equal(out, pix)


def test_qpng_psnr_above_40db():
    pix = image_pixels("img_00000002", 32, 24)
    dec = png_decode(encode(pix, "qpng"))
    np.testing.assert_array_equal(dec, quantize(pix))
    val = psnr(pix, dec)
    assert val >= 40.0, val
    assert np.abs(dec.astype(int) - pix.astype(int)).max() <= QPNG_STEP // 2


def test_psnr_identical_is_inf():
    pix = image_pixels("img_00000003", 16, 16)
    assert psnr(pix, pix) == float("inf")


def test_phash_deterministic_and_discriminative():
    a = image_pixels("img_00000004", 32, 24)
    b = image_pixels("img_00000005", 32, 24)
    assert phash64(a) == phash64(a)
    assert phash64(a) != phash64(b)
    assert -(1 << 63) <= phash64(a) < (1 << 63)


def test_phash_stable_under_quantization():
    # block-mean hash should usually survive step-4 quantization
    pix = image_pixels("img_00000006", 32, 24)
    ha, hb = phash64(pix), phash64(quantize(pix))
    assert bin(ha ^ hb).count("1") <= 4


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
