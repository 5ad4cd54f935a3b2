"""SDXL invisible watermark (utils/watermark.py).

The reference watermarks every decoded SDXL/AnimeXL batch via diffusers'
StableDiffusionXLWatermarker (reference models/region_diffusion_sdxl.py
:29,:127,:943). These tests pin the TPU-native re-implementation: the
48-bit diffusers message survives a decode round-trip, the perturbation is
chroma-invisible, sub-256-px images pass through bit-exact (the reference
encoder's own gate), and the XL pipeline's image decode applies it.
"""

import numpy as np
import pytest

from rich_text_to_image_tpu.utils.watermark import (
    WATERMARK_BITS,
    apply_watermark,
    decode_watermark,
)


def _test_image(h=256, w=320, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish natural-image stand-in: low-freq gradient + mild noise
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [120 + 80 * np.sin(yy / 37.0), 90 + 70 * np.cos(xx / 53.0),
         140 + 60 * np.sin((xx + yy) / 71.0)], axis=-1)
    img = base + rng.normal(0, 6, size=(h, w, 3))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def test_roundtrip_recovers_message():
    img = _test_image()
    out = np.asarray(apply_watermark(img[None]))[0]
    bits, margin = decode_watermark(out)
    assert bits == WATERMARK_BITS
    assert margin > 0.5  # strong majority on every bit


def test_roundtrip_batch_and_solid_color():
    # solid frames (the trained-fixture eval regime) must still carry bits
    solid = np.full((2, 256, 256, 3), (200, 40, 40), np.uint8)
    out = np.asarray(apply_watermark(solid))
    for i in range(2):
        bits, _ = decode_watermark(out[i])
        assert bits == WATERMARK_BITS


def test_invisibility_bound():
    img = _test_image(seed=3)
    out = np.asarray(apply_watermark(img[None]))[0]
    delta = np.abs(out.astype(np.int32) - img.astype(np.int32))
    # block-mean QIM moves each pixel's U by at most scale/4 = 2, i.e.
    # ~4 in the blue channel (1/0.492) + rounding
    assert delta.max() <= 6
    assert delta.mean() < 1.5


def test_small_images_pass_through():
    img = _test_image(h=128, w=192)
    out = np.asarray(apply_watermark(img[None]))
    np.testing.assert_array_equal(out[0], img)


def test_pipeline_decode_applies_watermark(tiny_xl_pipe=None):
    """The XL pipeline's u8 decode path routes through _watermarked; a
    stub pipeline with `watermark = None` opts out (eval raw-pixel path)."""
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

    pipe = RegionDiffusionXL.__new__(RegionDiffusionXL)
    img = _test_image()
    out = np.asarray(pipe._watermarked(img[None]))[0]
    bits, _ = decode_watermark(out)
    assert bits == WATERMARK_BITS
    pipe.watermark = None
    np.testing.assert_array_equal(
        np.asarray(pipe._watermarked(img[None]))[0], img)


@pytest.mark.parametrize("w", [256, 260])
def test_non_multiple_of_four_widths(w):
    img = _test_image(h=258, w=w, seed=5)
    out = np.asarray(apply_watermark(img[None]))[0]
    assert out.shape == img.shape
    bits, _ = decode_watermark(out)
    assert bits == WATERMARK_BITS
