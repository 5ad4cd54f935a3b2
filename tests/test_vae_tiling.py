"""Tiled/sliced VAE decode vs a literal numpy port of diffusers'
AutoencoderKL.tiled_decode (the reference's enable_vae_tiling,
region_diffusion_sdxl.py:168-183).

The oracle decodes ragged edge tiles directly (diffusers semantics); ours
edge-pads to one static tile shape. With a *local* decode function the two
are exactly equal everywhere (padding only produces pixels that get cropped
away), which is what these tests exploit.
"""

import numpy as np
import pytest

from rich_text_to_image_tpu.models.vae_tiling import (
    sliced_decode,
    tiled_decode,
)

SCALE = 8


def local_decode(z):
    """Deterministic, pixel-local fake decoder: nearest ×8 + channel mix."""
    z = np.asarray(z, np.float32)
    up = z.repeat(SCALE, axis=1).repeat(SCALE, axis=2)
    mix = np.array([[0.5, -0.2, 0.1], [0.3, 0.4, -0.1],
                    [0.2, 0.1, 0.6], [-0.1, 0.2, 0.3]], np.float32)
    return np.tanh(up @ mix)


def _oracle_blend_v(a, b, extent):
    extent = min(a.shape[1], b.shape[1], extent)
    b = b.copy()
    for y in range(extent):
        b[:, y] = a[:, a.shape[1] - extent + y] * (1 - y / extent) + \
            b[:, y] * (y / extent)
    return b


def _oracle_blend_h(a, b, extent):
    extent = min(a.shape[2], b.shape[2], extent)
    b = b.copy()
    for x in range(extent):
        b[:, :, x] = a[:, :, a.shape[2] - extent + x] * (1 - x / extent) + \
            b[:, :, x] * (x / extent)
    return b


def oracle_tiled_decode(z, tile_latent, overlap_factor=0.25, scale=SCALE):
    """Literal port of diffusers AutoencoderKL.tiled_decode (NHWC)."""
    overlap_size = int(tile_latent * (1 - overlap_factor))
    blend_extent = int(tile_latent * scale * overlap_factor)
    row_limit = tile_latent * scale - blend_extent

    rows = []
    for i in range(0, z.shape[1], overlap_size):
        row = []
        for j in range(0, z.shape[2], overlap_size):
            tile = z[:, i:i + tile_latent, j:j + tile_latent]
            row.append(local_decode(tile))
        rows.append(row)
    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _oracle_blend_v(rows[i - 1][j], tile, blend_extent)
            if j > 0:
                tile = _oracle_blend_h(row[j - 1], tile, blend_extent)
            result_row.append(tile[:, :row_limit, :row_limit])
        result_rows.append(np.concatenate(result_row, axis=2))
    return np.concatenate(result_rows, axis=1)[
        :, : z.shape[1] * scale, : z.shape[2] * scale]


@pytest.mark.parametrize("h,w", [(24, 24), (24, 40), (33, 24)])
def test_tiled_matches_diffusers_port(h, w):
    rng = np.random.RandomState(0)
    z = rng.randn(1, h, w, 4).astype(np.float32)
    got = tiled_decode(local_decode, z, tile_latent=16, scale=SCALE)
    want = oracle_tiled_decode(z, tile_latent=16)
    assert got.shape == (1, h * SCALE, w * SCALE, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tile_larger_than_input_is_untiled():
    rng = np.random.RandomState(1)
    z = rng.randn(2, 8, 8, 4).astype(np.float32)
    got = tiled_decode(local_decode, z, tile_latent=16, scale=SCALE)
    np.testing.assert_array_equal(got, local_decode(z))


def test_sliced_decode_matches_batched():
    rng = np.random.RandomState(2)
    z = rng.randn(3, 8, 8, 4).astype(np.float32)
    np.testing.assert_allclose(
        sliced_decode(local_decode, z), local_decode(z), rtol=1e-6)


@pytest.mark.slow  # ~1.5 min pipeline construction — tiling numerics are
# covered by the fast differential tests above
def test_pipeline_toggle_api():
    """enable/disable methods exist and route decode_latents (tiny model)."""
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

    m = RegionDiffusionXL.random_init(
        seed=0,
        unet_cfg=cfg.TINY_XL_UNET,
        vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        text2_cfg=cfg.CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
            projection_dim=32,
        ),
    )
    z = np.random.RandomState(3).randn(1, 16, 16, 4).astype(np.float32)
    base = m.decode_latents(z)
    m.enable_vae_slicing()
    np.testing.assert_array_equal(m.decode_latents(z), base)
    m.disable_vae_slicing()
    m.enable_vae_tiling()
    tiled = m.decode_latents(z)  # 16 ≤ tile size → passthrough
    np.testing.assert_array_equal(tiled, base)
    m.disable_vae_tiling()
