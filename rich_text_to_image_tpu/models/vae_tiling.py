"""Tiled / sliced VAE decoding (the TPU-relevant part of the reference's
"efficient" SDXL variant).

Parity target: diffusers AutoencoderKL.tiled_decode as exposed by
``enable_vae_tiling`` (reference region_diffusion_sdxl.py:168-183) — split
the latent into overlapping tiles, decode each, linearly blend the seams.
The reference's other memory tricks (CPU offload, meta devices) are CUDA
workarounds with no TPU counterpart (region_diffusion_sdxl.py:185-235).

TPU adaptation: XLA wants static shapes, so instead of decoding ragged edge
tiles (a recompile per distinct edge size), the latent is edge-padded up
front to a whole number of tile strides and every tile decode reuses ONE
compiled program; the final image is cropped back. Numerics: interior tiles
and seams match diffusers exactly (differential-tested,
tests/test_vae_tiling.py). Near the image's right/bottom edges a real
(non-pixel-local) decoder's conv receptive field sees edge-replicated
latents where diffusers' ragged edge tiles see the VAE's own boundary
padding, so a band of up to the decoder receptive field at those two edges
can diverge slightly from diffusers — accepted: the alternative is one
recompile per distinct edge-tile shape.

``sliced_decode`` is the batch-dimension analogue (enable_vae_slicing,
region_diffusion_sdxl.py:150-158).
"""

from __future__ import annotations

import numpy as np


def _blend_v(a: np.ndarray, b: np.ndarray, extent: int) -> np.ndarray:
    """Blend the bottom `extent` rows of a into the top rows of b (NHWC)."""
    extent = min(a.shape[1], b.shape[1], extent)
    out = b.copy()
    for y in range(extent):
        w = y / extent
        out[:, y] = a[:, a.shape[1] - extent + y] * (1 - w) + b[:, y] * w
    return out


def _blend_h(a: np.ndarray, b: np.ndarray, extent: int) -> np.ndarray:
    """Blend the right `extent` cols of a into the left cols of b (NHWC)."""
    extent = min(a.shape[2], b.shape[2], extent)
    out = b.copy()
    for x in range(extent):
        w = x / extent
        out[:, :, x] = a[:, :, a.shape[2] - extent + x] * (1 - w) + b[:, :, x] * w
    return out


def tiled_decode(
    decode_fn,
    z: np.ndarray,
    tile_latent: int = 64,
    overlap_factor: float = 0.25,
    scale: int = 8,
) -> np.ndarray:
    """Decode latent z [B,h,w,C] (NHWC) in overlapping tiles.

    decode_fn: jitted latent-tile [B,tile,tile,C] → pixels
    [B,tile*scale,tile*scale,3]. Semantics mirror diffusers
    AutoencoderKL.tiled_decode (overlap_size / blend_extent / row_limit).
    """
    z = np.asarray(z)
    B, h, w, C = z.shape
    if h <= tile_latent and w <= tile_latent:
        return np.asarray(decode_fn(z))

    overlap = int(tile_latent * (1 - overlap_factor))          # latent stride
    blend = int(tile_latent * scale * overlap_factor)          # pixel blend
    row_limit = tile_latent * scale - blend                    # pixels kept

    # Edge-pad so every tile is full size (ONE compiled tile program).
    starts_i = list(range(0, h, overlap))
    starts_j = list(range(0, w, overlap))
    need_h = starts_i[-1] + tile_latent
    need_w = starts_j[-1] + tile_latent
    zp = np.pad(z, [(0, 0), (0, need_h - h), (0, need_w - w), (0, 0)],
                mode="edge")

    rows = []
    for i in starts_i:
        row = []
        for j in starts_j:
            tile = zp[:, i:i + tile_latent, j:j + tile_latent]
            row.append(np.asarray(decode_fn(tile), dtype=np.float32))
        rows.append(row)

    # Blend against RAW decoded neighbors and crop at append — exactly
    # diffusers AutoencoderKL.tiled_decode's loop structure.
    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend)
            result_row.append(tile[:, :row_limit, :row_limit])
        result_rows.append(np.concatenate(result_row, axis=2))
    dec = np.concatenate(result_rows, axis=1)
    return dec[:, : h * scale, : w * scale]


def sliced_decode(decode_fn, z: np.ndarray) -> np.ndarray:
    """Decode one batch row at a time (enable_vae_slicing semantics)."""
    z = np.asarray(z)
    if z.shape[0] == 1:
        return np.asarray(decode_fn(z))
    return np.concatenate(
        [np.asarray(decode_fn(z[i:i + 1])) for i in range(z.shape[0])], axis=0
    )
