"""Bicubic resize with torch/PIL-parity numerics, as two MXU matmuls.

The reference resizes attention maps and token masks with
``torch.nn.functional.interpolate(mode='bicubic', antialias=True)``
(utils/attention_utils.py:251,286,325; sample.py:83). jax.image.resize uses a
different kernel (Keys a=-0.5 with its own antialias windowing), so parity
requires a from-scratch implementation.

Design: resampling is separable, so we precompute dense 1-D weight matrices
on the host (numpy, static shapes) and apply them as two matmuls — the
TPU-native formulation (batched GEMMs on the MXU, no gathers). Weight
construction follows torch's upsample kernels (aten UpSampleKernel.cpp):

  * antialias=True → PIL-style windowed cubic, A=-0.5, support scaled by the
    downsampling factor, weights renormalized over the clipped window;
  * antialias=False → classic 4-tap cubic convolution, A=-0.75, border taps
    clamped to the edge.

Both paths use the align_corners=False center convention
``src = (dst + 0.5) * scale - 0.5``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float) -> np.ndarray:
    """Cubic convolution kernel (Keys); a=-0.75 torch default, -0.5 PIL/AA."""
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """(out_size, in_size) float32 row-stochastic resampling matrix."""
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    if antialias:
        # PIL-style: support widens by the scale factor when downsampling.
        a = -0.5
        filterscale = max(scale, 1.0)
        support = 2.0 * filterscale
        for i in range(out_size):
            center = scale * (i + 0.5)
            xmin = max(0, int(center - support + 0.5))
            xmax = min(in_size, int(center + support + 0.5))
            xs = np.arange(xmin, xmax, dtype=np.float64)
            w = _cubic((xs - center + 0.5) / filterscale, a)
            s = w.sum()
            if s != 0:
                w = w / s
            W[i, xmin:xmax] = w
    else:
        # Classic 4-tap cubic, A=-0.75, edge-clamped taps.
        a = -0.75
        for i in range(out_size):
            src = (i + 0.5) * scale - 0.5
            f = np.floor(src)
            taps = np.arange(f - 1, f + 3, dtype=np.int64)
            w = _cubic(src - taps, a)
            taps = np.clip(taps, 0, in_size - 1)
            for t, wt in zip(taps, w):
                W[i, t] += wt
    return W.astype(np.float32)


def resize_bicubic(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    antialias: bool = True,
) -> jnp.ndarray:
    """Bicubic-resize the last two axes of ``img`` to ``out_hw``.

    Any number of leading batch/channel axes. fp32 accumulation regardless of
    input dtype (matching torch, which upcasts for interpolation).
    """
    in_h, in_w = img.shape[-2], img.shape[-1]
    out_h, out_w = out_hw
    dtype = img.dtype
    x = img.astype(jnp.float32)
    if in_h != out_h:
        Wh = jnp.asarray(_resize_matrix(in_h, out_h, antialias))
        x = jnp.einsum("oh,...hw->...ow", Wh, x)
    if in_w != out_w:
        Ww = jnp.asarray(_resize_matrix(in_w, out_w, antialias))
        x = jnp.einsum("ow,...hw->...ho", Ww, x)
    return x.astype(dtype)
