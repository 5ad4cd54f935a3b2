"""Experimental Pallas conv3x3: correctness vs XLA (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from rich_text_to_image_tpu.ops.conv import conv3x3, conv3x3_supported


@pytest.mark.parametrize("B,H,W,C,O", [(2, 8, 8, 128, 128), (1, 16, 16, 256, 128)])
def test_conv3x3_matches_xla(B, H, W, C, O):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    assert conv3x3_supported(x.shape, w.shape)
    want = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_supported_gate():
    assert not conv3x3_supported((1, 8, 8, 100), (3, 3, 100, 128))
    assert not conv3x3_supported((1, 8, 8, 128), (5, 5, 128, 128))
    assert conv3x3_supported((2, 64, 64, 320), (3, 3, 320, 320))


def test_conv3x3_strip_grid(monkeypatch):
    """Force SH < H so the dynamic strip-offset path is exercised."""
    from rich_text_to_image_tpu.ops import conv as conv_mod

    monkeypatch.setattr(conv_mod, "VMEM_BUDGET", 600 * 1024)
    B, H, W, C, O = 1, 32, 32, 64, 64
    SH, NT = conv_mod._pick_tiles(H, W, C, O)
    assert SH < H, (SH, NT)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    want = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = conv_mod.conv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
