"""Bicubic resize parity vs torch.nn.functional.interpolate (CPU oracle)."""

import numpy as np
import pytest

from rich_text_to_image_tpu.ops.resize import resize_bicubic

torch = pytest.importorskip("torch")
F = torch.nn.functional


@pytest.mark.parametrize(
    "in_hw,out_hw,antialias",
    [
        ((32, 32), (64, 64), True),  # token maps 32² → latent 64² (SD 512²)
        ((32, 32), (128, 128), True),  # → SDXL latent
        ((64, 64), (32, 32), True),  # self-attn maps down to 32²
        ((16, 16), (32, 32), True),
        ((64, 64), (512, 512), True),  # masks → pixel space (sample.py:83)
        ((32, 32), (45, 31), True),  # non-integer scale
        ((32, 32), (64, 64), False),
        ((64, 64), (32, 32), False),
        ((7, 9), (20, 14), False),
    ],
)
def test_matches_torch(in_hw, out_hw, antialias):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), out_hw, mode="bicubic", antialias=antialias
    ).numpy()
    got = np.asarray(resize_bicubic(x, out_hw, antialias=antialias))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_identity():
    x = np.random.RandomState(1).randn(1, 4, 16, 16).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize_bicubic(x, (16, 16))), x)


def test_leading_axes_flexible():
    x = np.random.RandomState(2).randn(5, 8, 8).astype(np.float32)
    out = resize_bicubic(x, (16, 16))
    assert out.shape == (5, 16, 16)
    x2 = np.random.RandomState(3).randn(8, 8).astype(np.float32)
    assert resize_bicubic(x2, (4, 4)).shape == (4, 4)
