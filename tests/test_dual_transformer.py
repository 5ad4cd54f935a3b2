"""DualTransformer2D: dual-conditioned attention blocks (versatile-
diffusion-style checkpoints).

Behavioral contract pinned against the reference's DualTransformer2DModel
(models/dual_transformer_2d.py:97-151): the condition sequence is split at
``condition_lengths``, condition i is encoded by stream
``transformer_index[i]``, and the two residual deltas are mixed by
``mix_ratio``. Unused by SD-1.5/SDXL configs — gated behind
``UNetConfig.dual_cross_attention``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.models.init_utils import fast_init
from rich_text_to_image_tpu.models.unet import (
    EMPTY_CAPTURE,
    DualTransformer2D,
    Transformer2D,
    UNet2DCondition,
    UNetControls,
)

L0, L1 = 7, 5  # tiny condition lengths


def _dual(mix):
    return DualTransformer2D(
        heads=2, dim=16, depth=1, kv_dim=32, use_linear_projection=False,
        groups=8, condition_lengths=(L0, L1), transformer_index=(1, 0),
        mix_ratio=mix,
    )


@pytest.fixture(scope="module")
def dual_params():
    x = jnp.zeros((1, 4, 4, 16))
    ctx = jnp.zeros((1, L0 + L1, 32))
    params = _dual(0.5).init(
        jax.random.PRNGKey(0), x, ctx, UNetControls(), EMPTY_CAPTURE, None)
    return params


def test_mix_is_convex_combination_of_stream_deltas(dual_params):
    """y(mix) == x + mix*d0 + (1-mix)*d1 for every mix (reference :145-146)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, L0 + L1, 32))
    args = (x, ctx, UNetControls(), EMPTY_CAPTURE, None)
    y_a = _dual(1.0).apply(dual_params, *args)   # pure condition-0 delta
    y_b = _dual(0.0).apply(dual_params, *args)   # pure condition-1 delta
    y_m = _dual(0.3).apply(dual_params, *args)
    want = x + 0.3 * (y_a - x) + 0.7 * (y_b - x)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_condition_routing_matches_reference_index_map(dual_params):
    """Condition 0 (first L0 tokens) runs through stream 1, condition 1
    through stream 0 — the reference's transformer_index_for_condition
    default (1, 0) (reference :95-96,135)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, L0 + L1, 32))
    sub = Transformer2D(2, 16, 1, 32, False, 8)
    args_tail = (UNetControls(), EMPTY_CAPTURE, None)

    y0 = _dual(1.0).apply(dual_params, x, ctx, *args_tail)
    direct0 = sub.apply(
        {"params": dual_params["params"]["transformers_1"]},
        x, ctx[:, :L0], *args_tail)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(direct0),
                               rtol=1e-5, atol=1e-5)

    y1 = _dual(0.0).apply(dual_params, x, ctx, *args_tail)
    direct1 = sub.apply(
        {"params": dual_params["params"]["transformers_0"]},
        x, ctx[:, L0:], *args_tail)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(direct1),
                               rtol=1e-5, atol=1e-5)


def test_unet_dual_config_forward():
    """A UNet built with dual_cross_attention=True consumes the
    concatenated condition sequence and owns twin streams per block."""
    dual_cfg = dataclasses.replace(
        cfg.TINY_UNET, dual_cross_attention=True,
        dual_condition_lengths=(L0, L1))
    model = UNet2DCondition(dual_cfg)
    sample = jnp.zeros((1, 8, 8, 4))
    ehs = jnp.zeros((1, L0 + L1, dual_cfg.cross_attention_dim))
    params = fast_init(model, 0, sample, jnp.int32(0), ehs)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("transformers_0" in n for n in names)
    assert any("transformers_1" in n for n in names)

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4))
    e = jax.random.normal(jax.random.PRNGKey(6), (2, L0 + L1, 32))
    eps, _ = model.apply(params, x, jnp.int32(3), e)
    assert eps.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(eps)).all()


def test_degenerate_transformer_index_rejected():
    """transformer_index must be a permutation of (0, 1): a degenerate
    routing like (0, 0) would never initialize the other stream under flax
    lazy init, so a real dual checkpoint could not be loaded (ADVICE r4)."""
    bad = DualTransformer2D(
        heads=2, dim=16, depth=1, kv_dim=32, use_linear_projection=False,
        groups=8, condition_lengths=(L0, L1), transformer_index=(0, 0),
        mix_ratio=0.5,
    )
    x = jnp.zeros((1, 4, 4, 16))
    ctx = jnp.zeros((1, L0 + L1, 32))
    with pytest.raises(ValueError, match="permutation"):
        bad.init(jax.random.PRNGKey(0), x, ctx, UNetControls(),
                 EMPTY_CAPTURE, None)
