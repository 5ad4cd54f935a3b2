"""UNet LoRA capability (VERDICT r3 #8; reference
models/attention_processor.py:548-576, README.md:19 LoRA branch).

The reference keeps LoRA attention processors that add
``scale * up(down(x))`` to every attention projection at runtime; on TPU the
pair is merged into the projection weights at load time (mathematically
identical for inference). Round-trip: a synthetic diffusers-format LoRA
safetensors checkpoint → apply_lora_unet → per-layer algebra + forward
behavior verified.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.models.convert import (
    _flatten,
    _unet_rule,
    apply_lora_unet,
    load_safetensors_dir,
)
from rich_text_to_image_tpu.models.init_utils import fast_init
from rich_text_to_image_tpu.models.unet import UNet2DCondition

RANK = 4


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNet2DCondition(cfg.TINY_UNET, dtype=jnp.float32)
    params = fast_init(
        unet, 0,
        jnp.zeros((1, 8, 8, 4)), jnp.int32(0),
        jnp.zeros((1, 77, cfg.TINY_UNET.cross_attention_dim)),
        dtype=jnp.float32,
    )
    return unet, params


def _synth_lora(params, rng):
    """Diffusers-format LoRA tensors for EVERY attention projection."""
    sd = {}
    for path, leaf in _flatten(params).items():
        if path[-1] != "kernel" or path[-2] not in (
                "to_q", "to_k", "to_v", "to_out"):
            continue
        base = _unet_rule(path)
        proj = path[-2]
        mod = base.rsplit(f".{proj}.", 1)[0]
        d_in, d_out = leaf.shape
        sd[f"{mod}.processor.{proj}_lora.down.weight"] = (
            rng.standard_normal((RANK, d_in)).astype(np.float32) * 0.1)
        sd[f"{mod}.processor.{proj}_lora.up.weight"] = (
            rng.standard_normal((d_out, RANK)).astype(np.float32) * 0.1)
    assert sd, "no attention projections found"
    return sd


def test_lora_roundtrip_safetensors(unet_and_params, tmp_path):
    """Synthetic checkpoint → save → load → merge → per-layer algebra."""
    from safetensors.numpy import save_file

    unet, params = unet_and_params
    rng = np.random.default_rng(0)
    sd = _synth_lora(params, rng)
    save_file(sd, os.path.join(tmp_path, "lora.safetensors"))
    loaded = load_safetensors_dir(str(tmp_path))
    assert set(loaded) == set(sd)

    scale = 0.7
    merged = apply_lora_unet(params, loaded, scale=scale)

    flat0, flat1 = _flatten(params), _flatten(merged)
    n_checked = 0
    for path, w0 in flat0.items():
        w1 = flat1[path]
        if path[-1] == "kernel" and path[-2] in (
                "to_q", "to_k", "to_v", "to_out"):
            base = _unet_rule(path)
            mod = base.rsplit(f".{path[-2]}.", 1)[0]
            down = sd[f"{mod}.processor.{path[-2]}_lora.down.weight"]
            up = sd[f"{mod}.processor.{path[-2]}_lora.up.weight"]
            want = np.asarray(w0) + scale * (up @ down).T
            np.testing.assert_allclose(np.asarray(w1), want, rtol=2e-6,
                                       atol=2e-6)
            n_checked += 1
        else:
            assert w1 is w0  # non-attention params untouched
    assert n_checked >= 4 * 16  # 4 projections × (self+cross) × layers


def test_lora_forward_effect_and_scale_zero(unet_and_params):
    unet, params = unet_and_params
    rng = np.random.default_rng(1)
    sd = _synth_lora(params, rng)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    ehs = jnp.asarray(rng.standard_normal((1, 77, 32)), jnp.float32)

    eps0, _ = unet.apply(params, x, jnp.int32(500), ehs)
    merged = apply_lora_unet(params, sd, scale=1.0)
    eps1, _ = unet.apply(merged, x, jnp.int32(500), ehs)
    assert float(jnp.abs(eps1 - eps0).max()) > 1e-4  # LoRA changed the net

    zero = apply_lora_unet(params, sd, scale=0.0)
    eps2, _ = unet.apply(zero, x, jnp.int32(500), ehs)
    np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps0),
                               rtol=0, atol=0)  # scale 0 = identity


def test_lora_unet_prefix_and_unused_key_guard(unet_and_params):
    _, params = unet_and_params
    rng = np.random.default_rng(2)
    sd = _synth_lora(params, rng)
    # a leading "unet." prefix (LoraLoaderMixin layout) is tolerated
    prefixed = {f"unet.{k}": v for k, v in sd.items()}
    merged = apply_lora_unet(params, prefixed, scale=0.5)
    assert merged is not params
    # unmatched tensors raise (key-mapping drift guard)
    bad = dict(sd)
    bad["mid_block.attentions.9.processor.to_q_lora.down.weight"] = (
        np.zeros((RANK, 8), np.float32))
    with pytest.raises(ValueError, match="matched no UNet projection"):
        apply_lora_unet(params, bad)
