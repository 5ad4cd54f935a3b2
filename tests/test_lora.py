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


def _real_path(path):
    """Strip the flax 'params' root — real diffusers keys never carry it."""
    return path[1:] if path[0] == "params" else path


def _synth_lora(params, rng):
    """Diffusers-format LoRA tensors for EVERY attention projection."""
    sd = {}
    for path, leaf in _flatten(params).items():
        if path[-1] != "kernel" or path[-2] not in (
                "to_q", "to_k", "to_v", "to_out"):
            continue
        base = _unet_rule(_real_path(path))
        proj = path[-2]
        mod = base.rsplit(f".{proj}.", 1)[0]
        d_in, d_out = leaf.shape
        sd[f"{mod}.processor.{proj}_lora.down.weight"] = (
            rng.standard_normal((RANK, d_in)).astype(np.float32) * 0.1)
        sd[f"{mod}.processor.{proj}_lora.up.weight"] = (
            rng.standard_normal((d_out, RANK)).astype(np.float32) * 0.1)
    assert sd, "no attention projections found"
    # genuine-format guard: diffusers keys start at the block name, never
    # at the flax 'params' root (round-4 bug: the prefixed lookup could
    # only match synthetic checkpoints built from the same wrong rule)
    assert not any(k.startswith("params.") for k in sd)
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
            base = _unet_rule(_real_path(path))
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


# ------------------------------------------------------------- text encoder
def _synth_text_lora(text_params, rng, infix="lora_linear_layer"):
    """Diffusers LoraLoaderMixin text-encoder tensors for every attention
    projection (text_encoder.text_model.encoder.layers.<i>.self_attn
    .<proj>.<infix>.{down,up}.weight)."""
    from rich_text_to_image_tpu.models.convert import _clip_text_rule

    sd = {}
    for path, leaf in _flatten(text_params).items():
        if path[-1] != "kernel" or not path[-2].endswith("_proj"):
            continue
        mod = _clip_text_rule(_real_path(path)).removesuffix(".weight")
        d_in, d_out = leaf.shape
        sd[f"{mod}.{infix}.down.weight"] = (
            rng.standard_normal((RANK, d_in)).astype(np.float32) * 0.1)
        sd[f"{mod}.{infix}.up.weight"] = (
            rng.standard_normal((d_out, RANK)).astype(np.float32) * 0.1)
    assert sd and not any(k.startswith("params.") for k in sd)
    return sd


@pytest.fixture(scope="module")
def text_and_params():
    from rich_text_to_image_tpu.models.clip import CLIPTextModel

    model = CLIPTextModel(cfg.TINY_TEXT, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    return model, params


def test_text_lora_algebra_and_guards(text_and_params):
    """apply_lora_text merges W' = W + s·up@down into every attention
    projection; text_projection (outside text_model) stays untouched;
    unmatched tensors raise (VERDICT r4 missing #2 — the LoraLoaderMixin
    contract the reference inherits, region_diffusion_sdxl.py:56)."""
    from rich_text_to_image_tpu.models.convert import (
        _clip_text_rule,
        apply_lora_text,
    )

    _, params = text_and_params
    rng = np.random.default_rng(3)
    sd = _synth_text_lora(params, rng)
    scale = 0.6
    merged = apply_lora_text(params, sd, scale=scale)
    n = 0
    flat0, flat1 = _flatten(params), _flatten(merged)
    for path, w0 in flat0.items():
        w1 = flat1[path]
        if path[-1] == "kernel" and path[-2].endswith("_proj"):
            mod = _clip_text_rule(_real_path(path)).removesuffix(".weight")
            down = sd[f"{mod}.lora_linear_layer.down.weight"]
            up = sd[f"{mod}.lora_linear_layer.up.weight"]
            np.testing.assert_allclose(
                np.asarray(w1), np.asarray(w0) + scale * (up @ down).T,
                rtol=2e-6, atol=2e-6)
            n += 1
        else:
            assert w1 is w0
    assert n == 4 * cfg.TINY_TEXT.num_hidden_layers
    # a leading "text_encoder." prefix (LoraLoaderMixin layout) is tolerated
    prefixed = {f"text_encoder.{k}": v for k, v in sd.items()}
    assert apply_lora_text(params, prefixed, scale=0.5) is not params
    # older diffusers ".lora." infix accepted too
    old = _synth_text_lora(params, rng, infix="lora")
    assert apply_lora_text(params, old, scale=0.5) is not params
    bad = dict(sd)
    bad["text_model.encoder.layers.99.self_attn.q_proj."
        "lora_linear_layer.down.weight"] = np.zeros((RANK, 8), np.float32)
    with pytest.raises(ValueError, match="matched no projection"):
        apply_lora_text(params, bad)


def test_text_lora_shifts_embeddings_scale_zero_identity(text_and_params):
    """A loaded text LoRA must actually shift prompt embeddings; scale 0 is
    a strict identity (the 'done' bar from VERDICT r4 #6)."""
    from safetensors.numpy import save_file

    from rich_text_to_image_tpu.models.convert import apply_lora_text

    model, params = text_and_params
    rng = np.random.default_rng(4)
    sd = _synth_text_lora(params, rng)
    ids = jnp.asarray(rng.integers(0, cfg.TINY_TEXT.vocab_size, (2, 77)),
                      jnp.int32)
    e0 = model.apply(params, ids)["last_hidden_state"]

    merged = apply_lora_text(params, sd, scale=1.0)
    e1 = model.apply(merged, ids)["last_hidden_state"]
    assert float(jnp.abs(e1 - e0).max()) > 1e-4

    zero = apply_lora_text(params, sd, scale=0.0)
    e2 = model.apply(zero, ids)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e0),
                               rtol=0, atol=0)

    # round-trip through safetensors like a real checkpoint (import here to
    # keep the fixture light)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        save_file(sd, os.path.join(d, "text_lora.safetensors"))
        loaded = load_safetensors_dir(d)
    merged2 = apply_lora_text(params, loaded, scale=1.0)
    e3 = model.apply(merged2, ids)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(e3), np.asarray(e1),
                               rtol=1e-6, atol=1e-6)
