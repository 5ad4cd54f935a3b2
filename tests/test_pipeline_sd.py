"""End-to-end SD pipeline tests on a tiny random-weight config.

Covers the full flow of the reference sample.py: rich-text JSON → region
inputs → plain pass with attention aggregation → token maps → rich pass with
every control (compositing, font-size reweighting, self-attn + resnet
injection, background injection, gradient color guidance).
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sd import (
    RegionDiffusion,
    RichControlSpec,
)
from rich_text_to_image_tpu.utils import richtext
from rich_text_to_image_tpu.utils.token_maps import get_token_maps

pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'

STEPS = 12  # > agg_start_step so cross maps accumulate


@pytest.fixture(scope="module")
def pipe():
    return RegionDiffusion.random_init(
        seed=0,
        unet_cfg=cfg.TINY_UNET,
        vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        agg_start_step=3,
    )


PIXELS = cfg.TINY_UNET.sample_size * 8  # latent 8 → 2 VAE levels → px 16?


def _hw(pipe):
    lat = pipe.unet_cfg.sample_size
    px = lat * 2 ** (len(pipe.vae_cfg.block_out_channels) - 1)
    return lat, px


def test_plain_pass_and_aggregates(pipe):
    lat, px = _hw(pipe)
    imgs, agg = pipe.produce_attn_maps(
        ["a cat and a dog"], [""], height=px, width=px,
        num_inference_steps=STEPS, guidance_scale=7.5, seed=3,
    )
    assert imgs.shape == (1, px, px, 3)
    assert imgs.dtype == np.uint8
    seg = lat // 2
    assert agg.self_sum.shape == (seg * seg, seg * seg)
    assert agg.self_count > 0 and agg.cross_layer_count > 0
    assert np.isfinite(agg.self_sum).all()
    # self maps are row-stochastic sums over layers: rows ≈ self_count
    np.testing.assert_allclose(
        agg.self_sum.sum(-1), agg.self_count, rtol=2e-2
    )
    for r, m in agg.cross_sums.items():
        assert m.shape == (r * r, 77)
        assert np.isfinite(m).all()
        assert m.sum() > 0  # accumulated after agg_start_step


def test_full_rich_text_flow(pipe):
    lat, px = _hw(pipe)
    doc = json.loads(
        '{"ops":[{"insert":"a "},'
        '{"attributes":{"font":"mirza"},"insert":"garden"},'
        '{"insert":" with a "},'
        '{"attributes":{"color":"#ff0000","size":"60px"},"insert":"rose"},'
        '{"insert":" bush"}]}'
    )
    parsed = richtext.parse_json(doc)
    tok = pipe.tokenizer._tokenize
    region_prompts, region_ids, base_tokens = richtext.get_region_diffusion_input(
        tok, parsed
    )
    fmt = richtext.get_attention_control_input(tok, base_tokens, parsed)
    fmt, color_ids = richtext.get_gradient_guidance_input(
        tok, base_tokens, parsed, fmt, color_guidance_weight=0.5
    )
    assert len(region_prompts) == 3  # style + color + base

    _, agg = pipe.produce_attn_maps(
        [parsed.base_text_prompt], [""], height=px, width=px,
        num_inference_steps=STEPS, seed=5,
    )

    color_masks = get_token_maps(
        agg, [np.asarray(i) for i in color_ids[:-1]], (lat, lat),
        seed=5, segment_threshold=0.25, num_segments=3, n_init=5,
    )
    assert len(color_masks) == 2  # 1 span + background
    fmt["color_obj_atten"] = [
        np.broadcast_to(
            np.asarray(
                jnp.asarray(m)  # [1,lat,lat] → resize to pixels
            ),
            m.shape,
        )
        for m in color_masks[:-1]
    ]
    from rich_text_to_image_tpu.ops.resize import resize_bicubic

    fmt["color_obj_atten"] = [
        np.asarray(resize_bicubic(np.asarray(m), (px, px)))
        for m in color_masks[:-1]
    ]
    fmt["color_obj_atten_all"] = sum(np.asarray(m) for m in color_masks[:-1])

    masks = get_token_maps(
        agg, [np.asarray(i) for i in region_ids[:-1]], (lat, lat),
        seed=5, segment_threshold=0.25, num_segments=3, n_init=5,
    )
    assert len(masks) == 3
    total = sum(np.asarray(m) for m in masks)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)
    pipe.masks = masks

    img = pipe.prompt_to_img(
        region_prompts, [""], height=px, width=px,
        num_inference_steps=STEPS, guidance_scale=7.5,
        text_format_dict=fmt, use_guidance=True,
        inject_selfattn=0.3, inject_background=0.3, seed=5,
    )
    assert img.shape == (1, px, px, 3)
    assert np.isfinite(img.astype(np.float64)).all()


def test_rich_composite_reduces_to_plain_when_single_region(pipe):
    """With one region (the base prompt) and mask ≡ 1, the rich pass must
    equal a plain CFG pass — the compositing identity."""
    lat, px = _hw(pipe)
    h = w = lat
    pipe.masks = [np.ones((1, h, w), np.float32)]
    embeds = pipe.get_text_embeds(["a cat"], [""])
    latents = jnp.asarray(np.random.RandomState(0).randn(1, h, w, 4), jnp.float32)

    rich = pipe.produce_latents(
        embeds, height=px, width=px, num_inference_steps=STEPS,
        latents=latents, spec=RichControlSpec(guidance_scale=6.0),
    )

    # plain trajectory with the same scheduler/latents
    fn = pipe._plain_fn(
        (h, w), pipe.scheduler.plan(STEPS).num_steps, h // 2, (), ()
    )
    from rich_text_to_image_tpu.pipelines.region_sd import _plan_arrays

    plain, _, _ = fn(
        pipe.unet_params, latents, embeds,
        _plan_arrays(pipe.scheduler.plan(STEPS)), jnp.float32(6.0),
    )
    np.testing.assert_allclose(
        np.asarray(rich), np.asarray(plain), rtol=2e-2, atol=2e-3
    )


def test_injection_zero_matches_disabled(pipe):
    """inject_selfattn=0 with inject_background>0 runs the reference
    trajectory but must never inject (gates all false)."""
    lat, px = _hw(pipe)
    h = w = lat
    pipe.masks = [
        np.full((1, h, w), 0.5, np.float32),
        np.full((1, h, w), 0.5, np.float32),
    ]
    embeds = pipe.get_text_embeds(["a cat", "a cat and dog"], [""])
    latents = jnp.asarray(np.random.RandomState(1).randn(1, h, w, 4), jnp.float32)
    out = pipe.produce_latents(
        embeds, height=px, width=px, num_inference_steps=STEPS,
        latents=latents,
        spec=RichControlSpec(guidance_scale=5.0, inject_background=0.4),
    )
    assert np.isfinite(np.asarray(out)).all()
