"""SDXL pipeline tests on a tiny XL-topology config."""

import numpy as np
import pytest

import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'

STEPS = 12


@pytest.fixture(scope="module")
def pipe():
    return RegionDiffusionXL.random_init(
        seed=0,
        unet_cfg=cfg.TINY_XL_UNET,
        vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        text2_cfg=cfg.CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
            projection_dim=32,
        ),
        agg_start_step=3,
    )


def _px(pipe):
    return pipe.unet_cfg.sample_size * pipe.vae_scale_factor


def test_encode_prompt_layout(pipe):
    embeds, pooled = pipe.encode_prompt(["a cat", "a dog"], "")
    # [uncond, cat, dog]; concat width = hidden + hidden2
    assert embeds.shape == (3, 77, 32 + 32)
    assert pooled.shape == (3, 32)
    # force_zeros_for_empty_prompt: uncond rows are zero
    assert np.abs(np.asarray(embeds[0])).max() == 0
    assert np.abs(np.asarray(pooled[0])).max() == 0
    # non-empty negative → non-zero uncond
    e2, p2 = pipe.encode_prompt(["a cat"], "ugly")
    assert np.abs(np.asarray(e2[0])).max() > 0


def test_plain_branch_and_aggregates(pipe):
    px = _px(pipe)
    img = pipe.sample(["a cat"], "", height=px, width=px,
                      num_inference_steps=STEPS, guidance_scale=5.0,
                      run_rich_text=False, seed=1)
    assert img.shape == (1, px, px, 3)
    agg = pipe.attn_aggregates
    seg = pipe.unet_cfg.sample_size // 2
    assert agg.self_sum.shape == (seg * seg, seg * seg)
    # SDXL accumulates: row sums ≈ layers × accumulated steps
    assert agg.self_sum.sum() > 0
    assert agg.cross_layer_count > 0


def test_rich_branch_full_controls(pipe):
    px = _px(pipe)
    lat = pipe.unet_cfg.sample_size
    pipe.masks = [
        np.full((1, lat, lat), 0.6, np.float32),
        np.full((1, lat, lat), 0.4, np.float32),
    ]
    fmt = {
        "word_pos": np.asarray([3, 4]),
        "font_size": np.asarray([4.0, -2.0]),
        "target_RGB": [np.asarray([1.0, 0.0, 0.0])],
        "guidance_start_step": 999,
        "color_guidance_weight": 0.5,
        "color_obj_atten": [np.full((1, px, px), 0.5, np.float32)],
        "color_obj_atten_all": np.full((1, lat, lat), 0.5, np.float32),
    }
    img = pipe.sample(
        ["red rose", "a garden with a red rose"], "",
        height=px, width=px, num_inference_steps=STEPS, guidance_scale=5.0,
        run_rich_text=True, use_guidance=True, inject_selfattn=0.4,
        inject_background=0.3, text_format_dict=fmt, seed=2,
    )
    assert img.shape == (1, px, px, 3)
    assert np.isfinite(img.astype(np.float64)).all()


def test_euler_init_noise_scaling(pipe):
    """Initial latents are scaled by init_noise_sigma (SDXL prepare_latents)."""
    plan = pipe.scheduler.plan(STEPS)
    assert 14.0 < plan.init_noise_sigma < 15.0  # SD-schedule sigma_max ≈ 14.6


@pytest.mark.slow  # extra rich-scan compile (~1-2 min on CPU)
def test_rich_guidance_downsample(pipe):
    """Opt-in pooled-latent color guidance on XL: runs, finite, steers."""
    px = _px(pipe)
    lat = pipe.unet_cfg.sample_size
    pipe.masks = [
        np.full((1, lat, lat), 0.6, np.float32),
        np.full((1, lat, lat), 0.4, np.float32),
    ]
    fmt = {
        "target_RGB": [np.asarray([1.0, 0.0, 0.0])],
        "guidance_start_step": 999,
        "color_guidance_weight": 0.5,
        "color_obj_atten": [np.full((1, px, px), 0.5, np.float32)],
        "color_obj_atten_all": np.full((1, lat, lat), 0.5, np.float32),
    }

    def run(w):
        f = dict(fmt, color_guidance_weight=w)
        return pipe.sample(
            ["red rose", "a garden with a red rose"], "",
            height=px, width=px, num_inference_steps=STEPS,
            guidance_scale=5.0, run_rich_text=True, use_guidance=True,
            text_format_dict=f, seed=4, guidance_downsample=2,
        )

    img = run(0.5)
    assert img.shape == (1, px, px, 3)
    assert np.isfinite(img.astype(np.float64)).all()
    img_off = run(0.0)
    assert np.abs(
        img.astype(np.int32) - img_off.astype(np.int32)
    ).max() > 0, "downsampled guidance had no effect"
