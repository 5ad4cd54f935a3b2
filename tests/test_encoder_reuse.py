"""Encoder-reuse turbo mode ("Faster Diffusion", arXiv 2312.09608).

The rich-pass scan can cache the UNet down path (x, skips) at key steps and
decode from the cache between them. Checks, on a tiny random-weight config:

  * the machinery is exact when every step is a key step (1-step run with
    stride 2 == stride 1 bitwise-ish);
  * multi-step reuse runs, is finite, and actually engages (differs from
    the exact path);
  * reuse composes with the reference-trajectory injection mode.
"""

import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipe():
    return RegionDiffusion.random_init(
        seed=0,
        unet_cfg=cfg.TINY_UNET,
        vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        agg_start_step=3,
    )


@pytest.fixture(scope="module")
def pipe_xl():
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


def _setup_masks(pipe, n_regions=2):
    lat = pipe.unet_cfg.sample_size
    rng = np.random.RandomState(0)
    soft = rng.rand(n_regions + 1, lat, lat).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    pipe.masks = [soft[i][None] for i in range(n_regions + 1)]
    return lat * 2 ** (len(pipe.vae_cfg.block_out_channels) - 1)


def test_reuse_machinery_exact_on_key_steps(pipe):
    px = _setup_masks(pipe)
    prompts = ["a red rose", "a green bush", "a rose bush"]
    kw = dict(height=px, width=px, num_inference_steps=1,
              guidance_scale=7.5, seed=11)
    base = pipe.prompt_to_img(prompts, [""], **kw)
    reuse = pipe.prompt_to_img(prompts, [""], encoder_reuse=2, **kw)
    # single step ⇒ the only step is a key step ⇒ cond true-branch ⇒ exact
    np.testing.assert_allclose(
        base.astype(np.float32), reuse.astype(np.float32), atol=1.0
    )


def test_reuse_multi_step_runs_and_engages(pipe):
    px = _setup_masks(pipe)
    prompts = ["a red rose", "a green bush", "a rose bush"]
    kw = dict(height=px, width=px, num_inference_steps=6,
              guidance_scale=7.5, seed=11)
    exact = pipe.prompt_to_img(prompts, [""], **kw)
    turbo = pipe.prompt_to_img(prompts, [""], encoder_reuse=3, **kw)
    assert turbo.shape == exact.shape
    assert np.isfinite(turbo.astype(np.float32)).all()
    # cached-encoder steps must actually change the computation
    assert np.abs(turbo.astype(np.int32) - exact.astype(np.int32)).max() > 0


def test_reuse_with_reference_injection(pipe):
    px = _setup_masks(pipe)
    prompts = ["a red rose", "a green bush", "a rose bush"]
    out = pipe.prompt_to_img(
        prompts, [""], height=px, width=px, num_inference_steps=6,
        guidance_scale=7.5, seed=3, inject_selfattn=0.4,
        inject_background=0.3, encoder_reuse=2,
    )
    assert np.isfinite(out.astype(np.float32)).all()


def test_reuse_batched_txt2img(pipe):
    px = _setup_masks(pipe)
    kw = dict(height=px, width=px, num_inference_steps=1, seed=4)
    base = pipe.text_to_images(["a cat", "a dog"], **kw)
    reuse = pipe.text_to_images(["a cat", "a dog"], encoder_reuse=2, **kw)
    # 1 step ⇒ key step only ⇒ exact
    np.testing.assert_allclose(
        base.astype(np.float32), reuse.astype(np.float32), atol=1.0
    )
    turbo = pipe.text_to_images(
        ["a cat", "a dog"], height=px, width=px, num_inference_steps=4,
        encoder_reuse=2, seed=4,
    )
    assert np.isfinite(turbo.astype(np.float32)).all()


def test_reuse_sdxl(pipe_xl):
    px = _setup_masks(pipe_xl)
    prompts = ["a red rose", "a green bush", "a rose bush"]
    kw = dict(height=px, width=px, num_inference_steps=1,
              guidance_scale=5.0, seed=7)
    base = pipe_xl.prompt_to_img(prompts, "", **kw)
    reuse = pipe_xl.prompt_to_img(prompts, "", encoder_reuse=2, **kw)
    np.testing.assert_allclose(
        base.astype(np.float32), reuse.astype(np.float32), atol=1.0
    )
    turbo = pipe_xl.prompt_to_img(
        prompts, "", height=px, width=px, num_inference_steps=4,
        guidance_scale=5.0, seed=7, inject_selfattn=0.4, encoder_reuse=2,
    )
    assert np.isfinite(turbo.astype(np.float32)).all()
