"""Pipeline under a device mesh: sharded run == single-device run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.parallel.mesh import make_mesh
from rich_text_to_image_tpu.pipelines.region_sd import (

    RegionDiffusion,
    RichControlSpec,
)


pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'


def _make(mesh=None):
    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, dtype=jnp.float32, mesh=mesh,
    )


def test_rich_pass_matches_under_mesh():
    h = cfg.TINY_UNET.sample_size
    px = h * 2 ** (len(cfg.TINY_VAE.block_out_channels) - 1)
    masks = [
        np.full((1, h, h), 0.5, np.float32),
        np.full((1, h, h), 0.5, np.float32),
    ]
    latents = jnp.asarray(
        np.random.RandomState(0).randn(1, h, h, 4), jnp.float32
    )

    ref_pipe = _make()
    ref_pipe.masks = masks
    embeds = ref_pipe.get_text_embeds(["a red rose", "a garden"], [""])
    out_ref = ref_pipe.produce_latents(
        embeds, height=px, width=px, num_inference_steps=6, latents=latents,
        spec=RichControlSpec(guidance_scale=6.0),
    )

    mesh_pipe = _make(mesh=make_mesh(8, tp=2))  # dp=4, tp=2
    mesh_pipe.masks = masks
    embeds_m = mesh_pipe.get_text_embeds(["a red rose", "a garden"], [""])
    out_mesh = mesh_pipe.produce_latents(
        embeds_m, height=px, width=px, num_inference_steps=6, latents=latents,
        spec=RichControlSpec(guidance_scale=6.0),
    )
    np.testing.assert_allclose(
        np.asarray(out_mesh), np.asarray(out_ref), rtol=1e-3, atol=1e-4
    )


def test_batched_txt2img_under_mesh():
    px = cfg.TINY_UNET.sample_size * 2 ** (
        len(cfg.TINY_VAE.block_out_channels) - 1
    )
    pipe = _make(mesh=make_mesh(8, tp=1))  # pure dp=8
    imgs = pipe.text_to_images(
        ["a", "b", "c", "d", "e", "f", "g", "h"], height=px, width=px,
        num_inference_steps=4, seed=1,
    )
    assert imgs.shape[0] == 8
    assert np.isfinite(imgs.astype(np.float64)).all()


def test_sdxl_rich_pass_matches_under_mesh():
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

    def _make_xl(mesh=None):
        return RegionDiffusionXL.random_init(
            seed=0, unet_cfg=cfg.TINY_XL_UNET, vae_cfg=cfg.TINY_VAE,
            text_cfg=cfg.TINY_TEXT,
            text2_cfg=cfg.CLIPTextConfig(
                vocab_size=1000, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=2,
                hidden_act="gelu", projection_dim=32,
            ),
            dtype=jnp.float32, mesh=mesh,
        )

    h = cfg.TINY_XL_UNET.sample_size
    px = h * 2 ** (len(cfg.TINY_VAE.block_out_channels) - 1)
    rng = np.random.RandomState(4)
    soft = rng.rand(3, h, h).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    masks = [soft[i][None] for i in range(3)]
    latent = jnp.asarray(rng.randn(1, h, h, 4), jnp.float32)
    prompts = ["a red rose", "a garden", "a rose garden"]

    ref = _make_xl()
    ref.masks = masks
    out_ref = ref.prompt_to_img(
        prompts, "", height=px, width=px, num_inference_steps=4,
        guidance_scale=5.0, latents=latent, seed=2, inject_selfattn=0.4,
    )

    mesh_pipe = _make_xl(mesh=make_mesh(8, tp=2))  # dp=4, tp=2
    mesh_pipe.masks = masks
    out_mesh = mesh_pipe.prompt_to_img(
        prompts, "", height=px, width=px, num_inference_steps=4,
        guidance_scale=5.0, latents=latent, seed=2, inject_selfattn=0.4,
    )
    diff = np.abs(out_mesh.astype(np.int32) - out_ref.astype(np.int32))
    assert diff.max() <= 2 and np.mean(diff) < 0.1
