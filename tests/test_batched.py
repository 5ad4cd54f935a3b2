"""Batched plain txt2img throughput path."""

import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'


@pytest.fixture(scope="module")
def pipe():
    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
    )


def test_text_to_images_batch(pipe):
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    imgs = pipe.text_to_images(
        ["a cat", "a dog", "a bird"], height=px, width=px,
        num_inference_steps=8, seed=4,
    )
    assert imgs.shape == (3, px, px, 3)
    assert imgs.dtype == np.uint8
    # different prompts → different images (distinct latents per row too)
    assert np.abs(imgs[0].astype(int) - imgs[1].astype(int)).max() > 0


def test_batch_row_matches_plain_pass():
    """Row i of the batch equals a single-prompt run with that row's latent.

    Uses an fp32 pipeline: batching is semantically exact (verified to
    ~2e-5 here); in bf16 a random chaotic tiny UNet amplifies fusion-order
    rounding into visible divergence, which would test noise, not batching.
    """
    import jax
    import jax.numpy as jnp

    from rich_text_to_image_tpu.pipelines.region_sd import _plan_arrays

    pipe = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, dtype=jnp.float32,
    )
    h = w = pipe.unet_cfg.sample_size
    steps = 3
    latents = jax.random.normal(jax.random.PRNGKey(9), (2, h, w, 4))
    embeds = pipe.get_text_embeds(["a cat"], [""])
    plan = pipe.scheduler.plan(steps)
    fn = pipe._plain_fn((h, w), plan.num_steps, h // 2, (), ())
    lat_single, _, _ = fn(pipe.unet_params, latents[0:1], embeds,
                          _plan_arrays(plan), jnp.float32(7.5))

    bfn = pipe._batch_fn((h, w), plan.num_steps, 2)
    uncond = jnp.tile(embeds[0:1], (2, 1, 1))
    cond = jnp.concatenate(
        [embeds[1:2], pipe.get_text_embeds(["a dog"], [""])[1:2]], axis=0
    )
    lat_batch = bfn(pipe.unet_params, latents,
                    jnp.concatenate([uncond, cond], axis=0),
                    _plan_arrays(plan), jnp.float32(7.5),
                    jnp.ones((plan.num_steps,), bool))
    np.testing.assert_allclose(
        np.asarray(lat_batch[0]), np.asarray(lat_single[0]),
        rtol=1e-3, atol=1e-4,
    )
