"""Batched color-benchmark path vs the sequential reference protocol.

color_bench_batch runs K colors in one scan, sharing the reference
trajectory rows; per item it must reproduce the sequential
prompt_to_img(use_guidance, inject_selfattn=0.2, inject_background=0.3)
result (benchmark_color.py's "ours" setting) to float tolerance.
"""

import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.ops.resize import resize_bicubic
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

pytestmark = pytest.mark.slow

STEPS = 5


@pytest.fixture(scope="module")
def pipe():
    import jax.numpy as jnp

    # fp32 so the comparison is exact (bf16 introduces benign ±1-2 uint8
    # drift between the differently-fused batched/sequential programs)
    return RegionDiffusion.random_init(
        seed=0,
        unet_cfg=cfg.TINY_UNET,
        vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        agg_start_step=2,
        dtype=jnp.float32,
    )


def test_colorbatch_matches_sequential(pipe):
    import jax
    import jax.numpy as jnp

    lat = pipe.unet_cfg.sample_size
    px = lat * 2 ** (len(pipe.vae_cfg.block_out_channels) - 1)
    rng = np.random.RandomState(0)
    soft = rng.rand(2, lat, lat).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    pipe.masks = [soft[0][None], soft[1][None]]
    region_mask_px = np.asarray(
        resize_bicubic(soft[0][None], (px, px))
    ).clip(0, 1)[0]

    base_prompt = "a photo of a car on the road"
    colors = {"red": (255, 0, 0), "teal": (0, 128, 128), "navy": (0, 0, 128)}
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, lat, lat, 4))

    region_prompts = [f"{n} car" for n in colors]
    rgbs = np.stack([np.asarray(v, np.float32) / 255.0
                     for v in colors.values()])
    batched = pipe.color_bench_batch(
        region_prompts, base_prompt, rgbs, region_mask_px,
        px, px, STEPS, 8.5, seed=1, latents=jnp.asarray(latent),
    )
    assert batched.shape == (3, px, px, 3)

    for k, name in enumerate(colors):
        fmt = {
            "guidance_start_step": 999,
            "color_guidance_weight": 1,
            "target_RGB": [rgbs[k]],
            "color_obj_atten": [region_mask_px[None]],
            "color_obj_atten_all": np.asarray(pipe.masks[0]),
        }
        seq = pipe.prompt_to_img(
            [region_prompts[k], base_prompt], [""], height=px, width=px,
            num_inference_steps=STEPS, guidance_scale=8.5,
            latents=jnp.asarray(latent), text_format_dict=fmt,
            use_guidance=True, inject_selfattn=0.2, inject_background=0.3,
            seed=1,
        )
        # fp32: the two programs compute identical math (exact on CPU;
        # allow a whisker for accelerator fusion differences)
        diff = np.abs(batched[k].astype(np.int32) - seq[0].astype(np.int32))
        assert np.mean(diff) < 0.1, f"{name}: mean |Δ| = {np.mean(diff)}"
        assert diff.max() <= 2, f"{name}: max |Δ| = {diff.max()}"


def test_bf16_guidance_close_to_fp32(pipe):
    """bf16 guidance decode: same pipeline, gradient in bf16 — output
    must stay close to the fp32-guided result (it's a guidance direction,
    not the image path)."""
    import jax
    import jax.numpy as jnp

    lat = pipe.unet_cfg.sample_size
    px = lat * 2 ** (len(pipe.vae_cfg.block_out_channels) - 1)
    rng = np.random.RandomState(7)
    soft = rng.rand(2, lat, lat).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    pipe.masks = [soft[0][None], soft[1][None]]
    rm = np.asarray(resize_bicubic(soft[0][None], (px, px))).clip(0, 1)[0]
    fmt = {
        "guidance_start_step": 999,
        "color_guidance_weight": 1,
        "target_RGB": [np.asarray([1.0, 0.0, 0.0], np.float32)],
        "color_obj_atten": [rm[None]],
        "color_obj_atten_all": np.asarray(pipe.masks[0]),
    }
    latent = jax.random.normal(jax.random.PRNGKey(3), (1, lat, lat, 4))
    kw = dict(height=px, width=px, num_inference_steps=4,
              guidance_scale=8.5, latents=jnp.asarray(latent),
              text_format_dict=fmt, use_guidance=True, seed=3)
    f32 = pipe.prompt_to_img(["red car", "a car"], [""], **kw)
    b16 = pipe.prompt_to_img(["red car", "a car"], [""],
                             bf16_guidance=True, **kw)
    diff = np.abs(f32.astype(np.float32) - b16.astype(np.float32))
    assert np.isfinite(b16.astype(np.float32)).all()
    assert np.mean(diff) < 8.0, f"mean |Δ| = {np.mean(diff)}"


def test_stylebatch_matches_sequential(pipe):
    """style_bench_batch (pure K-item batching, R=2, no injection) must
    reproduce sequential prompt_to_img per item (fp32 exact)."""
    import jax
    import jax.numpy as jnp

    lat = pipe.unet_cfg.sample_size
    px = lat * 2 ** (len(pipe.vae_cfg.block_out_channels) - 1)
    rng = np.random.RandomState(2)
    soft = rng.rand(3, lat, lat).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    pipe.masks = [soft[i][None] for i in range(3)]

    scene = "a cat next to a dog"
    items = [
        ["a cat in the style of monet", "a dog in the style of van gogh",
         scene],
        ["a cat in the style of dali", "a dog in the style of picasso",
         scene],
    ]
    latent = jax.random.normal(jax.random.PRNGKey(9), (1, lat, lat, 4))
    batched = pipe.style_bench_batch(
        items, px, px, 5, 8.5, seed=2, latents=jnp.asarray(latent)
    )
    assert batched.shape == (2, px, px, 3)
    for k, item in enumerate(items):
        seq = pipe.prompt_to_img(
            item, [""], height=px, width=px, num_inference_steps=5,
            guidance_scale=8.5, latents=jnp.asarray(latent), seed=2,
        )
        diff = np.abs(batched[k].astype(np.int32) - seq[0].astype(np.int32))
        assert np.mean(diff) < 0.1 and diff.max() <= 2, f"item {k}"


def test_colorbatch_under_mesh():
    """dp-sharded batched color bench == single-device (the item axis is
    the dp axis — SURVEY §7.6(b) batch-DP over benchmark work items)."""
    import jax.numpy as jnp

    from rich_text_to_image_tpu.parallel.mesh import make_mesh

    def _make(mesh=None):
        return RegionDiffusion.random_init(
            seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
            text_cfg=cfg.TINY_TEXT, dtype=jnp.float32, mesh=mesh,
        )

    lat = cfg.TINY_UNET.sample_size
    px = lat * 2 ** (len(cfg.TINY_VAE.block_out_channels) - 1)
    rng = np.random.RandomState(1)
    soft = rng.rand(2, lat, lat).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    masks = [soft[0][None], soft[1][None]]
    region_mask_px = np.asarray(
        resize_bicubic(soft[0][None], (px, px))
    ).clip(0, 1)[0]
    rgbs = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0]],
                      np.float32)
    region_prompts = ["red car", "green car", "blue car", "olive car"]
    import jax

    latent = jax.random.normal(jax.random.PRNGKey(2), (1, lat, lat, 4))
    args = (region_prompts, "a car", rgbs, region_mask_px, px, px, 4, 8.5)

    ref = _make()
    ref.masks = masks
    out_ref = ref.color_bench_batch(*args, latents=jnp.asarray(latent))

    mesh_pipe = _make(mesh=make_mesh(8, tp=2))  # dp=4: 4 items shard 1/chip
    mesh_pipe.masks = masks
    out_mesh = mesh_pipe.color_bench_batch(*args, latents=jnp.asarray(latent))
    diff = np.abs(out_mesh.astype(np.int32) - out_ref.astype(np.int32))
    assert diff.max() <= 2 and np.mean(diff) < 0.1


def test_guidance_downsample_runs_and_guides(pipe):
    """--guidance_downsample d (opt-in): the pooled-latent guidance must
    (a) actually steer (output differs from color_w=0), (b) stay finite,
    (c) fall back to the exact path when the latent isn't divisible by d
    (d=3 on an 8x8 latent == d=1 bit-for-bit)."""
    import jax
    import jax.numpy as jnp

    lat = pipe.unet_cfg.sample_size
    px = lat * 2 ** (len(pipe.vae_cfg.block_out_channels) - 1)
    rng = np.random.RandomState(3)
    soft = rng.rand(2, lat, lat).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    pipe.masks = [soft[0][None], soft[1][None]]
    region_mask_px = np.asarray(
        resize_bicubic(soft[0][None], (px, px))
    ).clip(0, 1)[0]
    latent = jax.random.normal(jax.random.PRNGKey(7), (1, lat, lat, 4))
    rgbs = np.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    prompts = ["red car", "blue car"]
    base = "a photo of a car"

    def batch(**kw):
        return pipe.color_bench_batch(
            prompts, base, rgbs, region_mask_px, px, px, STEPS, 8.5,
            seed=2, latents=jnp.asarray(latent), **kw,
        )

    img_ds = batch(guidance_downsample=2)
    img_off = batch(color_guidance_weight=0.0, guidance_downsample=2)
    assert np.isfinite(img_ds.astype(np.float64)).all()
    assert np.abs(
        img_ds.astype(np.int32) - img_off.astype(np.int32)
    ).max() > 0, "downsampled guidance had no effect"

    fmt = {
        "guidance_start_step": 999,
        "color_guidance_weight": 1,
        "target_RGB": [rgbs[0]],
        "color_obj_atten": [region_mask_px[None]],
        "color_obj_atten_all": np.asarray(pipe.masks[0]),
    }

    def seq(gds):
        return pipe.prompt_to_img(
            [prompts[0], base], [""], height=px, width=px,
            num_inference_steps=STEPS, guidance_scale=8.5,
            latents=jnp.asarray(latent), text_format_dict=fmt,
            use_guidance=True, inject_selfattn=0.2, inject_background=0.3,
            seed=2, guidance_downsample=gds,
        )

    img_seq_ds = seq(2)
    assert np.isfinite(img_seq_ds.astype(np.float64)).all()
    # d=3 doesn't divide the 8x8 latent -> exact-path fallback == d=1
    np.testing.assert_array_equal(seq(3), seq(1))
    # composes with the bf16 guidance decode
    img_both = batch(guidance_downsample=2, bf16_guidance=True)
    assert np.isfinite(img_both.astype(np.float64)).all()
