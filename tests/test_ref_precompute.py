"""Refer-trajectory precompute parity (tiny XL, CPU).

The plain pass IS the refer trajectory the reference re-denoises inside its
rich loop (same base prompt, negative prompt, initial latent, scheduler and
CFG — region_diffusion_sdxl.py:805-832). `_plain_fn(ref_slots=...)` captures
the trajectory + the injection-step (Q,K)/resnet features, and
`_rich_fn_refpre` consumes them, dropping both refer rows from every rich
launch. These tests pin that the precomputed path is output-equivalent to
the in-batch merged path (which is itself torch-oracle-pinned in
tests/test_torch_oracle_sdxl.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'

STEPS = 12


@pytest.fixture(scope="module")
def pipe():
    # fp32 so the two paths' only difference is float association at the
    # 1e-7 level (bf16 runs drift visibly over 12 steps purely from batch
    # layout; that is dtype noise, not path divergence)
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
        dtype=jnp.float32,
    )


def _px(pipe):
    return pipe.unet_cfg.sample_size * pipe.vae_scale_factor


def _fmt(pipe, use_tw=True):
    px = _px(pipe)
    lat = pipe.unet_cfg.sample_size
    fmt = {
        "target_RGB": [np.asarray([1.0, 0.0, 0.0])],
        "guidance_start_step": 999,
        "color_guidance_weight": 0.5,
        "color_obj_atten": [np.full((1, px, px), 0.5, np.float32)],
        "color_obj_atten_all": np.full((1, lat, lat), 0.5, np.float32),
    }
    if use_tw:
        fmt["word_pos"] = np.asarray([3, 4])
        fmt["font_size"] = np.asarray([4.0, -2.0])
    return fmt


def _inject_steps(pipe, steps, inject_selfattn):
    plan = pipe.scheduler.plan(steps)
    gates = plan.timesteps.astype(np.float64) > (1 - inject_selfattn) * 1000
    return tuple(np.nonzero(gates)[0].tolist())


def _run_both(pipe, inject_selfattn, inject_background, use_guidance=True,
              use_tw=True, encoder_reuse=1):
    px = _px(pipe)
    lat = pipe.unet_cfg.sample_size
    pipe.masks = [
        np.full((1, lat, lat), 0.6, np.float32),
        np.full((1, lat, lat), 0.4, np.float32),
    ]
    fmt = _fmt(pipe, use_tw)
    prompts = ["red rose", "a garden with a red rose"]
    kw = dict(
        height=px, width=px, num_inference_steps=STEPS, guidance_scale=5.0,
        run_rich_text=True, use_guidance=use_guidance,
        inject_selfattn=inject_selfattn, inject_background=inject_background,
        text_format_dict=fmt, seed=2, encoder_reuse=encoder_reuse,
    )

    # in-batch merged path (torch-oracle-pinned)
    img_ref = pipe.sample(prompts, "", **kw)

    # plain pass with refer capture at this run's injection steps, then the
    # precomputed rich path.  Same seed → same initial latent (the caller
    # contract run_sample guarantees).
    steps = _inject_steps(pipe, STEPS, inject_selfattn)
    pipe.sample([prompts[-1]], "", height=px, width=px,
                num_inference_steps=STEPS, guidance_scale=5.0,
                run_rich_text=False, seed=2, ref_capture_steps=steps)
    assert pipe.ref_cache is not None
    assert pipe.ref_cache["traj"].shape[0] == STEPS + 1
    img_pre = pipe.sample(prompts, "", ref_cache=pipe.ref_cache, **kw)
    return img_ref, img_pre


def _assert_images_match(img_ref, img_pre, tol=1):
    # uint8 images; in fp32 the two paths differ only in float association
    # (B=R+4 merged rows vs B=2 + B=R+2 launches) → ≤1 quantization step
    d = np.abs(img_ref.astype(np.int32) - img_pre.astype(np.int32))
    assert d.max() <= tol, f"max|Δ| {d.max()} uint8 steps ({(d > tol).mean():.4f} px over)"


def test_refpre_matches_inbatch_injection(pipe):
    img_ref, img_pre = _run_both(pipe, inject_selfattn=0.4,
                                 inject_background=0.3)
    _assert_images_match(img_ref, img_pre)


def test_refpre_bg_only(pipe):
    """inject_selfattn=0: no (Q,K) slots; only the trajectory is consumed
    (background injection)."""
    img_ref, img_pre = _run_both(pipe, inject_selfattn=0.0,
                                 inject_background=0.4, use_tw=False)
    _assert_images_match(img_ref, img_pre)


def test_refpre_composes_with_encoder_reuse(pipe):
    """The fixed-shape launch lets encoder reuse compose with injection
    (the in-batch path's ref_skip excluded it). Stride 1 ≡ exact; here we
    only require the program to run and stay finite at stride 2."""
    img_ref, img_pre = _run_both(pipe, inject_selfattn=0.4,
                                 inject_background=0.3, encoder_reuse=2)
    assert np.isfinite(img_pre.astype(np.float64)).all()
    assert img_pre.shape == img_ref.shape


def test_refpre_cache_step_mismatch_falls_back(pipe):
    """A cache captured for different injection steps is rejected — the
    merged in-batch path runs instead (same output)."""
    px = _px(pipe)
    lat = pipe.unet_cfg.sample_size
    pipe.masks = [
        np.full((1, lat, lat), 0.6, np.float32),
        np.full((1, lat, lat), 0.4, np.float32),
    ]
    fmt = _fmt(pipe, use_tw=False)
    prompts = ["red rose", "a garden with a red rose"]
    kw = dict(
        height=px, width=px, num_inference_steps=STEPS, guidance_scale=5.0,
        run_rich_text=True, use_guidance=False,
        inject_selfattn=0.4, inject_background=0.0,
        text_format_dict=fmt, seed=2,
    )
    img_ref = pipe.sample(prompts, "", **kw)
    # capture for a DIFFERENT injection window
    wrong = _inject_steps(pipe, STEPS, 0.8)
    pipe.sample([prompts[-1]], "", height=px, width=px,
                num_inference_steps=STEPS, guidance_scale=5.0,
                run_rich_text=False, seed=2, ref_capture_steps=wrong)
    img = pipe.sample(prompts, "", ref_cache=pipe.ref_cache, **kw)
    np.testing.assert_array_equal(img, img_ref)


def test_refpre_cache_guidance_mismatch_falls_back(pipe):
    """A cache captured under a DIFFERENT guidance scale is rejected by the
    validity guard (the trajectory depends on CFG weight) — the merged
    in-batch path runs instead (same output). ADVICE r4 (medium): the old
    guard checked only step indices, so direct API callers could silently
    inject a wrong trajectory."""
    px = _px(pipe)
    lat = pipe.unet_cfg.sample_size
    pipe.masks = [
        np.full((1, lat, lat), 0.6, np.float32),
        np.full((1, lat, lat), 0.4, np.float32),
    ]
    fmt = _fmt(pipe, use_tw=False)
    prompts = ["red rose", "a garden with a red rose"]
    kw = dict(
        height=px, width=px, num_inference_steps=STEPS, guidance_scale=4.0,
        run_rich_text=True, use_guidance=False,
        inject_selfattn=0.4, inject_background=0.0,
        text_format_dict=fmt, seed=2,
    )
    img_ref = pipe.sample(prompts, "", **kw)
    # capture at the SAME injection window but a DIFFERENT guidance scale
    steps = _inject_steps(pipe, STEPS, 0.4)
    pipe.sample([prompts[-1]], "", height=px, width=px,
                num_inference_steps=STEPS, guidance_scale=5.0,
                run_rich_text=False, seed=2, ref_capture_steps=steps)
    assert pipe.ref_cache is not None and pipe.ref_cache["g"] == 5.0
    img = pipe.sample(prompts, "", ref_cache=pipe.ref_cache, **kw)
    np.testing.assert_array_equal(img, img_ref)


def test_refpre_cache_seed_mismatch_falls_back(pipe):
    """A cache captured from a DIFFERENT initial latent (seed) is rejected
    by the content fingerprint — the in-batch path runs instead."""
    px = _px(pipe)
    lat = pipe.unet_cfg.sample_size
    pipe.masks = [
        np.full((1, lat, lat), 0.6, np.float32),
        np.full((1, lat, lat), 0.4, np.float32),
    ]
    fmt = _fmt(pipe, use_tw=False)
    prompts = ["red rose", "a garden with a red rose"]
    kw = dict(
        height=px, width=px, num_inference_steps=STEPS, guidance_scale=5.0,
        run_rich_text=True, use_guidance=False,
        inject_selfattn=0.4, inject_background=0.0,
        text_format_dict=fmt, seed=2,
    )
    img_ref = pipe.sample(prompts, "", **kw)
    steps = _inject_steps(pipe, STEPS, 0.4)
    pipe.sample([prompts[-1]], "", height=px, width=px,
                num_inference_steps=STEPS, guidance_scale=5.0,
                run_rich_text=False, seed=7, ref_capture_steps=steps)
    assert pipe.ref_cache is not None
    img = pipe.sample(prompts, "", ref_cache=pipe.ref_cache, **kw)
    np.testing.assert_array_equal(img, img_ref)


def test_sd_ref_capture_hbm_guard(sd_pipe):
    """SD skips the refer capture when the (Q,K) slots would blow the HBM
    budget (same guard as SDXL) — the rich pass then falls back to the
    in-batch flow instead of OOMing. ADVICE r4 (low)."""
    pipe = sd_pipe
    h = pipe.unet_cfg.sample_size
    px = h * pipe.vae_scale_factor
    assert pipe._ref_qk_bytes_per_slot((h, h)) > 0
    old = pipe.ref_precompute_max_bytes
    pipe.ref_precompute_max_bytes = 1
    try:
        pipe.produce_attn_maps(["a cat"], [""], height=px, width=px,
                               num_inference_steps=STEPS,
                               ref_capture_steps=(0, 1))
        assert pipe.ref_cache is None
    finally:
        pipe.ref_precompute_max_bytes = old


@pytest.fixture(scope="module")
def sd_pipe():
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, dtype=jnp.float32, agg_start_step=3,
    )


def test_refpre_matches_inbatch_sd(sd_pipe):
    """SD variant: the refpre scan must match the in-batch merged flow
    (which is torch-oracle-pinned) — incl. the stateful PNDM scheduler,
    font-size reweighting, guidance and background injection."""
    from rich_text_to_image_tpu.pipelines.region_sd import RichControlSpec

    pipe = sd_pipe
    h = pipe.unet_cfg.sample_size
    px = h * pipe.vae_scale_factor
    pipe.masks = [
        np.full((1, h, h), 0.6, np.float32),
        np.full((1, h, h), 0.4, np.float32),
    ]
    fmt = {
        "word_pos": np.asarray([2]),
        "font_size": np.asarray([3.0]),
        "target_RGB": [np.asarray([0.9, 0.1, 0.1])],
        "guidance_start_step": 999,
        "color_guidance_weight": 0.5,
        "color_obj_atten": [np.full((1, px, px), 0.5, np.float32)],
        "color_obj_atten_all": np.full((1, h, h), 0.5, np.float32),
    }
    prompts = ["red rose", "a garden with a red rose"]
    embeds = pipe.get_text_embeds(prompts, [""])
    import jax

    latents0 = jax.random.normal(jax.random.PRNGKey(4), (1, h, h, 4))
    spec = RichControlSpec(
        guidance_scale=7.5, inject_selfattn=0.4, inject_background=0.3,
        use_guidance=True, guidance_start_step=999,
        color_guidance_weight=0.5,
    )
    lat_ref = np.asarray(pipe.produce_latents(
        embeds, height=px, width=px, num_inference_steps=STEPS,
        latents=latents0, spec=spec, text_format_dict=fmt,
    ))
    # plain pass with refer capture at this run's injection steps; the
    # plain base prompt must be the rich base prompt and the latent shared
    plan = pipe.scheduler.plan(STEPS)
    gates = np.asarray(plan.timesteps, np.float64) > 0.6 * 1000
    steps = tuple(np.nonzero(gates)[0].tolist())
    pipe.produce_attn_maps([prompts[-1]], [""], height=px, width=px,
                           num_inference_steps=STEPS, guidance_scale=7.5,
                           latents=latents0, ref_capture_steps=steps)
    assert pipe.ref_cache is not None
    lat_pre = np.asarray(pipe.produce_latents(
        embeds, height=px, width=px, num_inference_steps=STEPS,
        latents=latents0, spec=spec, text_format_dict=fmt,
        ref_cache=pipe.ref_cache,
    ))
    assert any(k[0] == "richpre" for k in pipe._jit_cache)
    scale = np.abs(lat_ref).mean()
    np.testing.assert_allclose(lat_pre / scale, lat_ref / scale,
                               rtol=2e-3, atol=2e-3)


def test_plain_capture_does_not_change_aggregates(pipe):
    """ref capture rides the plain pass without touching its outputs."""
    px = _px(pipe)
    img_a = pipe.sample(["a cat"], "", height=px, width=px,
                        num_inference_steps=STEPS, guidance_scale=5.0,
                        run_rich_text=False, seed=1)
    agg_a = pipe.attn_aggregates
    steps = _inject_steps(pipe, STEPS, 0.4)
    img_b = pipe.sample(["a cat"], "", height=px, width=px,
                        num_inference_steps=STEPS, guidance_scale=5.0,
                        run_rich_text=False, seed=1,
                        ref_capture_steps=steps)
    agg_b = pipe.attn_aggregates
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_allclose(np.asarray(agg_a.self_sum),
                               np.asarray(agg_b.self_sum), rtol=1e-6)
    # the cache holds every attn1 layer's (Q, K) at each slot (+1 trash
    # slot absorbing the non-ref steps' unconditional writes)
    assert pipe.ref_cache is not None
    assert len(pipe.ref_cache["qk"]) > 0
    for bq, bk in pipe.ref_cache["qk"].values():
        assert bq.shape[0] == len(steps) + 1
        # real slots are populated
        assert np.abs(np.asarray(bq[:len(steps)], np.float32)).sum() > 0
