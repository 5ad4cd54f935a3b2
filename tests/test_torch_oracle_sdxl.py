"""Pipeline-level torch differential oracle for the SDXL rich loop.

Companion to tests/test_torch_oracle.py (which pins the SD-1.5 loop): a
literal torch NCHW port of the reference's XL rich denoising loop
(models/region_diffusion_sdxl.py:770-880) with the UNet as a black box,
asserted against the jitted JAX scan (pipelines/region_sdxl.py:_rich_fn).

What this pins that the SD oracle cannot (XL-only quirks):
  * Euler ``scale_model_input`` inside the rich loop (:784) and the
    deterministic Euler step on the stacked [current, refer] batch;
  * the refer-trajectory step gate ``inject_selfattn > 0 or
    i < inject_background*len(timesteps)`` (:832) — with
    ``inject_selfattn == 0`` the refer latents HOLD once i passes the
    window, while the current latents keep stepping;
  * the separate composite gate ``i == int(inject_background*len)``
    (:870) — parametrized so the injection step falls both *inside* the
    refer window (fractional bg·S: refer was stepped this very step) and
    *just outside* it (integer bg·S: refer held from the previous step);
  * micro-conditioning ({text_embeds, time_ids}) threaded through every
    UNet forward (unet_2d_condition.py:841-857);
  * fontsize reweighting applied to the base text row ONLY — not the
    refer text row (:790-795 hooks register/remove around the one call);
  * predict_x0 with alphas_cumprod[int(t)] on post-Euler-step latents
    (:955-957) feeding the jax.grad-through-VAE color guidance.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sd import (
    RichControlSpec, _plan_arrays,
)
from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL
from rich_text_to_image_tpu.schedulers.common import make_alphas_cumprod

from test_torch_oracle import torch_vae_decode

R = 2        # span regions
STEPS = 8
GW = 5.0
COLOR_W = 0.5
GSS = 800    # guidance_start_step: t < 800 guided (clean int/float boundary)
WORD_POS = [2, 3]
FONT_SIZE = [1.5, -0.6]  # negative exercises the sign (repulsion) path


# ---------------------------------------------------------------------------
# oracle Euler (diffusers 0.18.2 EulerDiscreteScheduler, s_churn=0)
# ---------------------------------------------------------------------------

class OracleEuler:
    def __init__(self, num_inference_steps, num_train=1000):
        self.alphas_cumprod = make_alphas_cumprod(
            num_train, 0.00085, 0.012, "scaled_linear"
        )
        ts = np.linspace(0, num_train - 1, num_inference_steps,
                         dtype=np.float64)[::-1].copy()
        sig = ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        self.sigmas = np.concatenate(
            [np.interp(ts, np.arange(num_train), sig), [0.0]]
        )
        self.timesteps = ts
        self.init_noise_sigma = float((self.sigmas.max() ** 2 + 1) ** 0.5)

    def scale_model_input(self, sample, i):
        return sample / float(np.sqrt(self.sigmas[i] ** 2 + 1.0))

    def step(self, mo, i, sample):
        s, s_next = float(self.sigmas[i]), float(self.sigmas[i + 1])
        denoised = sample - s * mo
        return sample + (sample - denoised) / s * (s_next - s)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pipe():
    return RegionDiffusionXL.random_init(
        seed=0, unet_cfg=cfg.TINY_XL_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        text2_cfg=cfg.CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            hidden_act="gelu", projection_dim=32,
        ),
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def inputs(pipe):
    h = w = pipe.unet_cfg.sample_size
    px = h * pipe.vae_scale_factor
    rng = np.random.default_rng(11)
    raw = rng.random((R + 1, h, w)).astype(np.float32)
    masks = raw / raw.sum(0, keepdims=True)
    cm_px = (rng.random((1, px, px)) > 0.5).astype(np.float32)
    target_rgb = np.array([[0.2, 0.7, 0.1]], np.float32)
    color_all = rng.random((h, w)).astype(np.float32)
    embeds, pooled = pipe.encode_prompt(
        ["green span one", "span two", "a base prompt"], ""
    )  # rows: [uncond, span1, span2, base]
    time_ids = jnp.asarray(
        pipe._get_add_time_ids((px, px), (0, 0), (px, px))
    )
    sched = OracleEuler(STEPS)
    latents0 = (rng.standard_normal((1, h, w, 4)).astype(np.float32)
                * sched.init_noise_sigma)
    return dict(masks=masks, cm_px=cm_px, target_rgb=target_rgb,
                color_all=color_all, embeds=np.asarray(embeds, np.float32),
                pooled=np.asarray(pooled, np.float32), time_ids=time_ids,
                latents0=latents0, h=h, px=px)


def _unet_eps_fn(pipe, inputs):
    """Black-box XL UNet closure: micro-conditioning per row; fontsize
    weights applied to the base CURRENT row only (reference :790-795)."""
    import functools

    import jax

    from rich_text_to_image_tpu.models.unet import UNetControls
    from rich_text_to_image_tpu.ops.attention import (
        make_token_weight_vectors,
    )

    tw, ts_ = make_token_weight_vectors(WORD_POS, FONT_SIZE)
    embeds = inputs["embeds"]
    pooled = inputs["pooled"]
    time_ids = inputs["time_ids"]

    @functools.partial(jax.jit, static_argnames=("use_tw",))
    def run(params, x, t, rows, pool_rows, use_tw):
        controls = (UNetControls(token_weights=tw, token_signs=ts_)
                    if use_tw else None)
        eps, _ = pipe.unet.apply(
            params, x, t, rows,
            added_cond={"text_embeds": pool_rows,
                        "time_ids": jnp.tile(time_ids, (x.shape[0], 1))},
            controls=controls,
        )
        return eps.astype(jnp.float32)

    def unet_eps(x_nchw, t, row, fontsize=False):
        x = jnp.asarray(x_nchw.detach().numpy().transpose(0, 2, 3, 1))
        e = run(pipe.unet_params, x, jnp.float32(float(t)),
                jnp.asarray(embeds[row:row + 1]),
                jnp.asarray(pooled[row:row + 1]), fontsize)
        return torch.from_numpy(np.asarray(e).transpose(0, 3, 1, 2))

    return unet_eps


# ---------------------------------------------------------------------------
# the torch oracle loop (reference region_diffusion_sdxl.py:770-880)
# ---------------------------------------------------------------------------

def _torch_xl_rich_loop(pipe, inputs, inject_background):
    unet_eps = _unet_eps_fn(pipe, inputs)
    masks = torch.from_numpy(inputs["masks"][:, None])  # [R+1,1,h,w]
    sched = OracleEuler(STEPS)
    S = len(sched.timesteps)
    sf = pipe.vae_cfg.scaling_factor
    color_all = torch.from_numpy(inputs["color_all"])[None, None]
    base_row = R + 1

    lat = torch.from_numpy(inputs["latents0"].transpose(0, 3, 1, 2))
    lat_ref = lat.clone()
    for i, t in enumerate(sched.timesteps):
        background_inject_step = i < inject_background * S  # (:782)
        x_in = sched.scale_model_input(lat, i)
        uncond = unet_eps(x_in, t, 0)
        text = unet_eps(x_in, t, base_row, fontsize=True)
        # refer rows: NO fontsize hooks (:797-808)
        x_ref_in = sched.scale_model_input(lat_ref, i)
        uncond_ref = unet_eps(x_ref_in, t, 0)
        text_ref = unet_eps(x_ref_in, t, base_row)
        noise_uncond = uncond * masks[-1]
        noise_text = text * masks[-1]
        for r in range(R):
            eps_r = unet_eps(x_in, t, 1 + r)
            noise_uncond = noise_uncond + uncond * masks[r]
            noise_text = noise_text + eps_r * masks[r]
        noise = noise_uncond + GW * (noise_text - noise_uncond)
        # the :832 gate: inject_selfattn == 0 here, so the refer latents
        # advance only while i is inside the background window
        if background_inject_step:
            noise_ref = uncond_ref + GW * (text_ref - uncond_ref)
            stacked = sched.step(
                torch.cat([noise, noise_ref]), i, torch.cat([lat, lat_ref])
            )
            lat, lat_ref = stacked[0:1], stacked[1:2]
        else:
            lat = sched.step(noise, i, lat)
        # color guidance: t-gated (:853), x0 via alphas_cumprod[int(t)]
        if t < GSS:
            a = float(sched.alphas_cumprod[int(t)])
            lat = lat.detach().requires_grad_(True)
            x0 = (lat - noise * np.sqrt(1 - a)) / np.sqrt(a)
            imgs = torch_vae_decode(x0 / sf, pipe.vae_params, pipe.vae_cfg)
            imgs = (imgs / 2 + 0.5).clamp(0, 1)
            tm = torch.from_numpy(inputs["cm_px"])
            num = torch.einsum("bchw,nhw->nc", imgs, tm)
            den = tm.sum(dim=(1, 2))[:, None] + 1e-12
            loss = (((num / den - torch.from_numpy(inputs["target_rgb"]))
                     ** 2).mean(1) * 100.0).sum()
            loss.backward()
            lat = (lat - lat.grad * COLOR_W * color_all).detach()
        # the :870 composite gate — a separate int() of the same product
        if i == int(inject_background * S) and inject_background > 0:
            lat = lat_ref * masks[-1] + lat * (1 - masks[-1])
    return lat.numpy().transpose(0, 2, 3, 1)


# fractional bg·S (2.4): injection step i=2 is INSIDE the refer window —
# refer stepped that same step.  integer bg·S (2.0): injection step i=2 is
# OUTSIDE — refer held from step 1 (the quirk pair the gates must get right)
@pytest.mark.slow
@pytest.mark.parametrize("inject_background", [0.3, 0.25])
def test_xl_rich_loop_matches_torch_oracle(pipe, inputs, inject_background):
    pipe.masks = [m for m in inputs["masks"]]
    plan = pipe.scheduler.plan(STEPS)
    assert np.allclose(plan.timesteps, OracleEuler(STEPS).timesteps,
                       atol=1e-3)
    spec = RichControlSpec(
        guidance_scale=GW,
        inject_selfattn=0.0,
        inject_background=inject_background,
        use_guidance=True,
        guidance_start_step=GSS,
        color_guidance_weight=COLOR_W,
    )
    tfd = {
        "color_obj_atten": [m for m in inputs["cm_px"]],
        "target_RGB": [c for c in inputs["target_rgb"]],
        "color_obj_atten_all": inputs["color_all"],
        "word_pos": WORD_POS,
        "font_size": FONT_SIZE,
    }
    h, px = inputs["h"], inputs["px"]
    jax_lat = np.asarray(pipe._sample_rich(
        jnp.asarray(inputs["embeds"]), jnp.asarray(inputs["pooled"]),
        inputs["time_ids"], (h, h), plan, spec, tfd,
        jnp.asarray(inputs["latents0"]), (px, px), return_latents=True,
    ))
    torch_lat = _torch_xl_rich_loop(pipe, inputs, inject_background)
    scale = np.abs(torch_lat).mean()
    np.testing.assert_allclose(
        jax_lat / scale, torch_lat / scale, rtol=2e-3, atol=2e-3
    )
