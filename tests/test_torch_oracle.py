"""Pipeline-level torch differential oracle for the rich denoising loop.

The strongest parity evidence obtainable with zero egress (VERDICT item 4):
re-implement the reference's rich-pass step algebra — region compositing →
CFG → PNDM step → gradient color guidance through VAE decode → background
injection (reference models/region_diffusion.py:86-178) — in torch NCHW,
using the *same UNet as a black box* (host roundtrip into the flax UNet) and
a torch mirror of the flax VAE decoder with identical weights, and assert the
jitted JAX scan (pipelines/region_sd.py:_rich_fn) produces the same final
latents to fp32 tolerance.

What this pins that per-op oracles cannot: the scan-carry PNDM ring buffer vs
the reference's stateful ets list, mask compositing (incl. the shared-uncond
identity), the post-step x0-prediction quirk (current-step alpha on post-step
latents), jax.grad-through-VAE vs torch autograd, gate ordering, and the
batch-2 trajectory stacking for background injection.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sd import (
    RegionDiffusion, RichControlSpec,
)
from rich_text_to_image_tpu.schedulers.common import make_alphas_cumprod

torch.set_grad_enabled(True)


# ---------------------------------------------------------------------------
# torch mirror of the flax VAE decoder (models/vae.py Decoder, NCHW)
# ---------------------------------------------------------------------------

def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _t_conv(x, p, stride=1, pad=1):
    w = _t(p["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    return F.conv2d(x, w, _t(p["bias"]), stride=stride, padding=pad)


def _t_gn(x, p, groups, eps=1e-6):
    return F.group_norm(x, groups, _t(p["scale"]), _t(p["bias"]), eps)


def _t_dense(x, p):
    return F.linear(x, _t(p["kernel"]).T, _t(p["bias"]))


def _t_resnet(x, p, groups):
    h = F.silu(_t_gn(x, p["norm1"], groups))
    h = _t_conv(h, p["conv1"])
    h = F.silu(_t_gn(h, p["norm2"], groups))
    h = _t_conv(h, p["conv2"])
    if "conv_shortcut" in p:
        x = _t_conv(x, p["conv_shortcut"], pad=0)
    return x + h


def _t_vae_attn(x, p, groups):
    B, C, H, W = x.shape
    h = _t_gn(x, p["group_norm"], groups)
    h = h.reshape(B, C, H * W).permute(0, 2, 1)  # [B, HW, C]
    q = _t_dense(h, p["to_q"])
    k = _t_dense(h, p["to_k"])
    v = _t_dense(h, p["to_v"])
    s = torch.einsum("bqc,bkc->bqk", q, k) * (C ** -0.5)
    o = torch.softmax(s, dim=-1) @ v
    o = _t_dense(o, p["to_out"])
    return x + o.permute(0, 2, 1).reshape(B, C, H, W)


def torch_vae_decode(z, vae_params, vae_cfg):
    """Mirror of AutoencoderKL.decode: post_quant_conv -> Decoder (NCHW)."""
    p = vae_params["params"]
    d = p["decoder"]
    g = vae_cfg.norm_num_groups
    x = _t_conv(z, p["post_quant_conv"], pad=0)
    x = _t_conv(x, d["conv_in"])
    x = _t_resnet(x, d["mid_res_0"], g)
    x = _t_vae_attn(x, d["mid_attn"], g)
    x = _t_resnet(x, d["mid_res_1"], g)
    rev = list(reversed(vae_cfg.block_out_channels))
    for lvl in range(len(rev)):
        for j in range(vae_cfg.layers_per_block + 1):
            x = _t_resnet(x, d[f"up_{lvl}_res_{j}"], g)
        if lvl != len(rev) - 1:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _t_conv(x, d[f"up_{lvl}_upsample"])
    x = F.silu(_t_gn(x, d["conv_norm_out"], g))
    return _t_conv(x, d["conv_out"])


# ---------------------------------------------------------------------------
# reference-style stateful PNDM (PLMS), written from the documented update
# equations (schedulers/pndm.py docstring; diffusers 0.18.2 semantics)
# ---------------------------------------------------------------------------

class OraclePNDM:
    def __init__(self, num_inference_steps, num_train=1000):
        self.alphas_cumprod = make_alphas_cumprod(
            num_train, 0.00085, 0.012, "scaled_linear"
        )
        self.final_alpha_cumprod = float(self.alphas_cumprod[0])
        ratio = num_train // num_inference_steps
        base = (np.arange(num_inference_steps) * ratio).round().astype(
            np.int64) + 1
        self.timesteps = np.concatenate(
            [base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        self.ratio = ratio
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, mo, t, sample):
        t = int(t)
        t_prev = t - self.ratio
        if self.counter == 1:
            t_prev = t
            t = t + self.ratio
        else:
            self.ets.append(mo)
        if len(self.ets) == 1 and self.counter == 0:
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            mo = (mo + self.ets[-1]) / 2
            sample = self.cur_sample
        elif len(self.ets) == 2:
            mo = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            mo = (23 * self.ets[-1] - 16 * self.ets[-2]
                  + 5 * self.ets[-3]) / 12
        else:
            mo = (55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3]
                  - 9 * self.ets[-4]) / 24
        self.counter += 1
        return self._prev(sample, t, t_prev, mo)

    def _prev(self, sample, t, t_prev, mo):
        a_t = float(self.alphas_cumprod[t])
        a_prev = (float(self.alphas_cumprod[t_prev]) if t_prev >= 0
                  else self.final_alpha_cumprod)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * b_prev ** 0.5 + (a_t * b_t * a_prev) ** 0.5
        return coeff * sample - (a_prev - a_t) * mo / denom


# ---------------------------------------------------------------------------
# fixtures / shared inputs
# ---------------------------------------------------------------------------

R = 2           # span regions
STEPS = 8       # PNDM executes STEPS+1 PLMS steps (42-step quirk)
GW = 7.5        # CFG
COLOR_W = 0.5


@pytest.fixture(scope="module")
def model():
    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def inputs(model):
    h = w = model.unet_cfg.sample_size
    px = h * model.vae_scale_factor
    rng = np.random.default_rng(7)
    # masks: R spans + background, sum to 1 per pixel (reference normalizes)
    raw = rng.random((R + 1, h, w)).astype(np.float32)
    masks = raw / raw.sum(0, keepdims=True)
    # color-guidance inputs: 1 color span
    cm_lat = (rng.random((1, h, w)) > 0.5).astype(np.float32)
    cm_px = np.repeat(
        np.repeat(cm_lat, model.vae_scale_factor, 1), model.vae_scale_factor, 2
    )
    target_rgb = np.array([[0.8, 0.1, 0.2]], np.float32)
    color_all = cm_lat.sum(0)  # [h, w]
    embeds = np.asarray(model.get_text_embeds(
        ["red span one", "span two", "a base prompt"], [""]
    ), np.float32)  # [uncond, span1, span2, base]
    latents0 = rng.standard_normal((1, h, w, 4)).astype(np.float32)
    return dict(masks=masks, cm_px=cm_px, target_rgb=target_rgb,
                color_all=color_all, embeds=embeds, latents0=latents0,
                h=h, w=w, px=px)


def _unet_eps_fn(model, embeds):
    """Black-box UNet closure shared by the torch oracle (host roundtrip)."""
    @jax.jit
    def run(params, x, t, rows):
        eps, _ = model.unet.apply(params, x, t, rows)
        return eps.astype(jnp.float32)

    def unet_eps(x_nchw, t, row):
        x = jnp.asarray(x_nchw.detach().numpy().transpose(0, 2, 3, 1))
        e = run(model.unet_params, x, jnp.int32(int(t)),
                jnp.asarray(embeds[row:row + 1]))
        return torch.from_numpy(np.asarray(e).transpose(0, 3, 1, 2))

    return unet_eps


# ---------------------------------------------------------------------------
# component parity: decoder forward + gradient
# ---------------------------------------------------------------------------

def test_vae_decoder_torch_mirror_forward(model, inputs):
    z = np.random.default_rng(3).standard_normal(
        (1, inputs["h"], inputs["w"], 4)).astype(np.float32)
    jx = np.asarray(model.vae.apply(
        model.vae_params, jnp.asarray(z), method=model.vae.decode))
    tz = torch.from_numpy(z.transpose(0, 3, 1, 2))
    tx = torch_vae_decode(tz, model.vae_params, model.vae_cfg)
    np.testing.assert_allclose(
        jx, tx.detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_vae_decoder_gradient_parity(model, inputs):
    """jax.grad of the color loss through the decoder == torch autograd."""
    z0 = np.random.default_rng(4).standard_normal(
        (1, inputs["h"], inputs["w"], 4)).astype(np.float32)
    m_px = inputs["cm_px"]
    tgt = inputs["target_rgb"]
    sf = model.vae_cfg.scaling_factor

    def jax_loss(z):
        imgs = model.vae.apply(model.vae_params, z.astype(jnp.float32) / sf,
                               method=model.vae.decode)
        imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
        num = jnp.einsum("bhwc,nhw->nc", imgs, jnp.asarray(m_px))
        den = jnp.asarray(m_px).sum(axis=(1, 2))[:, None] + 1e-12
        per = jnp.mean((num / den - jnp.asarray(tgt)) ** 2, axis=1) * 100.0
        return per.sum()

    jg = np.asarray(jax.grad(jax_loss)(jnp.asarray(z0)))

    tz = torch.from_numpy(z0.transpose(0, 3, 1, 2)).requires_grad_(True)
    imgs = torch_vae_decode(tz / sf, model.vae_params, model.vae_cfg)
    imgs = (imgs / 2 + 0.5).clamp(0, 1)
    tm = torch.from_numpy(m_px)
    num = torch.einsum("bchw,nhw->nc", imgs, tm)
    den = tm.sum(dim=(1, 2))[:, None] + 1e-12
    loss = (((num / den - torch.from_numpy(tgt)) ** 2).mean(1) * 100.0).sum()
    loss.backward()
    tg = tz.grad.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(jg, tg, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# the full rich loop, torch oracle vs the jitted scan
# ---------------------------------------------------------------------------

def _torch_rich_loop(model, inputs, inject_background):
    """Literal port of region_diffusion.py:86-178 in torch NCHW, with the
    UNet as a black box and all knobs matching the jax run below."""
    unet_eps = _unet_eps_fn(model, inputs["embeds"])
    masks = torch.from_numpy(
        inputs["masks"][:, None])  # [R+1, 1, h, w]
    sched = OraclePNDM(STEPS)
    S = len(sched.timesteps)
    run_reference = inject_background > 0
    bg_step = int(inject_background * S)
    sf = model.vae_cfg.scaling_factor
    color_all = torch.from_numpy(inputs["color_all"])[None, None]  # [1,1,h,w]

    lat = torch.from_numpy(inputs["latents0"].transpose(0, 3, 1, 2))
    lat_ref = lat.clone()
    base_row = R + 1
    for i, t in enumerate(sched.timesteps):
        uncond = unet_eps(lat, t, 0)
        text = unet_eps(lat, t, base_row)
        if run_reference:
            uncond_ref = unet_eps(lat_ref, t, 0)
            text_ref = unet_eps(lat_ref, t, base_row)
        # composite init (region_diffusion.py:119-120), then per-region
        # accumulation (:122-128) with the shared uncond forward
        noise_uncond = uncond * masks[-1]
        noise_text = text * masks[-1]
        for r in range(R):
            eps_r = unet_eps(lat, t, 1 + r)
            noise_uncond = noise_uncond + uncond * masks[r]
            noise_text = noise_text + eps_r * masks[r]
        noise = noise_uncond + GW * (noise_text - noise_uncond)
        if run_reference:
            noise_ref = uncond_ref + GW * (text_ref - uncond_ref)
            stacked = sched.step(
                torch.cat([noise, noise_ref]), t, torch.cat([lat, lat_ref])
            )
            lat, lat_ref = stacked[0:1], stacked[1:2]
        else:
            lat = sched.step(noise, t, lat)
        # color guidance AFTER the scheduler step, x0 from post-step latents
        # with the current step's alpha (region_diffusion.py:151-168,176-178)
        a = float(sched.alphas_cumprod[int(t)])
        lat = lat.detach().requires_grad_(True)
        x0 = (lat - noise * np.sqrt(1 - a)) / np.sqrt(a)
        imgs = torch_vae_decode(x0 / sf, model.vae_params, model.vae_cfg)
        imgs = (imgs / 2 + 0.5).clamp(0, 1)
        tm = torch.from_numpy(inputs["cm_px"])
        num = torch.einsum("bchw,nhw->nc", imgs, tm)
        den = tm.sum(dim=(1, 2))[:, None] + 1e-12
        loss = (((num / den - torch.from_numpy(inputs["target_rgb"])) ** 2
                 ).mean(1) * 100.0).sum()
        loss.backward()
        lat = (lat - lat.grad * COLOR_W * color_all).detach()
        # background injection at the single step (:171-173)
        if run_reference and i == bg_step:
            lat = lat_ref * masks[-1] + lat * (1 - masks[-1])
    return lat.numpy().transpose(0, 2, 3, 1)


@pytest.mark.slow
@pytest.mark.parametrize("inject_background", [0.0, 0.3])
def test_rich_loop_matches_torch_oracle(model, inputs, inject_background):
    model.masks = [m for m in inputs["masks"]]
    spec = RichControlSpec(
        guidance_scale=GW,
        inject_selfattn=0.0,
        inject_background=inject_background,
        use_guidance=True,
        guidance_start_step=999,
        color_guidance_weight=COLOR_W,
    )
    tfd = {
        "color_obj_atten": [m for m in inputs["cm_px"]],
        "target_RGB": [c for c in inputs["target_rgb"]],
        "color_obj_atten_all": inputs["color_all"],
    }
    h, px = inputs["h"], inputs["px"]
    jax_lat = np.asarray(model.produce_latents(
        jnp.asarray(inputs["embeds"]),
        height=px, width=px, num_inference_steps=STEPS,
        latents=jnp.asarray(inputs["latents0"]),
        spec=spec, text_format_dict=tfd,
    ))
    torch_lat = _torch_rich_loop(model, inputs, inject_background)
    scale = np.abs(torch_lat).mean()
    np.testing.assert_allclose(
        jax_lat / scale, torch_lat / scale, rtol=2e-3, atol=2e-3
    )
