"""Exact-vs-encoder-reuse trajectory divergence at REAL shapes (on-chip).

VERDICT r4 weak #2: the encoder-reuse (er2) turbo promotion rested on the
toy trained fixture alone; nothing measured its numerics at the shapes the
bench claims (512² SD, 1024² SDXL). This script runs the CFG denoising
process with random weights (numerics are weight-independent in
distribution) and tracks BOTH trajectories in ONE scan:

  * x_exact — stepped by the exact full-forward eps every step;
  * x_er2   — stepped by the er2 eps (UNet down path recomputed only on
    key steps, stride 2 'early' — the bench turbo config,
    pipelines/base.py:encoder_key_gates).

Per step it records:
  * eps_rel   — ||eps_er2(x_er2) - eps_exact(x_er2)|| / ||eps_exact(x_er2)||:
    the LOCAL approximation error at the er2 trajectory's own state
    (zero on key steps by construction);
  * drift_rel — ||x_er2 - x_exact|| / ||x_exact||: accumulated trajectory
    divergence.

The CFG (B=2) process is measured; the rich pass applies the identical
per-row approximation (same encode/decode split, same key-step gates), so
its per-row numerics match. Output: one JSON line per model to stdout and
artifacts/round5_perf/er2_divergence.jsonl (per-step arrays + finals).

Runs on the real chip (~2-4 min incl. compile); CPU fallback works for a
smoke run at tiny shapes with --tiny.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY = "--tiny" in sys.argv
if TINY:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if TINY:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rich_text_to_image_tpu.models import config as cfgs
from rich_text_to_image_tpu.models.unet import EMPTY_CAPTURE
from rich_text_to_image_tpu.pipelines.base import encoder_key_gates
from rich_text_to_image_tpu.pipelines.region_sd import _plan_arrays

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "round5_perf", "er2_divergence.jsonl")
STEPS = 50
STRIDE = 2


def _build(kind):
    if kind == "sd15":
        from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

        if TINY:
            pipe = RegionDiffusion.random_init(
                seed=0, unet_cfg=cfgs.TINY_UNET, vae_cfg=cfgs.TINY_VAE,
                text_cfg=cfgs.TINY_TEXT)
        else:
            pipe = RegionDiffusion.random_init(seed=0)
        hw = pipe.unet_cfg.sample_size
        added = None
    else:
        from rich_text_to_image_tpu.pipelines.region_sdxl import (
            RegionDiffusionXL,
        )

        if TINY:
            pipe = RegionDiffusionXL.random_init(
                seed=0, unet_cfg=cfgs.TINY_XL_UNET, vae_cfg=cfgs.TINY_VAE,
                text_cfg=cfgs.TINY_TEXT,
                text2_cfg=cfgs.CLIPTextConfig(
                    vocab_size=1000, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=2,
                    hidden_act="gelu", projection_dim=32))
        else:
            pipe = RegionDiffusionXL.random_init(seed=0)
        hw = pipe.unet_cfg.sample_size
        px = hw * pipe.vae_scale_factor
        add_in = pipe.unet_params["params"]["add_embedding"][
            "linear_1"]["kernel"].shape[0]
        pool_dim = add_in - 6 * pipe.unet_cfg.addition_time_embed_dim
        added = {
            "text_embeds": jax.random.normal(
                jax.random.PRNGKey(3), (2, pool_dim), jnp.float32),
            "time_ids": jnp.asarray(
                [[px, px, 0, 0, px, px]] * 2, jnp.float32),
        }
    return pipe, hw, added


def run(kind):
    pipe, hw, added = _build(kind)
    unet = pipe.unet
    sched = pipe.scheduler
    plan = sched.plan(STEPS)
    gates = jnp.asarray(encoder_key_gates(STEPS, STRIDE, "early"))
    rng = jax.random.PRNGKey(0)
    lat0 = jax.random.normal(
        rng, (1, hw, hw, pipe.unet_cfg.in_channels), jnp.float32
    ) * getattr(plan, "init_noise_sigma", 1.0)
    ehs = jax.random.normal(
        jax.random.PRNGKey(1), (2, 77, pipe.unet_cfg.cross_attention_dim),
        jnp.float32)
    g = jnp.float32(7.5)

    def full_eps(params, plan_arrs, i, lat):
        x = sched.scale_model_input(
            plan_arrs, i, jnp.concatenate([lat, lat], 0))
        emb = unet.apply(params, plan_arrs.timesteps[i], 2, added,
                         method=unet.embed_time)
        enc = unet.apply(params, x, emb, ehs, None, EMPTY_CAPTURE,
                         method=unet.encode)
        eps, _ = unet.apply(params, enc, emb, ehs, None, EMPTY_CAPTURE,
                            method=unet.decode)
        eps = eps.astype(jnp.float32)
        return (eps[0:1] + g * (eps[1:2] - eps[0:1])), enc

    def er2_eps(params, plan_arrs, i, lat, enc_cache):
        x = sched.scale_model_input(
            plan_arrs, i, jnp.concatenate([lat, lat], 0))
        emb = unet.apply(params, plan_arrs.timesteps[i], 2, added,
                         method=unet.embed_time)

        def enc_now(_):
            return unet.apply(params, x, emb, ehs, None, EMPTY_CAPTURE,
                              method=unet.encode)

        enc = jax.lax.cond(gates[i], enc_now, lambda c: c, enc_cache)
        eps, _ = unet.apply(params, enc, emb, ehs, None, EMPTY_CAPTURE,
                            method=unet.decode)
        eps = eps.astype(jnp.float32)
        return (eps[0:1] + g * (eps[1:2] - eps[0:1])), enc

    @jax.jit
    def scan(params, lat0, plan_arrs):
        st0e = sched.init_state(lat0.shape)
        st0a = sched.init_state(lat0.shape)
        enc0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda p, l: full_eps(p, plan_arrs, 0, l)[1],
                           params, lat0))

        def body(carry, i):
            lx, ste, la, sta, enc_cache = carry
            # exact trajectory step
            e_exact, _ = full_eps(params, plan_arrs, i, lx)
            lx2, ste2 = sched.step(plan_arrs, i, ste, e_exact, lx)
            # er2 trajectory step + the exact eps AT THE ER2 STATE
            e_er2, enc_new = er2_eps(params, plan_arrs, i, la, enc_cache)
            e_ref, _ = full_eps(params, plan_arrs, i, la)
            la2, sta2 = sched.step(plan_arrs, i, sta, e_er2, la)
            eps_rel = jnp.linalg.norm(e_er2 - e_ref) / (
                jnp.linalg.norm(e_ref) + 1e-12)
            drift = jnp.linalg.norm(la2 - lx2) / (
                jnp.linalg.norm(lx2) + 1e-12)
            return (lx2, ste2, la2, sta2, enc_new), (eps_rel, drift)

        (lx, _, la, _, _), (eps_rel, drift) = jax.lax.scan(
            body, (lat0, st0e, lat0, st0a, enc0), jnp.arange(STEPS))
        return lx, la, eps_rel, drift

    t0 = time.time()
    lx, la, eps_rel, drift = scan(pipe.unet_params, lat0, _plan_arrays(plan))
    lx, la, eps_rel, drift = jax.device_get((lx, la, eps_rel, drift))
    dt = time.time() - t0
    final_rel = float(np.linalg.norm(la - lx) / (np.linalg.norm(lx) + 1e-12))
    rec = {
        "model": kind,
        "latent_hw": int(hw),
        "steps": STEPS,
        "stride": STRIDE,
        "schedule": "early",
        "eps_rel_per_step": [round(float(v), 5) for v in eps_rel],
        "drift_rel_per_step": [round(float(v), 5) for v in drift],
        "eps_rel_mean_nonkey": round(float(
            eps_rel[~np.asarray(encoder_key_gates(STEPS, STRIDE, "early"))]
            .mean()), 5),
        "final_latent_rel_dist": round(final_rel, 5),
        "wall_s": round(dt, 1),
        "tiny": TINY,
    }
    print(json.dumps({k: v for k, v in rec.items()
                      if not k.endswith("per_step")}))
    return rec


def main():
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    recs = [run("sd15"), run("sdxl")]
    with open(OUT, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
