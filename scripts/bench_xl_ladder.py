"""Microbench: SDXL UNet forward step-time ladder at 1024² (B = 2..6).

Sizes the refer-trajectory redesign: the rich pass currently runs
[uncond, base, ref_u, ref_c, spans...] = R+4 rows during refer steps.
Since the refer trajectory is mathematically the plain pass trajectory
(same base prompt, seed, scheduler — reference recomputes it,
region_diffusion_sdxl.py:805-828), the plain pass can supply its latents
(drop ref_u → R+3 rows) or its captured (Q,K)+resnet features (drop both
refer rows → R+2 rows).  The B-ladder prices each variant; also times the
1024² VAE decode (tf32 conv passes, pipelines/base.py:88-96) and a B=2
forward with the qk+resnet capture the precompute variant would add to
the plain pass.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_xl_ladder.py
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(iters=8):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL
    from rich_text_to_image_tpu.models.unet import CaptureSpec
    from rich_text_to_image_tpu.utils.flops import unet_fwd_flops, peak_flops

    model = RegionDiffusionXL.random_init(seed=0)
    unet, params = model.unet, model.unet_params
    h = w = 128
    peak, kind = peak_flops()
    print(json.dumps({"chip": kind, "peak_tflops_s": round(peak / 1e12, 0)}),
          flush=True)
    rng = np.random.RandomState(0)

    def make_args(B):
        x = jnp.asarray(rng.randn(B, h, w, 4), jnp.float32)
        e = jnp.asarray(rng.randn(B, 77, 2048), jnp.float32)
        added = {
            "text_embeds": jnp.asarray(rng.randn(B, 1280), jnp.float32),
            "time_ids": jnp.tile(
                jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32),
                (B, 1)),
        }
        return x, e, added

    qk_capture = CaptureSpec(
        qk=True, resnet=frozenset({"up_blocks.1.resnets.1"})
    )
    cases = [(f"B{B}_nocap", B, None) for B in (2, 3, 4, 5, 6)]
    cases.append(("B2_qk_capture", 2, qk_capture))

    for tag, B, cap in cases:
        x, e, added = make_args(B)

        @jax.jit
        def fwd(params, x, e):
            eps, aux = unet.apply(params, x, jnp.int32(500), e,
                                  added_cond=added, capture=cap)
            extra = sum(
                jnp.sum(v[1] if isinstance(v, tuple) else v)
                for d in aux.values() for v in d.values()
            ) if aux else jnp.float32(0)
            return jnp.sum(eps) + extra

        jax.device_get(fwd(params, x, e))
        t0 = time.time()
        for _ in range(iters):
            r = fwd(params, x, e)
        jax.device_get(r)
        dt = (time.time() - t0) / iters
        f = unet_fwd_flops(model, B, True)
        print(json.dumps({
            "case": tag, "s": round(dt, 4),
            "model_tflops": round(f / 1e12, 1),
            "achieved_tflops_s": round(f / dt / 1e12, 1),
            "mfu": round(f / dt / peak, 3),
        }), flush=True)

    # qk capture HBM cost estimate: bytes of the captured tensors
    shapes = jax.eval_shape(
        lambda p, x, e: unet.apply(p, x, jnp.int32(500), e,
                                   added_cond=make_args(2)[2],
                                   capture=qk_capture)[1],
        params, *make_args(2)[:2],
    )
    n_bytes = sum(
        np.prod(s.shape) * s.dtype.itemsize
        for s in jax.tree.leaves(shapes)
    )
    print(json.dumps({"case": "qk_capture_bytes_B2",
                      "gb": round(n_bytes / 1e9, 3)}), flush=True)

    # VAE decode at 1024²: tf32 (production path) vs bf16 dtype
    vae, vparams = model.vae, model.vae_params
    z = jnp.asarray(rng.randn(1, 128, 128, 4), jnp.float32)

    @jax.jit
    def dec_tf32(p, z):
        with jax.default_matmul_precision("tensorfloat32"):
            return vae.apply(p, z, method=vae.decode)

    from rich_text_to_image_tpu.models.vae import AutoencoderKL
    vae_bf16 = AutoencoderKL(model.vae_cfg, dtype=jnp.bfloat16)

    @jax.jit
    def dec_bf16(p, z):
        return vae_bf16.apply(p, z, method=vae_bf16.decode)

    for tag, fn in (("vae_decode_tf32", dec_tf32),
                    ("vae_decode_bf16", dec_bf16)):
        jax.device_get(fn(vparams, z))
        t0 = time.time()
        for _ in range(4):
            r = fn(vparams, z)
        jax.device_get(r)
        print(json.dumps({"case": tag, "s": round((time.time() - t0) / 4, 4)}),
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
