"""Microbench: why does the SDXL plain pass run at ~103 TF/s (MFU 0.52)
while the rich merged forward hits ~146 TF/s?

Times isolated jitted XL UNet forwards on the real chip:
  * B=2 capture-free          (the plain pass's CFG forward, no capture)
  * B=2 with plain capture    (10 attn1@64 avg-probs + 14 cross layers)
  * B=4 capture-free          (the rich pass's merged-forward shape)
  * B=2 cross-only capture    (what a cheaper plain capture would cost)

Timing note: device_get (not block_until_ready) is the only true sync
through this environment's TPU relay.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(iters=10):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL
    from rich_text_to_image_tpu.models.unet import CaptureSpec
    from rich_text_to_image_tpu.utils.flops import unet_fwd_flops, peak_flops

    model = RegionDiffusionXL.random_init(seed=0)
    unet, params = model.unet, model.unet_params
    h = w = 128
    seg_res, self_layers, cross_by_res = model._capture_layout((h, w))
    cross_layers = tuple(n for ns in cross_by_res.values() for n in ns)
    peak, kind = peak_flops()
    print(json.dumps({"chip": kind, "peak_tflops_s": round(peak / 1e12, 0),
                      "n_self": len(self_layers),
                      "n_cross": len(cross_layers)}), flush=True)

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

    cases = {
        "B2_nocap": (2, None),
        "B2_plain_capture": (2, CaptureSpec(
            self_probs=frozenset(self_layers),
            cross_probs=frozenset(cross_layers))),
        "B2_cross_only": (2, CaptureSpec(
            cross_probs=frozenset(cross_layers))),
        "B4_nocap": (4, None),
        "B6_nocap": (6, None),
    }
    for tag, (B, cap) in cases.items():
        x, e, added = make_args(B)

        @jax.jit
        def fwd(params, x, e):
            eps, aux = unet.apply(params, x, jnp.int32(500), e,
                                  added_cond=added, capture=cap)
            # reduce aux so capture outputs are live but cheap to fetch
            extra = sum(
                jnp.sum(v[1]) for d in aux.values() for v in d.values()
            ) if aux else jnp.float32(0)
            return jnp.sum(eps) + extra

        jax.device_get(fwd(params, x, e))  # compile+warm
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


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
