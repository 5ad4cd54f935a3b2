"""Color-benchmark suite throughput: sequential loop vs batched scan.

Measures the per-item cost of the benchmark_color "ours" workload
(SD-1.5 512², reference protocol knobs: guidance + inject 0.2/0.3) on the
real chip, comparing the reference-style sequential loop
(prompt_to_img per color) against color_bench_batch at several K.

Usage: python scripts/bench_colorbatch.py [steps]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(steps=41):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.ops.resize import resize_bicubic
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    model = RegionDiffusion.random_init(seed=0)
    h = model.unet_cfg.sample_size
    px = h * model.vae_scale_factor
    rng = np.random.RandomState(0)
    soft = rng.rand(2, h, h).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    model.masks = [soft[0][None], soft[1][None]]
    region_mask_px = np.asarray(
        resize_bicubic(soft[0][None], (px, px))).clip(0, 1)[0]
    base = "a photo of a car on the road"
    names = ["red", "green", "blue", "gold", "teal", "navy", "pink", "gray"]
    rgbs = rng.rand(8, 3).astype(np.float32)
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, h, h, 4))

    def seq(k):
        for i in range(k):
            fmt = {"guidance_start_step": 999, "color_guidance_weight": 1,
                   "target_RGB": [rgbs[i]],
                   "color_obj_atten": [region_mask_px[None]],
                   "color_obj_atten_all": np.asarray(model.masks[0])}
            model.prompt_to_img(
                [f"{names[i]} car", base], [""], height=px, width=px,
                num_inference_steps=steps, guidance_scale=8.5,
                latents=latent, text_format_dict=fmt, use_guidance=True,
                inject_selfattn=0.2, inject_background=0.3, seed=1,
            )

    def batched(k, bf16=False, gds=1):
        model.color_bench_batch(
            [f"{names[i]} car" for i in range(k)], base, rgbs[:k],
            region_mask_px, px, px, steps, 8.5, seed=1, latents=latent,
            bf16_guidance=bf16, guidance_downsample=gds,
        )

    seq(1)  # compile
    t0 = time.time(); seq(2); seq_s = (time.time() - t0) / 2
    print(json.dumps({"mode": "sequential", "steps": steps,
                      "s_per_item": round(seq_s, 2)}), flush=True)
    for k in (2, 4, 8):
        batched(k)  # compile
        t0 = time.time(); batched(k); dt = time.time() - t0
        print(json.dumps({
            "mode": f"batched_k{k}", "steps": steps,
            "s_per_item": round(dt / k, 2),
            "speedup_vs_sequential": round(seq_s / (dt / k), 2),
        }), flush=True)
    for k in (8,):
        batched(k, bf16=True)  # compile
        t0 = time.time(); batched(k, bf16=True); dt = time.time() - t0
        print(json.dumps({
            "mode": f"batched_k{k}_bf16grad", "steps": steps,
            "s_per_item": round(dt / k, 2),
            "speedup_vs_sequential": round(seq_s / (dt / k), 2),
        }), flush=True)
    # opt-in reduced-resolution guidance gradient (--guidance_downsample)
    for bf16 in (False, True):
        batched(8, bf16=bf16, gds=2)  # compile
        t0 = time.time(); batched(8, bf16=bf16, gds=2)
        dt = time.time() - t0
        print(json.dumps({
            "mode": "batched_k8_gds2" + ("_bf16grad" if bf16 else ""),
            "steps": steps, "s_per_item": round(dt / 8, 2),
            "speedup_vs_sequential": round(seq_s / (dt / 8), 2),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 41)
