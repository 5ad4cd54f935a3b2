"""Style-benchmark suite throughput: sequential loop vs batched scan.

Per-item cost of the benchmark_style "ours" workload (SD-1.5 512²,
R=2 regions, no injection/guidance) on the real chip: sequential
prompt_to_img per style pair vs style_bench_batch at several K.

Usage: python scripts/bench_stylebatch.py [steps]
"""

import json
import sys
import time

import jax
import numpy as np


def main(steps=41):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    model = RegionDiffusion.random_init(seed=0)
    h = model.unet_cfg.sample_size
    px = h * model.vae_scale_factor
    rng = np.random.RandomState(0)
    soft = rng.rand(3, h, h).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    model.masks = [soft[i][None] for i in range(3)]
    scene = "a cat sitting next to a dog in a garden"
    styles = ["monet", "van gogh", "dali", "picasso",
              "ukiyo-e", "pop art", "cyberpunk", "watercolor"]
    latent = jax.random.normal(jax.random.PRNGKey(5), (1, h, h, 4))

    def item(i):
        return [f"a cat in the style of {styles[i]}",
                f"a dog in the style of {styles[(i + 1) % 8]}", scene]

    def seq(k):
        for i in range(k):
            model.prompt_to_img(
                item(i), [""], height=px, width=px,
                num_inference_steps=steps, guidance_scale=8.5,
                latents=latent, seed=1,
            )

    def batched(k):
        model.style_bench_batch(
            [item(i) for i in range(k)], px, px, steps, 8.5,
            seed=1, latents=latent,
        )

    seq(1)
    t0 = time.time(); seq(2); seq_s = (time.time() - t0) / 2
    print(json.dumps({"mode": "sequential", "steps": steps,
                      "s_per_item": round(seq_s, 2)}), flush=True)
    for k in (2, 4, 8):
        batched(k)
        t0 = time.time(); batched(k); dt = time.time() - t0
        print(json.dumps({
            "mode": f"batched_k{k}", "steps": steps,
            "s_per_item": round(dt / k, 2),
            "speedup_vs_sequential": round(seq_s / (dt / k), 2),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 41)
