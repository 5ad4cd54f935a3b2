"""SDXL 1024² plain-pass capture cost breakdown (VERDICT item 8).

Times the jitted plain scan with the full capture layout (all 32²-res attn1
layers + the XL cross registry, reference region_diffusion_sdxl.py:959-1009)
vs a no-capture variant of the same scan, on the real chip. Also times the
segmentation + text-encode + decode phases for a full phase breakdown.

Usage: python scripts/bench_sdxl_capture.py [--steps 50]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")

    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

    t0 = time.time()
    model = RegionDiffusionXL.random_init(seed=0)
    print(f"init {time.time()-t0:.0f}s", file=sys.stderr)

    h = w = 1024 // model.vae_scale_factor
    embeds, pooled = model.encode_prompt(
        ["a cat riding a scooter"], "")
    time_ids = jnp.asarray(
        model._get_add_time_ids((1024, 1024), (0, 0), (1024, 1024)))
    plan = model.scheduler.plan(args.steps)
    from rich_text_to_image_tpu.pipelines.region_sd import _plan_arrays

    plan_dev = _plan_arrays(plan)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, h, w, 4))
    latents = latents * getattr(plan, "init_noise_sigma", 1.0)

    def timed(fn, *a, label=""):
        out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])  # compile+sync
        t0 = time.time()
        out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
        dt = time.time() - t0
        print(json.dumps({"phase": label, "seconds": round(dt, 3)}),
              flush=True)
        return dt

    g = jnp.float32(5.0)
    seg_res, self_layers, cross_by_res = model._capture_layout((h, w))
    print(f"capture layout: {len(self_layers)} self layers @ {seg_res}², "
          f"{sum(len(v) for v in cross_by_res.values())} cross layers",
          file=sys.stderr)

    fn_cap = model._plain_fn((h, w), plan.num_steps, seg_res, self_layers,
                             tuple(sorted(cross_by_res.items())))
    t_cap = timed(fn_cap, model.unet_params, latents, embeds[:2], pooled[:2],
                  time_ids, plan_dev, g, label="plain_pass_capture_on")

    fn_nocap = model._plain_fn((h, w), plan.num_steps, seg_res, (), ())
    t_nocap = timed(fn_nocap, model.unet_params, latents, embeds[:2],
                    pooled[:2], time_ids, plan_dev, g,
                    label="plain_pass_capture_off")

    # segmentation phase (host+device): run the token mapper on the captured
    # aggregates like the CLI flow does
    from rich_text_to_image_tpu.utils.token_maps import (
        AttnAggregates, get_token_maps,
    )

    lat, self_sum, cross = fn_cap(model.unet_params, latents, embeds[:2],
                                  pooled[:2], time_ids, plan_dev, g)
    agg = AttnAggregates(
        self_sum=np.asarray(self_sum), self_count=len(self_layers),
        cross_sums={r: np.asarray(v) for (r, _), v in
                    zip(sorted(cross_by_res.items()), cross)},
        cross_layer_count=sum(len(v) for v in cross_by_res.values()),
    )
    t0 = time.time()
    masks = get_token_maps(agg, [[2], [4]], (h, w), 0,
                           segment_threshold=0.55, num_segments=9)
    np.asarray(masks[0])
    print(json.dumps({"phase": "token_maps", "seconds":
                      round(time.time() - t0, 3)}), flush=True)

    model.decode_latents(lat)  # compile warmup
    t0 = time.time()
    model.decode_latents(lat)
    print(json.dumps({"phase": "vae_decode", "seconds":
                      round(time.time() - t0, 3)}), flush=True)

    # second token_maps call with the cluster cache warm (the CLI flow
    # segments the same affinity twice — color spans then region spans)
    t0 = time.time()
    get_token_maps(agg, [[2], [4]], (h, w), 0,
                   segment_threshold=0.55, num_segments=9)
    print(json.dumps({"phase": "token_maps_cached", "seconds":
                      round(time.time() - t0, 3)}), flush=True)

    overhead = (t_cap - t_nocap) / t_nocap * 100
    print(json.dumps({"phase": "capture_overhead_pct",
                      "value": round(overhead, 1)}), flush=True)


if __name__ == "__main__":
    main()
