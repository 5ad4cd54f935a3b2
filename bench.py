"""Benchmark: end-to-end SD-1.5 512² rich-text sample throughput on TPU.

Workload (BASELINE.md): the reference sample.py default — footnote
rich-text JSON, 50 steps, CFG 8.5 — run end-to-end: plain pass (with
attention capture) → token-map segmentation → rich pass (2 region prompts).
Random weights (no checkpoint access in this environment); throughput is
weight-independent.

Baseline: the reference publishes no numbers (BASELINE.md), so vs_baseline
compares against an estimated diffusers-on-A100 end-to-end rate for the
same workload: ~6s plain pass + ~5s sklearn spectral clustering + ~20s rich
pass (two region forwards + uncond + base per step, sequential) ≈ 31s/image
→ ~1.94 img/min. That estimate is conservative for the baseline (no hook
overhead counted).

Timing note: on this environment's TPU relay, block_until_ready does not
synchronize — only device_get does. Every phase below ends in a host fetch
(np.asarray of images/aggregates), so wall-clock timing is sound.
"""

import json
import sys
import time


BASELINE_IMG_PER_MIN = 1.94  # estimated diffusers-on-A100, see module docstring


def main():
    import numpy as np

    import jax

    # persistent compilation cache: warmup is dominated by (remote) compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rich_text_to_image_tpu.cli.sample import make_parser, run_sample
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    args = make_parser().parse_args(
        ["--random_weights", "--sample_steps", "50", "--run_dir", "/tmp/bench_out"]
    )
    param = {
        "text_input": json.loads(args.rich_text_json),
        "height": 512,
        "width": 512,
        "guidance_weight": args.guidance_weight,
        "steps": 50,
        "noise_index": args.seed,
        "negative_prompt": "",
    }
    t0 = time.time()
    model = RegionDiffusion.random_init(seed=0)
    print(f"[bench] model init (host): {time.time()-t0:.1f}s", file=sys.stderr)

    # warmup: compile every program (plain scan, token maps, rich scan, decode)
    t0 = time.time()
    run_sample(model, args, param, save=False)
    print(f"[bench] warmup (incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # timed end-to-end run (all programs cached)
    t0 = time.time()
    run_sample(model, args, param, save=False)
    dt = time.time() - t0
    img_per_min = 60.0 / dt

    print(json.dumps({
        "metric": "sd15_512_richtext_e2e_images_per_min",
        "value": round(img_per_min, 3),
        "unit": "images/min/chip",
        "vs_baseline": round(img_per_min / BASELINE_IMG_PER_MIN, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # still emit a parseable record on failure
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "sd15_512_richtext_e2e_images_per_min",
            "value": 0.0,
            "unit": "images/min/chip",
            "vs_baseline": 0.0,
        }))
        sys.exit(1)
