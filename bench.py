"""Benchmark: end-to-end rich-text sample throughput on one TPU chip.

Two records (both BASELINE.md target rows), one JSON line each:
  * sd15_512_richtext_e2e_images_per_min — reference sample.py default
    workload (footnote rich-text JSON, 2 region prompts), 50 steps, CFG 8.5,
    512²: plain pass with attention capture → token-map segmentation → rich
    pass.  (reference: sample.py:17-114)
  * sdxl_1024_richtext_e2e_images_per_min — same flow at 1024² on SDXL with
    self-attention injection 0.2 + background injection 0.3 on (the
    benchmark_color.py "ours" knob setting, benchmark_color.py:251-255).

Random weights (no checkpoint access in this environment); throughput is
weight-independent.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is a *derived* estimate of the reference code on an A100, built
from published diffusers A100 figures for the exact (2+N)-forwards step
structure the reference executes, plus this-host-measured sklearn spectral
clustering time. Full derivation with sources: BASELINE.md §"Derived
baseline". Headline: SD-1.5 ≈ 11.5 s/image → 5.2 img/min; SDXL ≈ 43 s/image
→ 1.4 img/min.

Timing note: on this environment's TPU relay, block_until_ready does not
synchronize — only device_get does. Every phase below ends in a host fetch
(np.asarray of images/aggregates), so wall-clock timing is sound.
"""

import json
import sys
import time

# Derived reference-on-A100 rates; see BASELINE.md §"Derived baseline".
BASELINE_IMG_PER_MIN = {"sd15": 5.2, "sdxl": 1.4}

FAILED = []


def _emit(metric, img_per_min, baseline_key):
    print(json.dumps({
        "metric": metric,
        "value": round(img_per_min, 3),
        "unit": "images/min/chip",
        "vs_baseline": round(img_per_min / BASELINE_IMG_PER_MIN[baseline_key], 3),
    }))
    sys.stdout.flush()


def _run(model_kind):
    """Build the model, warm up (compile), and time one e2e rich-text sample."""
    from rich_text_to_image_tpu.cli.sample import (
        build_model, make_parser, run_sample,
    )

    if model_kind == "sd15":
        argv = ["--model", "SD", "--random_weights", "--sample_steps", "50",
                "--run_dir", "/tmp/bench_out"]
        height = width = 512
    else:
        argv = ["--model", "SDXL", "--random_weights", "--sample_steps", "50",
                "--inject_selfattn", "0.2", "--inject_background", "0.3",
                "--run_dir", "/tmp/bench_out_xl"]
        height = width = 1024
    args = make_parser().parse_args(argv)
    param = {
        "text_input": json.loads(args.rich_text_json),
        "height": height,
        "width": width,
        "guidance_weight": args.guidance_weight,
        "steps": 50,
        "noise_index": args.seed,
        "negative_prompt": "",
    }
    t0 = time.time()
    model = build_model(args)
    print(f"[bench:{model_kind}] model init: {time.time()-t0:.1f}s",
          file=sys.stderr)

    # warmup: compile every program (plain scan, token maps, rich scan, decode)
    t0 = time.time()
    run_sample(model, args, param, save=False)
    print(f"[bench:{model_kind}] warmup (incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # timed end-to-end run (all programs cached)
    t0 = time.time()
    run_sample(model, args, param, save=False)
    dt = time.time() - t0
    print(f"[bench:{model_kind}] timed e2e: {dt:.2f}s", file=sys.stderr)
    return 60.0 / dt


def main():
    import jax

    # persistent compilation cache: warmup is dominated by (remote) compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for kind, metric in (
        ("sd15", "sd15_512_richtext_e2e_images_per_min"),
        ("sdxl", "sdxl_1024_richtext_e2e_images_per_min"),
    ):
        try:
            _emit(metric, _run(kind), kind)
        except Exception:
            import traceback

            traceback.print_exc()
            FAILED.append(kind)
            _emit(metric, 0.0, kind)


if __name__ == "__main__":
    main()
    sys.exit(1 if FAILED else 0)
