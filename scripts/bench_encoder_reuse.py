"""Encoder-reuse turbo speedup, measured end-to-end on the real chip.

Runs the CLI rich-text workload (SD-1.5 512², 50 steps) with
--encoder_reuse 1 (exact) vs 2 and 3, sharing one model + warmup per
config, and prints one JSON line per setting. SDXL optional via argv.

Usage: python scripts/bench_encoder_reuse.py [sdxl]
"""

import json
import sys
import time

import jax


def _timed(run_sample, model, args, param):
    t0 = time.time()
    run_sample(model, args, param, save=False)
    return time.time() - t0


def main(kind="sd15"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.cli.sample import (
        build_model, make_parser, run_sample,
    )

    if kind == "sd15":
        argv = ["--model", "SD", "--random_weights", "--sample_steps", "50",
                "--run_dir", "/tmp/bench_er"]
        height = width = 512
    else:
        argv = ["--model", "SDXL", "--random_weights", "--sample_steps", "50",
                "--run_dir", "/tmp/bench_er"]
        height = width = 1024
    args = make_parser().parse_args(argv)
    param = {
        "text_input": json.loads(args.rich_text_json),
        "height": height, "width": width,
        "guidance_weight": args.guidance_weight,
        "steps": 50, "noise_index": args.seed, "negative_prompt": "",
    }
    model = build_model(args)

    results = {}
    for stride in (1, 2, 3):
        args.encoder_reuse = stride
        run_sample(model, args, param, save=False)  # warmup/compile
        dt = min(
            _timed(run_sample, model, args, param) for _ in range(3)
        )
        results[stride] = dt
        print(json.dumps({
            "workload": f"{kind}_richtext_e2e", "encoder_reuse": stride,
            "e2e_s": round(dt, 2),
            "img_per_min": round(60.0 / dt, 2),
            "speedup_vs_exact": round(results[1] / dt, 3),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sd15")
