"""SD-1.5 e2e A/B on the real chip: encoder-reuse turbo on the rich pass.

Times the full driver-bench workload (reference sample.py default footnote
rich JSON, 50 steps, CFG 8.5, 512², no injection) under:

  * exact — the round-3/4 bench configuration (everything output-exact)
  * er2   — + encoder reuse stride 2 'early' on the rich pass (eval-gated
            approx: trained-fixture steering gate,
            tests/test_color_fixture.py::test_encoder_reuse_preserves_steering;
            the plain/capture pass stays exact so token maps and the refer
            trajectory are untouched)

Each case: one warmup (compile) + min-of-3 timed e2e runs (relay host
latency varies with load; min-of-3 is stable).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_sd_er2.py
"""
import json
import sys
import time


def main(only=()):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.cli.sample import (
        build_model, make_parser, run_sample,
    )

    base_argv = ["--model", "SD", "--random_weights", "--sample_steps",
                 "50", "--run_dir", "/tmp/bench_sd_er2"]
    cases = [
        ("exact", []),
        ("er2", ["--encoder_reuse", "2", "--encoder_schedule", "early"]),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]
    model = None
    for tag, extra in cases:
        args = make_parser().parse_args(base_argv + extra)
        if model is None:
            t0 = time.time()
            model = build_model(args)
            print(f"[{tag}] model init {time.time()-t0:.1f}s",
                  file=sys.stderr)
        param = {
            "text_input": json.loads(args.rich_text_json),
            "height": 512, "width": 512,
            "guidance_weight": args.guidance_weight,
            "steps": 50, "noise_index": args.seed, "negative_prompt": "",
        }
        t0 = time.time()
        run_sample(model, args, param, save=False)
        print(f"[{tag}] warmup {time.time()-t0:.1f}s", file=sys.stderr)
        times = []
        for _ in range(3):
            t0 = time.time()
            run_sample(model, args, param, save=False)
            times.append(time.time() - t0)
        dt = min(times)
        print(json.dumps({"case": tag, "e2e_s": round(dt, 2),
                          "img_per_min": round(60.0 / dt, 2),
                          "times": [round(t, 2) for t in times]}),
              flush=True)


if __name__ == "__main__":
    main(tuple(sys.argv[1:]))
