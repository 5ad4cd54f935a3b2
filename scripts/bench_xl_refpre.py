"""SDXL e2e A/B on the real chip: refer-trajectory precompute + turbo knobs.

Times the full driver-bench workload (footnote rich JSON, 50 steps,
inject_selfattn 0.2 / inject_background 0.3, 1024²) under:

  * baseline      — the in-batch merged refer flow (--no_ref_precompute)
  * refpre        — plain pass captures (Q,K)/resnet + trajectory; rich
                    pass runs R+2 rows at every step (output-exact)
  * refpre+er2    — + encoder reuse stride 2 'early' (eval-gated approx)
  * refpre+er2+bf16vae — + bf16 image decodes (reference's efficient-variant
                    precision tier)

Each case: one warmup (compile) + min-of-2 timed e2e runs.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_xl_refpre.py \
    [case ...]   # default: all cases
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

    base_argv = ["--model", "SDXL", "--random_weights", "--sample_steps",
                 "50", "--inject_selfattn", "0.2", "--inject_background",
                 "0.3", "--run_dir", "/tmp/bench_refpre"]
    cases = [
        ("baseline_inbatch", ["--no_ref_precompute"]),
        ("refpre", []),
        ("refpre_er2", ["--encoder_reuse", "2",
                        "--encoder_schedule", "early"]),
        ("refpre_er2_bf16vae", ["--encoder_reuse", "2",
                                "--encoder_schedule", "early", "--bf16_vae"]),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]
    model = None
    built_with_bf16vae = False
    for tag, extra in cases:
        args = make_parser().parse_args(base_argv + extra)
        need_bf16 = bool(getattr(args, "bf16_vae", False))
        if model is None or need_bf16 != built_with_bf16vae:
            t0 = time.time()
            model = build_model(args)
            built_with_bf16vae = need_bf16
            print(f"[{tag}] model init {time.time()-t0:.1f}s",
                  file=sys.stderr)
        param = {
            "text_input": json.loads(args.rich_text_json),
            "height": 1024, "width": 1024,
            "guidance_weight": args.guidance_weight,
            "steps": 50, "noise_index": args.seed, "negative_prompt": "",
        }
        t0 = time.time()
        run_sample(model, args, param, save=False)
        print(f"[{tag}] warmup {time.time()-t0:.1f}s", file=sys.stderr)
        times = []
        for _ in range(2):
            t0 = time.time()
            run_sample(model, args, param, save=False)
            times.append(time.time() - t0)
        dt = min(times)
        print(json.dumps({"case": tag, "e2e_s": round(dt, 2),
                          "img_per_min": round(60.0 / dt, 2)}), flush=True)


if __name__ == "__main__":
    main(tuple(sys.argv[1:]))
