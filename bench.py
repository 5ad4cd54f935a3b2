"""Benchmark: end-to-end rich-text sample throughput on one TPU chip.

Two records (both BASELINE.md target rows), one JSON line each:
  * sd15_512_richtext_e2e_images_per_min — reference sample.py default
    workload (footnote rich-text JSON, 2 region prompts), 50 steps, CFG 8.5,
    512²: plain pass with attention capture → token-map segmentation → rich
    pass.  (reference: sample.py:17-114)
  * sdxl_1024_richtext_e2e_images_per_min — same flow at 1024² on SDXL with
    self-attention injection 0.2 + background injection 0.3 on (the
    benchmark_color.py "ours" knob setting, benchmark_color.py:251-255).

Each model is measured in TWO configs and BOTH are recorded in the same
JSON line:
  * ``value``/``mfu``/``vs_baseline`` — the turbo config (encoder-reuse
    stride 2 'early'; SDXL also bf16 image decode), each knob eval-gated on
    the trained color fixture (tests/test_color_fixture.py). These knobs
    CHANGE outputs (approximations), so:
  * ``value_exact``/``mfu_exact``/``vs_baseline_exact`` — the exact
    configuration: bit-identical output structure to the reference
    algorithm (the refer-trajectory precompute stays on — it is
    output-exact, tests/test_ref_precompute.py). Apples-to-apples against
    the derived baseline, which models the exact reference math.

Random weights (no checkpoint access in this environment); throughput is
weight-independent.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is a *derived* estimate of the reference code on an A100, built
from published diffusers A100 figures for the exact (2+N)-forwards step
structure the reference executes, plus this-host-measured sklearn spectral
clustering time. Full derivation with sources: BASELINE.md §"Derived
baseline". Headline: SD-1.5 ≈ 11.5 s/image → 5.2 img/min; SDXL ≈ 43 s/image
→ 1.4 img/min.

After both models run, the README.md benchmark table between the
BENCH_TABLE markers is regenerated from the fresh numbers (VERDICT r4
weak #6: the table drifted twice when it was hand-maintained).

Timing note: on this environment's TPU relay, block_until_ready does not
synchronize — only device_get does. Every phase below ends in a host fetch
(np.asarray of images/aggregates), so wall-clock timing is sound.
"""

import json
import os
import sys
import time

# Derived reference-on-A100 rates; see BASELINE.md §"Derived baseline".
BASELINE_IMG_PER_MIN = {"sd15": 5.2, "sdxl": 1.4}

FAILED = []


def _emit(metric, baseline_key, turbo, exact):
    """One JSON line per model: turbo is the headline ``value``; the exact
    config rides the same record so the driver's BENCH_r*.json always
    carries the apples-to-apples number next to it."""
    rate, mfu = turbo
    rec = {
        "metric": metric,
        "value": round(rate, 3),
        "unit": "images/min/chip",
        "vs_baseline": round(rate / BASELINE_IMG_PER_MIN[baseline_key], 3),
    }
    if mfu is not None:
        rec["mfu"] = round(mfu, 4)
    if exact is not None:
        rate_e, mfu_e = exact
        rec["value_exact"] = round(rate_e, 3)
        rec["vs_baseline_exact"] = round(
            rate_e / BASELINE_IMG_PER_MIN[baseline_key], 3)
        if mfu_e is not None:
            rec["mfu_exact"] = round(mfu_e, 4)
    print(json.dumps(rec))
    sys.stdout.flush()
    return rec


def _e2e_flops(model, model_kind, steps, stride):
    """Model FLOPs of the timed e2e run, for MFU attribution.

    Counts the two denoising scans' UNet rows and the two image decodes —
    the compute that dominates the run. Phases intentionally left out
    (text encode, capture aggregation einsums, spectral segmentation,
    resizes) are bandwidth-light, so the reported MFU is a slight
    UNDERestimate. Row structure per step (pipelines/region_sd.py /
    region_sdxl.py): plain pass = one B=2 CFG forward; rich pass = one
    [uncond, base, spans] (R+2)-row forward (refer-trajectory precompute
    keeps refer rows out of the rich scan even with injection on). With
    encoder reuse (stride > 1) MFU counts EXECUTED FLOPs: the down path is
    skipped on non-key steps; stride 1 is the exact config (all steps key).
    """
    from rich_text_to_image_tpu.pipelines.base import encoder_key_gates
    from rich_text_to_image_tpu.utils.flops import (
        unet_encode_flops, unet_fwd_flops, vae_decode_flops,
    )

    xl = model_kind == "sdxl"
    R = max(len(model.masks) - 1, 1)  # span rows (masks = spans + bg)
    f_plain = unet_fwd_flops(model, 2, xl)
    f_full = unet_fwd_flops(model, R + 2, xl)
    f_enc = unet_encode_flops(model, R + 2, xl)
    n_key = int(encoder_key_gates(steps, stride, "early").sum())
    f_rich = n_key * f_full + (steps - n_key) * (f_full - f_enc)
    return steps * f_plain + f_rich + 2 * vae_decode_flops(model)


def _argv(model_kind, exact):
    if model_kind == "sd15":
        argv = ["--model", "SD", "--random_weights", "--sample_steps", "50",
                "--run_dir", "/tmp/bench_out"]
        hw = 512
    else:
        argv = ["--model", "SDXL", "--random_weights", "--sample_steps", "50",
                "--inject_selfattn", "0.2", "--inject_background", "0.3",
                "--run_dir", "/tmp/bench_out_xl"]
        hw = 1024
    if not exact:
        # The turbo knobs — the only non-exact math in either bench config,
        # each eval-gated on the trained color fixture
        # (tests/test_color_fixture.py) and A/B'd on-chip
        # (artifacts/round4_perf/bench_xl_refpre.jsonl):
        #   --encoder_reuse 2 'early' — recompute the UNet down path only on
        #     key steps (Faster Diffusion); steering margin preserved,
        #     region-color distance within 0.05 of exact.
        #   --bf16_vae (SDXL) — bf16 image decode (fp32 range; the
        #     reference's efficient variant itself casts the VAE down,
        #     region_diffusion_sdxl_efficient.py:850-855); gate: bf16 tracks
        #     fp32 pixels at mean 0.0016 / max 0.0093 in [0,1] RGB
        #     (sub-uint8-step) on the trained decoder.
        # The refer-trajectory precompute (default-on) is OUTPUT-EXACT
        # (tests/test_ref_precompute.py) and rides both configs.
        argv += ["--encoder_reuse", "2", "--encoder_schedule", "early"]
        if model_kind == "sdxl":
            argv += ["--bf16_vae"]
    return argv, hw


def _run(model_kind, exact):
    """Build the model, warm up (compile), and time one e2e rich-text sample."""
    from rich_text_to_image_tpu.cli.sample import (
        build_model, make_parser, run_sample,
    )

    tag = "exact" if exact else "turbo"
    argv, hw = _argv(model_kind, exact)
    args = make_parser().parse_args(argv)
    param = {
        "text_input": json.loads(args.rich_text_json),
        "height": hw,
        "width": hw,
        "guidance_weight": args.guidance_weight,
        "steps": 50,
        "noise_index": args.seed,
        "negative_prompt": "",
    }
    t0 = time.time()
    model = build_model(args)
    print(f"[bench:{model_kind}:{tag}] model init: {time.time()-t0:.1f}s",
          file=sys.stderr)

    # warmup: compile every program (plain scan, token maps, rich scan, decode)
    t0 = time.time()
    run_sample(model, args, param, save=False)
    print(f"[bench:{model_kind}:{tag}] warmup (incl. compile): "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    # timed end-to-end runs (all programs cached): best of N.  The TPU
    # relay's per-dispatch host latency varies with host load; a single
    # timed run has been observed ±15% on a loaded host while min-of-N is
    # stable (the chip-side work is deterministic). The headline turbo
    # config gets 3 repeats; exact gets 2 (keeps the 2-config × 2-model
    # bench inside the driver budget).
    times = []
    for _ in range(2 if exact else 3):
        t0 = time.time()
        run_sample(model, args, param, save=False)
        times.append(time.time() - t0)
    dt = min(times)
    print(f"[bench:{model_kind}:{tag}] timed e2e: {dt:.2f}s "
          f"(min of {[round(t, 2) for t in times]})", file=sys.stderr)

    mfu = None
    try:
        from rich_text_to_image_tpu.utils.flops import peak_flops

        flops = _e2e_flops(model, model_kind, steps=50,
                           stride=1 if exact else 2)
        peak, kind = peak_flops()
        mfu = flops / dt / peak
        print(f"[bench:{model_kind}:{tag}] model flops {flops/1e12:.1f} TF, "
              f"chip '{kind}' peak {peak/1e12:.0f} TF/s -> MFU {mfu:.3f}",
              file=sys.stderr)
    except Exception:
        import traceback

        traceback.print_exc()
    del model
    return 60.0 / dt, mfu


def _wait_for_backend(max_wait_s=1800):
    """Ride out transient TPU-relay outages (observed: backend init fails
    UNAVAILABLE for tens of minutes, then recovers) instead of recording a
    0.0 bench. Bounded so a dead relay still fails within the driver's
    budget."""
    import subprocess

    t0 = time.time()
    while True:
        # probe in a bounded SUBPROCESS: a failed in-process init blocks on
        # the PJRT client's internal retry for tens of minutes and can leave
        # jax's backend state poisoned; a fresh interpreter with a timeout
        # gives a clean bounded health check
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=600,
            )
            ok, tag = r.returncode == 0, r.stdout.strip()
        except subprocess.TimeoutExpired:
            ok, tag = False, "probe timeout"
        waited = time.time() - t0
        if ok:
            print(f"[bench] backend up: {tag} (after {waited:.0f}s)",
                  file=sys.stderr)
            time.sleep(60)  # let the probe's single-tenant claim release
            return
        if waited > max_wait_s:
            print(f"[bench] backend still down after {waited:.0f}s ({tag})",
                  file=sys.stderr)
            return  # let the per-model path fail and emit the record
        print(f"[bench] backend unavailable ({waited:.0f}s, {tag}), retrying",
              file=sys.stderr)
        time.sleep(60)


README_START = "<!-- BENCH_TABLE_START (generated by bench.py) -->"
README_END = "<!-- BENCH_TABLE_END -->"


def update_readme(records, path=None):
    """Regenerate the README headline-bench rows between the markers from
    fresh bench records, so the table can never drift from BENCH_r*.json."""
    path = path or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "README.md")
    rows = []
    for rec in records:
        if rec is None:
            continue
        sd = rec["metric"].startswith("sd15")
        label = (
            "SD-1.5 512², 50-step **end-to-end rich-text sample** (plain "
            "pass + segmentation + rich pass + decodes)" if sd else
            "SDXL 1024², 50-step end-to-end rich sample (injection 0.2 / "
            "background 0.3)")
        turbo = (f"**{rec['value']} images/min/chip** "
                 f"({rec['vs_baseline']}× derived baseline"
                 + (f"; {rec['mfu']:.3f} model-MFU on executed FLOPs"
                    if "mfu" in rec else "") + ")")
        exact = ("—" if "value_exact" not in rec else
                 f"**{rec['value_exact']}** ({rec['vs_baseline_exact']}×"
                 + (f"; {rec['mfu_exact']:.3f} MFU"
                    if "mfu_exact" in rec else "") + ")")
        rows.append(f"| {label} | {turbo} | {exact} |")
    block = "\n".join([
        README_START,
        "| workload | turbo (eval-gated approximations: encoder-reuse 2"
        " + SDXL bf16 decode) | exact math |",
        "|---|---|---|",
        *rows,
        "",
        "*(derived reference-on-A100 baseline: SD 5.2 / SDXL 1.4 img/min —"
        " BASELINE.md; turbo gates: tests/test_color_fixture.py; table"
        " auto-generated by bench.py — edit there)*",
        README_END,
    ])
    try:
        text = open(path).read()
        pre, rest = text.split(README_START, 1)
        _, post = rest.split(README_END, 1)
        open(path, "w").write(pre + block + post)
        print(f"[bench] README table regenerated ({path})", file=sys.stderr)
    except Exception:
        import traceback

        traceback.print_exc()


def main():
    import jax

    # persistent compilation cache: warmup is dominated by (remote) compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _wait_for_backend()

    records = []
    for kind, metric in (
        ("sd15", "sd15_512_richtext_e2e_images_per_min"),
        ("sdxl", "sdxl_1024_richtext_e2e_images_per_min"),
    ):
        try:
            turbo = _run(kind, exact=False)
            try:
                exact = _run(kind, exact=True)
            except Exception:
                import traceback

                traceback.print_exc()
                exact = None
            records.append(_emit(metric, kind, turbo, exact))
        except Exception:
            import traceback

            traceback.print_exc()
            FAILED.append(kind)
            records.append(_emit(metric, kind, (0.0, None), None))
    # Regenerate the README table only from real measurements: a relay
    # outage / failed run must not clobber the last published numbers with
    # 0.0 rows (the 0.0 record still goes to stdout for BENCH_r*.json).
    good = [r for r in records if r and r.get("value", 0.0) > 0.0]
    if len(good) == len(records):
        update_readme(good)
    else:
        print("[bench] skipping README regen (failed runs present)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
    sys.exit(1 if FAILED else 0)
