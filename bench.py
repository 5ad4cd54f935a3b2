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

def _emit(metric, img_per_min, baseline_key, mfu=None):
    rec = {
        "metric": metric,
        "value": round(img_per_min, 3),
        "unit": "images/min/chip",
        "vs_baseline": round(img_per_min / BASELINE_IMG_PER_MIN[baseline_key], 3),
    }
    if mfu is not None:
        rec["mfu"] = round(mfu, 4)
    print(json.dumps(rec))
    sys.stdout.flush()


def _e2e_flops(model, model_kind, steps):
    """Model FLOPs of the timed e2e run, for MFU attribution.

    Counts the two denoising scans' UNet rows and the two image decodes —
    the compute that dominates the run. Phases intentionally left out
    (text encode, capture aggregation einsums, spectral segmentation,
    resizes) are bandwidth-light, so the reported MFU is a slight
    UNDERestimate. Row structure per step (pipelines/region_sd.py /
    region_sdxl.py): plain pass = one B=2 CFG forward; rich pass = one
    [uncond, base, spans] (R+2)-row forward (refer-trajectory precompute
    keeps refer rows out of the rich scan even with injection on).
    """
    from rich_text_to_image_tpu.pipelines.base import encoder_key_gates
    from rich_text_to_image_tpu.utils.flops import (
        unet_encode_flops, unet_fwd_flops, vae_decode_flops,
    )

    xl = model_kind == "sdxl"
    R = max(len(model.masks) - 1, 1)  # span rows (masks = spans + bg)
    f_plain = unet_fwd_flops(model, 2, xl)
    # Both benches' rich scans run one [uncond, base/spans] (R+2)-row launch
    # per step. SDXL additionally sets inject 0.2 / bg 0.3, but with the
    # refer-trajectory precompute (run_sample default) the plain pass doubles
    # as the refer trajectory, so no refer rows appear anywhere
    # (pipelines/region_sdxl.py:_rich_fn_refpre; region_sd.py:_rich_fn else
    # branch for the injection-free SD workload). Both benches also run
    # encoder reuse stride 2 'early' (eval-gated, see _run), so MFU counts
    # EXECUTED FLOPs: the down path is skipped on non-key steps.
    f_full = unet_fwd_flops(model, R + 2, xl)
    f_enc = unet_encode_flops(model, R + 2, xl)
    n_key = int(encoder_key_gates(steps, 2, "early").sum())
    f_rich = n_key * f_full + (steps - n_key) * (f_full - f_enc)
    return steps * f_plain + f_rich + 2 * vae_decode_flops(model)


def _run(model_kind):
    """Build the model, warm up (compile), and time one e2e rich-text sample."""
    from rich_text_to_image_tpu.cli.sample import (
        build_model, make_parser, run_sample,
    )

    if model_kind == "sd15":
        # --encoder_reuse 2 'early' on the rich pass is the one non-exact
        # knob (same eval gate as the XL bench — the gate itself drives this
        # SD pipeline: tests/test_color_fixture.py::
        # test_encoder_reuse_preserves_steering). The plain/capture pass
        # stays exact, so token maps and the refer trajectory are untouched.
        # On-chip A/B at the driver workload: exact 20.77 img/min vs er2
        # 23.36 under identical host load (scripts/bench_sd_er2.py).
        argv = ["--model", "SD", "--random_weights", "--sample_steps", "50",
                "--encoder_reuse", "2", "--encoder_schedule", "early",
                "--run_dir", "/tmp/bench_out"]
        height = width = 512
    else:
        # Two non-exact knobs in the bench config, both eval-gated on the
        # trained color fixture (tests/test_color_fixture.py) and A/B'd
        # on-chip (artifacts/round4_perf/bench_xl_refpre.jsonl):
        #   --encoder_reuse 2 'early' — steering margin preserved,
        #     region-color distance within 0.05 of exact; exact refpre
        #     3.91 img/min vs 4.31 with reuse.
        #   --bf16_vae — the image decode runs the VAE in bf16 (fp32 range;
        #     the reference's efficient variant itself casts the VAE down,
        #     region_diffusion_sdxl_efficient.py:850-855); gate: bf16
        #     tracks fp32 pixels at mean 0.0016 / max 0.0093 in [0,1] RGB
        #     (sub-uint8-step) on the trained decoder; 4.31 → 4.41 img/min.
        # Everything else (refer-trajectory precompute) is output-exact.
        argv = ["--model", "SDXL", "--random_weights", "--sample_steps", "50",
                "--inject_selfattn", "0.2", "--inject_background", "0.3",
                "--encoder_reuse", "2", "--encoder_schedule", "early",
                "--bf16_vae",
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

    # timed end-to-end runs (all programs cached): best of 3.  The TPU
    # relay's per-dispatch host latency varies with host load; a single
    # timed run has been observed ±15% on a loaded host while min-of-3 is
    # stable (the chip-side work is deterministic).
    times = []
    for _ in range(3):
        t0 = time.time()
        run_sample(model, args, param, save=False)
        times.append(time.time() - t0)
    dt = min(times)
    print(f"[bench:{model_kind}] timed e2e: {dt:.2f}s "
          f"(min of {[round(t, 2) for t in times]})", file=sys.stderr)

    mfu = None
    try:
        from rich_text_to_image_tpu.utils.flops import peak_flops

        flops = _e2e_flops(model, model_kind, steps=50)
        peak, kind = peak_flops()
        mfu = flops / dt / peak
        print(f"[bench:{model_kind}] model flops {flops/1e12:.1f} TF, "
              f"chip '{kind}' peak {peak/1e12:.0f} TF/s -> MFU {mfu:.3f}",
              file=sys.stderr)
    except Exception:
        import traceback

        traceback.print_exc()
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


def main():
    import jax

    # persistent compilation cache: warmup is dominated by (remote) compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _wait_for_backend()

    for kind, metric in (
        ("sd15", "sd15_512_richtext_e2e_images_per_min"),
        ("sdxl", "sdxl_1024_richtext_e2e_images_per_min"),
    ):
        try:
            rate, mfu = _run(kind)
            _emit(metric, rate, kind, mfu=mfu)
        except Exception:
            import traceback

            traceback.print_exc()
            FAILED.append(kind)
            _emit(metric, 0.0, kind)


if __name__ == "__main__":
    main()
    sys.exit(1 if FAILED else 0)
