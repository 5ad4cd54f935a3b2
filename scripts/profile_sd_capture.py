"""SD-1.5 plain-pass capture-cost attribution on the real chip (VERDICT r3 #6).

The round-3 profile shows the SD plain pass at ~11 ms/row vs the rich pass's
~7.5 ms/row; this isolates how much of that delta is the token-map capture
(cross-prob head-avg + aggregation, steps >= agg_start, plus the last-step
self-prob capture) vs the B=2-vs-B=4 batch-efficiency gap, by timing the
same 50-step plain scan with the aggregation window narrowed to the final
step only (agg_start = num_steps ⇒ every prior step takes the capture-free
lax.switch branch).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/profile_sd_capture.py [steps]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main(steps=50):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
    from rich_text_to_image_tpu.utils.flops import peak_flops, unet_fwd_flops

    model = RegionDiffusion.random_init(seed=0)
    h = model.unet_cfg.sample_size
    px = h * model.vae_scale_factor
    base = "a close-up photo of a cat riding a scooter"
    peak, kind = peak_flops()
    f2 = unet_fwd_flops(model, 2, xl=False)

    def timed_plain(tag, agg_start):
        model.agg_start_step = agg_start
        model._jit_cache.clear()
        model.produce_attn_maps([base], [""], height=px, width=px,
                                num_inference_steps=steps,
                                guidance_scale=8.5, seed=6)  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            model.produce_attn_maps([base], [""], height=px, width=px,
                                    num_inference_steps=steps,
                                    guidance_scale=8.5, seed=6)
            best = min(best, time.time() - t0)
        fl = steps * f2
        print(json.dumps({
            "what": tag, "s": round(best, 3),
            "ms_per_step": round(best / steps * 1e3, 2),
            "mfu_unet_only": round(fl / best / peak, 3),
        }), flush=True)
        return best

    t_cap = timed_plain(f"plain_{steps}step_capture_default(agg10)", 10)
    t_min = timed_plain(f"plain_{steps}step_capture_laststep_only", steps)
    print(json.dumps({
        "what": "capture_aggregation_cost",
        "s_total": round(t_cap - t_min, 3),
        "ms_per_captured_step": round((t_cap - t_min) / (steps - 10) * 1e3, 2),
        "note": "delta of the two runs above: cross-prob head-avg + "
                "aggregation over the ~40 aggregated steps (+decode/fetch "
                "constant cancels); remaining plain-vs-rich per-row gap "
                "is B=2 batch efficiency (see bench_unet_step.jsonl)",
        "chip": kind,
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
