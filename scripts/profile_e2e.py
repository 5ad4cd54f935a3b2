"""Phase breakdown of the SD-1.5 rich-text e2e flow on the real chip.

Times each phase of the CLI sample flow separately (relay-safe sync between
phases): text encode, plain scan, host aggregate fetch, segmentation
(two get_token_maps calls), rich scan, VAE decodes. Prints one JSON line
per phase plus the total — the data behind e2e optimization decisions.

Usage: python scripts/profile_e2e.py [steps]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(steps=50):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
    from rich_text_to_image_tpu.utils.token_maps import get_token_maps
    from rich_text_to_image_tpu.utils.tracing import phase, phase_report

    model = RegionDiffusion.random_init(seed=0)
    h = model.unet_cfg.sample_size
    px = h * model.vae_scale_factor
    base = "a close-up photo of a cat riding a scooter"
    regions = ["a cat wearing sunglasses", base]
    rng = np.random.RandomState(0)

    def one_pass(report=False):
        with phase("plain_pass+decode"):
            img, agg = model.produce_attn_maps(
                [base], [""], height=px, width=px,
                num_inference_steps=steps, guidance_scale=8.5, seed=6,
            )
        with phase("token_maps_x2"):
            ids = [np.asarray([2, 3], np.int32)]
            m1 = get_token_maps(agg, ids, (h, h), 6, num_segments=9)
            m2 = get_token_maps(agg, ids, (h, h), 6, num_segments=9)
        model.masks = [m2[0], m2[-1]]
        with phase("rich_pass+decode"):
            model.prompt_to_img(
                regions, [""], height=px, width=px,
                num_inference_steps=steps, guidance_scale=8.5, seed=6,
            )
        if report:
            rep = phase_report()
            total = sum(rep.values())
            for k, v in rep.items():
                print(json.dumps({"phase": k, "s": round(v, 3),
                                  "pct": round(100 * v / total, 1)}),
                      flush=True)
            print(json.dumps({"phase": "TOTAL", "s": round(total, 3),
                              "img_per_min": round(60 / total, 2)}),
                  flush=True)

    one_pass()  # warmup/compile
    phase_report()  # drop warmup numbers
    one_pass(report=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
