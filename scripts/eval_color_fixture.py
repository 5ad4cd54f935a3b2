"""Color-guidance eval gate on the TRAINED fixture (VERDICT r3 #1/#2).

Runs the color-benchmark protocol (reference evaluation/benchmark_color.py:
283-331 knobs: 41 steps, CFG 8.5, inject 0.2/0.3, guidance weight 1) against
the trained tiny fixture — where decode(latent) color is real — in four
configs:

  plain     (comes free from every run: the no-guidance base image)
  exact     fp32 full-resolution guidance gradient (reference math)
  gds2      --guidance_downsample 2 (pooled x0 before the guidance decode)
  bf16      --bf16_guidance

and additionally measures the per-step gradient cosine(exact, pooled) on the
trained decoder, replacing round 3's uninterpretable random-VAE number
(artifacts/round3_perf/guidance_downsample_eval/tiny_cpu_smoke.jsonl,
cos 0.12-0.38).

Outputs: artifacts/round4_perf/fixture_eval/{summary_exact,summary_gds2,
summary_bf16}.json + grad_cosine.jsonl + verdict.json.

CPU-only (tiny shapes; the chip stays free for throughput runs).
"""

import json
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

# the axon plugin (sitecustomize) overrides jax_platforms at registration —
# drop its factory and force CPU, else this script CLAIMS the TPU and the
# token mapper picks the on-chip solver path (tests/conftest.py:26-35)
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

from rich_text_to_image_tpu.evaluation import benchmark_color
from rich_text_to_image_tpu.evaluation.fixtures import load_color_fixture

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "round4_perf", "fixture_eval")


def grad_cosines(model, n=12, seed=0):
    """cos(exact grad, pooled-2x grad) of the guidance loss on the trained
    decoder, at random latents/targets/masks (the quantity the gds2 knob
    approximates; reference loss: region_diffusion.py:151-168)."""
    vae, vp = model.vae, model.vae_params
    h = model.unet_cfg.sample_size
    px = h * model.vae_scale_factor

    def loss(lat, mask_px, target, pool):
        if pool > 1:
            lat = jax.lax.reduce_window(
                lat, 0.0, jax.lax.add, (1, pool, pool, 1),
                (1, pool, pool, 1), "VALID") / (pool * pool)
            mask_px = mask_px[:, ::pool, ::pool]
        img = vae.apply(vp, lat / model.vae_cfg.scaling_factor,
                        method=vae.decode)
        img = (img.clip(-1, 1) + 1) / 2
        w = mask_px[..., None]
        avg = (img * w).sum((1, 2)) / w.sum((1, 2))
        return 100.0 * jnp.mean((avg - target) ** 2)

    rows = []
    key = jax.random.PRNGKey(seed)
    for i in range(n):
        key, k1, k2, k3 = jax.random.split(key, 4)
        lat = jax.random.normal(k1, (1, h, h, 4))
        target = jax.random.uniform(k2, (1, 3))
        m = (jax.random.uniform(k3, (1, px // 4, px // 4)) > 0.5)
        mask = jnp.repeat(jnp.repeat(m.astype(jnp.float32), 4, 1), 4, 2)
        g_exact = jax.grad(loss)(lat, mask, target, 1)
        g_pool = jax.grad(loss)(lat, mask, target, 2)
        cos = float((g_exact * g_pool).sum() /
                    (jnp.linalg.norm(g_exact) * jnp.linalg.norm(g_pool)
                     + 1e-12))
        rows.append({"i": i, "cos_exact_vs_gds2": round(cos, 4)})
    return rows


def main():
    os.makedirs(OUT, exist_ok=True)
    model = load_color_fixture(agg_start_step=3)

    # --- gradient cosine on the trained decoder
    rows = grad_cosines(model)
    with open(os.path.join(OUT, "grad_cosine.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cosines = [r["cos_exact_vs_gds2"] for r in rows]
    print(f"[grad] cos(exact, gds2) on trained decoder: "
          f"min={min(cosines):.3f} mean={np.mean(cosines):.3f}")

    # --- benchmark protocol, three guidance configs
    summaries = {}
    for name, extra in (
        ("exact", []),
        ("gds2", ["--guidance_downsample", "2"]),
        ("bf16", ["--bf16_guidance"]),
    ):
        args = benchmark_color.make_parser().parse_args([
            "--limit", "6", "--num_seeds", "2", "--steps", "41",
            "--save_path", os.path.join(OUT, f"run_{name}"),
        ] + extra)
        s = benchmark_color.run(args, model=model)
        summaries[name] = s
        with open(os.path.join(OUT, f"summary_{name}.json"), "w") as f:
            json.dump(s, f, indent=2)
        print(f"[{name}] plain_min={s['plain_min']['mean']:.4f} "
              f"ours_min={s['ours_min']['mean']:.4f} "
              f"plain_avg={s['plain_avg']['mean']:.4f} "
              f"ours_avg={s['ours_avg']['mean']:.4f}")

    ex = summaries["exact"]
    verdict = {
        "steering_real": ex["ours_min"]["mean"] < ex["plain_min"]["mean"],
        "plain_min": ex["plain_min"]["mean"],
        "exact_ours_min": ex["ours_min"]["mean"],
        "gds2_ours_min": summaries["gds2"]["ours_min"]["mean"],
        "bf16_ours_min": summaries["bf16"]["ours_min"]["mean"],
        "grad_cos_exact_vs_gds2_min": min(cosines),
        "grad_cos_exact_vs_gds2_mean": round(float(np.mean(cosines)), 4),
        "protocol": "41 steps, CFG 8.5, inject 0.2/0.3, weight 1, "
                    "limit 6 x 2 seeds, trained fixture",
    }
    with open(os.path.join(OUT, "verdict.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
