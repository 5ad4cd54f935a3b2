"""Microbench: SDXL VAE decode at 1024² under different precision policies.

The reference decodes the XL VAE in fp32 (region_diffusion_sdxl.py:916-917 —
a workaround for fp16 overflow). On TPU, fp32 convs run on the MXU as
multi-pass bf16 products; the pass count is set by the precision config, so
"fp32 decode" spans a 1x-6x cost range for (near-)identical numerics:

  * default   — whatever jax's Precision.DEFAULT resolves to on TPU
  * highest   — bf16x6 passes (full fp32-equivalent)
  * tf32/3x   — jax.default_matmul_precision('tensorfloat32') → bf16x3
  * bf16x1    — jax.default_matmul_precision('bfloat16') (fp32 storage,
                1-pass bf16 MXU compute, fp32 accumulate)
  * bf16 dtype — whole decoder in bf16 storage (the opt-in --bf16_vae path)

Also reports max|Δ| of the decoded image vs the 'highest' run (uint8-scale,
i.e. ×127.5) so the numerics cost of each speed tier is visible.

Usage: python scripts/bench_vae_decode.py [iters]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(iters=5):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

    model = RegionDiffusionXL.random_init(seed=0)
    vae, params = model.vae, model.vae_params
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 128, 128, 4), jnp.float32)

    def run_case(tag, precision_ctx, dtype=None):
        v = vae
        p = params
        if dtype is not None:
            v = type(vae)(vae.cfg, dtype=dtype)
            p = jax.tree.map(lambda x: x.astype(dtype), params)

        @jax.jit
        def dec(p, z):
            with precision_ctx() if precision_ctx else _null():
                img = v.apply(p, z / v.cfg.scaling_factor,
                              method=type(v).decode)
            return jnp.clip(img.astype(jnp.float32), -1, 1)

        img = jax.device_get(dec(p, z))  # compile+warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            out = jax.device_get(dec(p, z))
            best = min(best, time.time() - t0)
        return best, np.asarray(out, np.float64), img

    import contextlib

    @contextlib.contextmanager
    def _null():
        yield

    cases = [
        ("fp32_highest",
         lambda: jax.default_matmul_precision("float32"), None),
        ("fp32_default", None, None),
        ("fp32_tf32_3x",
         lambda: jax.default_matmul_precision("tensorfloat32"), None),
        ("fp32_bf16_1x",
         lambda: jax.default_matmul_precision("bfloat16"), None),
        ("bf16_dtype", None, jnp.bfloat16),
    ]
    ref = None
    for tag, ctx, dtype in cases:
        dt, out, _ = run_case(tag, ctx, dtype)
        if tag == "fp32_highest":
            ref = out
        rec = {"case": tag, "s": round(dt, 4)}
        if ref is not None:
            rec["max_abs_diff_u8"] = round(
                float(np.abs(out - ref).max()) * 127.5, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
