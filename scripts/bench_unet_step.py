"""UNet step-time breakdown on the real chip.

Measures the full SD-1.5 CFG UNet forward (B=2/B=4) with amortized in-graph
repetition (fori_loop feeding eps back into the latents — serial), plus
ablations: attention-free (controls=None vs capture) isn't separable without
code changes, so instead this times the three big families separately at
UNet shapes: conv stack (microbench, see bench_conv.py), attention
(ops/attention.py), and GroupNorm+silu elementwise chains.

Usage: PYTHONPATH=. python scripts/bench_unet_step.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps_hint=1):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")

    from rich_text_to_image_tpu.models import config as cfgs
    from rich_text_to_image_tpu.models.init_utils import fast_init
    from rich_text_to_image_tpu.models.unet import UNet2DCondition

    cfg = cfgs.SD15_UNET
    unet = UNet2DCondition(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ehs2 = jnp.asarray(rng.standard_normal((2, 77, cfg.cross_attention_dim)),
                       jnp.bfloat16)
    lat = jnp.asarray(rng.standard_normal((1, 64, 64, 4)), jnp.bfloat16)
    params = fast_init(unet, 0, lat, jnp.int32(0), ehs2[:1],
                       dtype=jnp.bfloat16)
    print("init done", file=sys.stderr)

    # SD-1.5 UNet ≈ 339 GFLOP per image-forward at 512² (standard figure)
    GF_PER_ROW = 339e9

    for B, reps in ((2, 40), (4, 24), (8, 12)):
        ehs = jnp.tile(ehs2[:1], (B, 1, 1))
        x0 = jnp.tile(lat, (B, 1, 1, 1))

        @jax.jit
        def step_loop(params, x, ehs):
            def body(i, acc):
                eps, _ = unet.apply(params, acc, jnp.int32(500), ehs)
                return (acc + 0.001 * eps).astype(acc.dtype)
            return jax.lax.fori_loop(0, reps, body, x)

        dt = timeit(step_loop, params, x0, ehs)
        ms = dt / reps * 1e3
        tf = GF_PER_ROW * B * reps / dt / 1e12
        print(json.dumps({"what": f"unet_forward_B{B}",
                          "ms_per_call": round(ms, 2),
                          "eff_tflops": round(tf, 1)}), flush=True)

    # elementwise family: GroupNorm+silu at the top-resolution activation
    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    act = jnp.asarray(rng.standard_normal((2, 64, 64, 320)), jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(0), act)
    R = 2000

    @jax.jit
    def gn_loop(gp, a):
        def body(i, acc):
            return nn.silu(gn.apply(gp, acc)).astype(acc.dtype)
        return jax.lax.fori_loop(0, R, body, a)

    dt = timeit(gn_loop, gp, act)
    bytes_per = act.size * 2 * 2  # read + write
    print(json.dumps({"what": "groupnorm_silu_2x64x64x320",
                      "us_per_call": round(dt / R * 1e6, 1),
                      "gb_per_s": round(bytes_per * R / dt / 1e9, 1)}),
          flush=True)

    # attention family at SD shapes (flash kernel)
    from rich_text_to_image_tpu.ops.attention import flash_attention

    for (Bh, S, D) in ((16, 4096, 40), (16, 1024, 80), (16, 256, 160)):
        q = jnp.asarray(rng.standard_normal((2, Bh, S, D)), jnp.bfloat16)
        Ra = max(10, int(2e11 / (4 * 2 * Bh * S * S * D)))

        @jax.jit
        def attn_loop(q):
            def body(i, acc):
                o = flash_attention(acc, acc, acc, D ** -0.5)
                return (acc + 0.001 * o).astype(acc.dtype)
            return jax.lax.fori_loop(0, Ra, body, q)

        dt = timeit(attn_loop, q)
        fl = 4 * 2 * Bh * S * S * D * Ra
        print(json.dumps({"what": f"self_attn_B2H{Bh}_S{S}_D{D}",
                          "us_per_call": round(dt / Ra * 1e6, 1),
                          "tflops": round(fl / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
