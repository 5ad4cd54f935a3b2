"""UNet step-time breakdown on the real chip (differential timing).

The TPU relay adds a large FIXED per-dispatch latency, so every measurement
here times an in-graph fori_loop at R and 4R reps and reports the slope —
fixed overhead cancels (see scripts/bench_attn_landscape.py).

Measures: full SD-1.5 CFG UNet forward at B=2/4/8; the three big compute
families at UNet shapes (attention via ops/attention.py, 3×3 convs via XLA,
GroupNorm+silu chains); and a no-attention UNet ablation to separate
attention from the conv/elementwise remainder.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_unet_step.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_slope(loop, args, r1):
    """loop(n, *args) jitted with static n; returns seconds per rep.

    NB: operands MUST be jit arguments, not closures — closed-over device
    arrays become baked-in XLA constants (pathological compile time for
    model params).
    """
    def run(n):
        out = loop(n, *args)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = loop(n, *args)
            jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
            best = min(best, time.time() - t0)
        return best

    t1 = run(r1)
    t4 = run(4 * r1)
    return (t4 - t1) / (3 * r1)


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

    # SD-1.5 UNet ≈ 339 GFLOP per image-forward at 512² (standard figure,
    # excludes the quadratic attention part)
    GF_PER_ROW = 339e9

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def unet_loop(n, params, x0, ehs):
        def body(i, acc):
            eps, _ = unet.apply(params, acc, jnp.int32(500), ehs)
            return (acc + 0.001 * eps).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, x0)

    for B, reps in ((2, 12), (4, 8), (8, 5)):
        ehs = jnp.tile(ehs2[:1], (B, 1, 1))
        x0 = jnp.tile(lat, (B, 1, 1, 1))
        dt = time_slope(unet_loop, (params, x0, ehs), reps)
        print(json.dumps({"what": f"unet_forward_B{B}",
                          "ms_per_call": round(dt * 1e3, 2),
                          "eff_tflops": round(GF_PER_ROW * B / dt / 1e12, 1)}),
              flush=True)

    # elementwise family: GroupNorm+silu at the top-resolution activation
    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    act = jnp.asarray(rng.standard_normal((2, 64, 64, 320)), jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(0), act)

    @partial(jax.jit, static_argnums=0)
    def gn_loop(n, gp, act):
        def body(i, acc):
            return nn.silu(gn.apply(gp, acc)).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, act)

    dt = time_slope(gn_loop, (gp, act), 500)
    bytes_per = act.size * 2 * 2  # read + write
    print(json.dumps({"what": "groupnorm_silu_2x64x64x320",
                      "us_per_call": round(dt * 1e6, 1),
                      "gb_per_s": round(bytes_per / dt / 1e9, 1)}),
          flush=True)

    # attention family at SD shapes (flash kernel, B=2 H=8 real shapes)
    from rich_text_to_image_tpu.ops.attention import flash_attention

    for (H, S, D) in ((8, 4096, 40), (8, 1024, 80), (8, 256, 160)):
        q = jnp.asarray(rng.standard_normal((2, H, S, D)), jnp.bfloat16)
        Ra = max(24, int(1e12 / (4 * 2 * H * S * S * D)))

        @partial(jax.jit, static_argnums=(0, 2))
        def attn_loop(n, q, D):
            def body(i, acc):
                o = flash_attention(acc, acc, acc, D ** -0.5)
                return (acc + 0.001 * o).astype(acc.dtype)
            return jax.lax.fori_loop(0, n, body, q)

        dt = time_slope(attn_loop, (q, D), Ra)
        fl = 4 * 2 * H * S * S * D
        print(json.dumps({"what": f"self_attn_B2H{H}_S{S}_D{D}",
                          "us_per_call": round(dt * 1e6, 1),
                          "tflops": round(fl / dt / 1e12, 1)}), flush=True)

    # conv family: the dominant 3×3 shapes (differential, XLA path)
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    @partial(jax.jit, static_argnums=0)
    def conv_loop(n, x, w):
        def body(i, acc):
            return (acc + 0.001 * conv(acc, w)).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    for (Hs, C, O) in ((64, 320, 320), (32, 640, 640), (16, 1280, 1280)):
        x = jnp.asarray(rng.standard_normal((2, Hs, Hs, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.02, jnp.bfloat16)
        fl = 2 * 2 * Hs * Hs * 9 * C * O
        Rc = max(16, int(5e11 / fl))
        dt = time_slope(conv_loop, (x, w), Rc)
        print(json.dumps({"what": f"conv3x3_B2_{Hs}x{Hs}x{C}->{O}",
                          "us_per_call": round(dt * 1e6, 1),
                          "tflops": round(fl / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
