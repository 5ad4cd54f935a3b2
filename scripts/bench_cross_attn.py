"""On-chip microbench: XLA fused cross-attention vs Pallas full-row kernel
at the UNet's cross-attention shapes (KV = 77 text tokens).

Motivation: the XLA path materializes the [B,H,S,77] fp32 score tensor in
HBM (scores write + softmax read/write + PV read); the full-row kernel keeps
the row in VMEM. Relay timing: in-graph fori_loop slope (t4R - t1R)/(3R),
fixed dispatch overhead cancels (same method as bench_attn_landscape.py).

Usage: PYTHONPATH=. python scripts/bench_cross_attn.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rich_text_to_image_tpu.ops.attention import cross_attention, flash_attention

SHAPES = [
    # (B, H, S, D) — SD-1.5 rich rows @512² (region batch B=6)
    (6, 8, 4096, 40),
    (6, 8, 1024, 80),
    (6, 8, 256, 160),
    # SDXL rich rows @1024²
    (4, 10, 4096, 64),
    (4, 20, 1024, 64),
    # plain CFG pair
    (2, 8, 4096, 40),
]


def time_reps(fn, q, k, v, reps):
    @jax.jit
    def loop(q, k, v, n):
        def body(i, acc):
            o = fn(acc, k, v)
            return (acc + 0.001 * o).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    def run(n):
        best = float("inf")
        loop(q, k, v, n)
        for _ in range(3):
            t0 = time.time()
            out = loop(q, k, v, n)
            jax.device_get(out.reshape(-1)[0])
            best = min(best, time.time() - t0)
        return best

    t1 = run(reps)
    t4 = run(4 * reps)
    return (t4 - t1) / (3 * reps)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    rng = np.random.default_rng(0)
    for b, h, s, d in SHAPES:
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, 77, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, 77, d)), jnp.bfloat16)
        sc = d ** -0.5
        reps = 50
        for name, fn in {
            "xla": lambda a, kk, vv: cross_attention(a, kk, vv, sc),
            "flash": lambda a, kk, vv: flash_attention(a, kk, vv, sc),
        }.items():
            dt = time_reps(fn, q, k, v, reps)
            print(json.dumps({"shape": [b, h, s, d], "impl": name,
                              "us": round(dt * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
