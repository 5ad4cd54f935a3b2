"""Compare self-attention implementations on the real chip at UNet shapes.

Timing methodology: the TPU relay adds a large FIXED per-dispatch latency
(~20-45 ms), so single-dispatch timing is meaningless. Each candidate is
compiled as an in-graph fori_loop of R repetitions; we time R and 4R and
report the slope (t4 - t1) / (3R) — fixed overhead cancels.

Candidates:
  * ours      — ops/attention.py flash_attention (auto path selection)
  * online    — flash_attention forced onto the online-softmax path
  * xla       — einsum → softmax → einsum

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_attn_landscape.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rich_text_to_image_tpu.ops.attention import flash_attention

SHAPES = [
    # (B, H, S, D) — actual SD-1.5 CFG-batch shapes
    (2, 8, 4096, 40),
    (2, 8, 1024, 80),
    (2, 8, 256, 160),
    # SDXL 1024² levels
    (2, 10, 4096, 64),
    (2, 20, 1024, 64),
    # rich pass: batched regions (2+N with N=2) → B=4
    (4, 8, 4096, 40),
]


def xla_attn(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


def time_reps(fn, q, reps):
    @jax.jit
    def loop(q, n):
        def body(i, acc):
            o = fn(acc, acc, acc)
            return (acc + 0.001 * o).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    def run(n):
        out = loop(q, n)
        jax.device_get(out.reshape(-1)[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = loop(q, n)
            jax.device_get(out.reshape(-1)[0])
            best = min(best, time.time() - t0)
        return best

    t1 = run(reps)
    t4 = run(4 * reps)
    return (t4 - t1) / (3 * reps)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    rng = np.random.default_rng(0)
    for (B, H, S, D) in SHAPES:
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        fl = 4 * B * H * S * S * D
        reps = max(8, int(3e11 / fl))
        scale = D ** -0.5
        cands = {
            "ours": lambda a, b, c: flash_attention(a, b, c, scale),
            "online": lambda a, b, c: flash_attention(
                a, b, c, scale, block_q=512 if D <= 48 else 2048),
            "xla": lambda a, b, c: xla_attn(a, b, c, scale),
        }
        for name, fn in cands.items():
            try:
                dt = time_reps(fn, q, reps)
            except Exception as e:
                print(json.dumps({"shape": [B, H, S, D], "impl": name,
                                  "error": f"{type(e).__name__}: {e}"[:120]}),
                      flush=True)
                continue
            print(json.dumps({"shape": [B, H, S, D], "impl": name,
                              "us": round(dt * 1e6, 1),
                              "tflops": round(fl / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
