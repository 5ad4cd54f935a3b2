"""Sweep flash-attention block sizes on the real chip (serial-amortized).

Shapes: SD-1.5 self-attention at 64²/32²/16² (8 heads, D=40/80/160) and
SDXL at 32² (S=1024... SDXL 1024²: latent 128² → S=16384 at D=64 level 1).
Usage: PYTHONPATH=. python scripts/sweep_flash.py
"""

import itertools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rich_text_to_image_tpu.ops.attention import flash_attention

SHAPES = [
    # (B, H, S, D) — SD CFG batch 2
    (2, 8, 4096, 40),
    (2, 8, 1024, 80),
    (2, 8, 256, 160),
    # SDXL at 1024²: transformer levels at 64² (S=4096, D=64) and 32²
    (2, 10, 4096, 64),
    (2, 20, 1024, 64),
]

BLOCKS_Q = [256, 512, 1024, 2048, 4096]
BLOCKS_K = [512, 1024, 2048, 4096]


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    rng = np.random.default_rng(0)
    for (B, H, S, D) in SHAPES:
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        fl_call = 4 * B * H * S * S * D
        reps = max(10, int(3e11 / fl_call))
        best = None
        for bq, bk in itertools.product(BLOCKS_Q, BLOCKS_K):
            if bq > S or bk > S:
                continue

            @jax.jit
            def loop(q, bq=bq, bk=bk):
                def body(i, acc):
                    o = flash_attention(acc, acc, acc, None, bq, bk)
                    return (acc + 0.001 * o).astype(acc.dtype)
                return jax.lax.fori_loop(0, reps, body, q)

            try:
                out = loop(q)
                jax.device_get(out.reshape(-1)[0])
                t0 = time.time()
                out = loop(q)
                jax.device_get(out.reshape(-1)[0])
                dt = time.time() - t0
            except Exception as e:
                print(f"  bq={bq} bk={bk}: {type(e).__name__}",
                      file=sys.stderr)
                continue
            tf = fl_call * reps / dt / 1e12
            row = (round(tf, 1), bq, bk)
            if best is None or tf > best[0]:
                best = row
            print(json.dumps({"shape": [B, H, S, D], "bq": bq, "bk": bk,
                              "tflops": round(tf, 1)}), flush=True)
        print(json.dumps({"shape": [B, H, S, D], "BEST": best}), flush=True)


if __name__ == "__main__":
    main()
