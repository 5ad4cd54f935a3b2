"""Microbenchmark: Pallas flat-offset conv3x3 vs XLA conv on UNet shapes.

Run on the real chip (claims the TPU). Timing: in-graph fori_loop repetition
(each iteration feeds the previous output back as input, forcing serial
execution), then a device_get of one scalar — block_until_ready does not
synchronize through the axon relay.

Usage: python scripts/bench_conv.py [--reps 20]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rich_text_to_image_tpu.ops.conv import conv3x3, conv3x3_supported

# (B, H, W, C) square convs from the SD-1.5 / SDXL UNet hot path
SHAPES = [
    (2, 64, 64, 320),    # SD plain pass, top level
    (4, 64, 64, 320),    # SD rich pass (R=2)
    (8, 64, 64, 320),    # batched mode
    (2, 32, 32, 640),
    (4, 32, 32, 640),
    (2, 16, 16, 1280),
    (2, 8, 8, 1280),
    (2, 128, 128, 320),  # SDXL 1024² top level
    (2, 64, 64, 640),    # SDXL mid level
]


def _timeit(fn, *args):
    out = fn(*args)
    jax.device_get(out.reshape(-1)[0])  # warm compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(out.reshape(-1)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=0, help="0 = auto (target ~1s compute per measurement)")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    results = []
    for (B, H, W, C) in SHAPES:
        O = C
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, C, O) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.randn(O) * 0.01, jnp.bfloat16)
        flops_call = 2 * B * H * W * C * O * 9
        # target ~1 s of compute at an assumed 60 TF/s so the ~30 ms relay
        # RTT vanishes in the noise
        reps = args.reps or max(20, int(1.0 * 60e12 / flops_call))
        flops = flops_call * reps

        @jax.jit
        def xla_fn(x, w, b):
            def body(_, acc):
                y = lax.conv_general_dilated(
                    acc, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b
                return y
            return lax.fori_loop(0, reps, body, x)

        @jax.jit
        def pallas_fn(x, w, b):
            def body(_, acc):
                return conv3x3(acc, w, b)
            return lax.fori_loop(0, reps, body, x)

        dt_x = _timeit(xla_fn, x, w, b)
        row = dict(shape=[B, H, W, C], xla_tflops=round(flops / dt_x / 1e12, 1))
        if conv3x3_supported(x.shape, w.shape):
            # correctness spot-check on-chip (bf16 tolerance)
            want = lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            got = conv3x3(x, w, b)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32))))
            dt_p = _timeit(pallas_fn, x, w, b)
            row.update(pallas_tflops=round(flops / dt_p / 1e12, 1),
                       max_err=round(err, 4),
                       speedup=round(dt_x / dt_p, 2))
        else:
            row.update(pallas_tflops=None)
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
