"""Calibrate achievable MXU TFLOP/s on this chip with pure matmuls.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_matmul_peak.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

CASES = [
    # (M, K, N)
    (4096, 4096, 4096),
    (8192, 8192, 8192),
    (4096, 128, 4096),   # QK-shaped (lane-padded D)
    (4096, 40, 4096),    # QK-shaped (true D — XLA pads)
    (256, 128, 4096),    # one q-tile QK
    (4096, 4096, 128),   # PV-shaped
]


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    rng = np.random.default_rng(0)
    for (M, K, N) in CASES:
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        fl = 2 * M * K * N
        reps = max(8, int(3e11 / fl))

        @jax.jit
        def loop(a, b):
            def body(i, acc):
                o = jnp.dot(acc, b, preferred_element_type=jnp.float32)
                return (a + 0.0001 * o[:, :K].astype(a.dtype)
                        if N >= K else
                        (a + 0.0001 * jnp.pad(o, ((0, 0), (0, K - N))).astype(a.dtype)))
            return jax.lax.fori_loop(0, reps, body, a)

        out = loop(a, b)
        jax.device_get(out.reshape(-1)[0])
        t0 = time.time()
        out = loop(a, b)
        jax.device_get(out.reshape(-1)[0])
        dt = time.time() - t0
        print(json.dumps({"mkn": [M, K, N],
                          "tflops": round(fl * reps / dt / 1e12, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
