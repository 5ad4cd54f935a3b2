"""Segmentation backend decision: CPU-eigh vs TPU-subspace, real sizes.

Times spectral_cluster on a 1024x1024 row-stochastic affinity (the real
segmentation input) with n_init=100 (reference protocol): compile (first
call) and warm times for each (device, method) combination available.

Usage: python scripts/bench_spectral.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rich_text_to_image_tpu.ops.spectral import spectral_cluster


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    rng = np.random.RandomState(0)
    n, k = 1024, 9
    A = rng.rand(n, n).astype(np.float32) * 0.05
    for s in range(0, n, 128):
        A[s:s + 128, s:s + 128] += 1.0
    A = A / A.sum(-1, keepdims=True) * 32

    combos = [("cpu", "eigh"), ("cpu", "subspace")]
    if jax.default_backend() == "tpu":
        combos += [(None, "subspace")]

    labels = {}
    for device, method in combos:
        name = f"{device or jax.default_backend()}_{method}"
        t0 = time.time()
        out = spectral_cluster(jax.random.PRNGKey(0), jnp.asarray(A), k,
                               n_init=100, device=device, method=method)
        l = np.asarray(out)
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            l = np.asarray(spectral_cluster(
                jax.random.PRNGKey(0), jnp.asarray(A), k, n_init=100,
                device=device, method=method))
        warm_s = (time.time() - t0) / reps
        labels[name] = l
        print(json.dumps({"combo": name,
                          "first_s": round(compile_s, 3),
                          "warm_s": round(warm_s, 3)}), flush=True)

    base = labels.get("cpu_eigh")
    for name, l in labels.items():
        same = (l[:, None] == l[None, :])
        sb = (base[:, None] == base[None, :])
        ri = float((same == sb).mean())
        print(json.dumps({"combo": name, "rand_vs_cpu_eigh": round(ri, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
