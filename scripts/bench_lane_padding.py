"""On-chip A/B of the transposed full-row attention kernel (VERDICT r4 #7).

Three measurement families, one JSON line each, appended to
artifacts/round5_perf/lane_padding.jsonl:

  1. raw lane curve — bf16 matmul [4096,K]@[K,4096] useful TF/s for
     K ∈ {40, 48, 64, 128, 256}: the empirical contraction-dim padding
     law the ceiling argument in ARCHITECTURE.md rests on.
  2. pv orientation — the P@V product both ways at the SD shape:
     classic [S,S]@[S,40] (output lanes 40/128 live) vs transposed
     [40,S]@[S,S] (contraction full, 40 streamed MXU rows). This isolates
     the one matmul the transposed kernel fixes.
  3. kernel A/B — flash_attention classic vs transposed (both forced
     via the _fullrow knob) at every production self-attention shape of
     SD-1.5 (D=40/80/160) and SDXL (D=64), plain CFG and rich-pass batch.

Timing: in-graph fori_loop slope (t_{4R} - t_R)/(3R) — the relay's fixed
dispatch latency cancels (same methodology as bench_attn_landscape.py; the
relay only syncs on device_get).

Useful-FLOPs convention: 4·B·H·S·S·D for attention (QK + PV MACs·2),
2·M·N·K for raw matmuls — signal FLOPs, zero-padding excluded, matching
the flash-kernel rows in ARCHITECTURE.md.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_lane_padding.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rich_text_to_image_tpu.ops.attention import flash_attention

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "round5_perf", "lane_padding.jsonl")

ATTN_SHAPES = [
    # (B, H, S, D): SD-1.5 plain CFG at 512² (3 resolutions) ...
    (2, 8, 4096, 40),
    (2, 8, 1024, 80),
    (2, 8, 256, 160),
    # ... SD rich pass [uncond, base, 2 spans] ...
    (4, 8, 4096, 40),
    (4, 8, 1024, 80),   # rich-pass shape of the transposed-kernel win bucket
    (2, 8, 2048, 80),   # d=80 just past the S≤1024 dispatch boundary
    # ... SDXL 1024² levels, plain + rich
    (2, 10, 4096, 64),
    (2, 20, 1024, 64),
    (4, 10, 4096, 64),
]


def time_reps(loop, q, reps):
    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = loop(q, n)
            jax.device_get(out.reshape(-1)[0])
            best = min(best, time.time() - t0)
        return best

    loop(q, reps)  # compile
    jax.device_get(loop(q, reps).reshape(-1)[0])
    t1 = run(reps)
    t4 = run(4 * reps)
    return (t4 - t1) / (3 * reps)


def loop_of(fn, takes_i=False):
    @jax.jit
    def loop(q, n):
        def body(i, acc):
            o = fn(acc, i) if takes_i else fn(acc)
            return (acc + 0.001 * o.reshape(acc.shape)).astype(acc.dtype)
        return jax.lax.fori_loop(0, n, body, q)
    return loop


def emit(f, rec):
    print(json.dumps(rec), flush=True)
    f.write(json.dumps(rec) + "\n")
    f.flush()


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    rng = np.random.default_rng(0)
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    f = open(OUT, "a")

    # --- 1. raw contraction-dim lane curve -------------------------------
    # Loop carry is the [M,K] lhs; the body's only matmul contracts over K.
    # The serializing dependency is a DYNAMIC [M,K] slice of the [M,N]
    # output at a loop-varying column — a static slice would let XLA narrow
    # the dot to K output columns and time the wrong matmul (first version
    # of this script measured >peak "1392 TF/s" exactly that way).
    M = N = 4096
    for K in (40, 48, 64, 128, 256):
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        bmat = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

        def mm(x, i, bmat=bmat, K=K):
            o = jax.lax.dot_general(
                x, bmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            c = (i * 997) % (N - K)
            return jax.lax.dynamic_slice(o, (0, c), (M, K))

        loop = loop_of(mm, takes_i=True)
        fl = 2 * M * N * K
        # reps sized so reps·t ≳ 100 ms — the relay's ms-scale dispatch
        # jitter must be small against the measured interval.
        dt = time_reps(loop, a, max(256, int(6e12 / fl)))
        emit(f, {"family": "raw_lane_curve", "mnk": [M, N, K],
                 "us": round(dt * 1e6, 2),
                 "useful_tflops_s": round(fl / dt / 1e12, 1)})

    # --- 2. PV orientation at the SD shape --------------------------------
    # Carry is the [S,S] probs matrix; dependency is a dynamic one-column /
    # one-row slice of the product (static would narrow the dot to a matvec).
    S, D = 4096, 40
    p = jnp.asarray(rng.standard_normal((S, S)), jnp.bfloat16)
    fl = 2 * S * S * D
    reps_pv = max(256, int(6e12 / fl))

    v_cl = jnp.asarray(rng.standard_normal((S, 128)), jnp.bfloat16)  # padded

    def pv_classic(x, i):
        o = jax.lax.dot_general(x, v_cl, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.dynamic_slice(o, (0, i % 128), (S, 1))
        return x + 0.001 * col.astype(x.dtype)

    dt = time_reps(loop_of(pv_classic, takes_i=True), p, reps_pv)
    emit(f, {"family": "pv_orientation", "variant": "classic_padded_128",
             "us": round(dt * 1e6, 2),
             "useful_tflops_s": round(fl / dt / 1e12, 1),
             "shape": [S, S, D]})

    vt = jnp.asarray(rng.standard_normal((48, S)), jnp.bfloat16)  # dt=48

    def pv_transposed(x, i):
        o = jax.lax.dot_general(vt, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row = jax.lax.dynamic_slice(o, (i % 48, 0), (1, S))
        return x + 0.001 * row.astype(x.dtype)

    dt = time_reps(loop_of(pv_transposed, takes_i=True), p, reps_pv)
    emit(f, {"family": "pv_orientation", "variant": "transposed_dt48",
             "us": round(dt * 1e6, 2),
             "useful_tflops_s": round(fl / dt / 1e12, 1),
             "shape": [S, S, D]})

    # --- 3. kernel A/B at production shapes -------------------------------
    for (B, H, S, D) in ATTN_SHAPES:
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        fl = 4 * B * H * S * S * D
        reps = max(8, int(3e11 / fl))
        scale = D ** -0.5
        for name in ("classic", "transposed"):
            loop = loop_of(lambda x, name=name: flash_attention(
                x, x, x, scale, _fullrow=name))
            try:
                dt = time_reps(loop, q, reps)
            except Exception as e:  # pragma: no cover - mosaic compile fail
                emit(f, {"family": "kernel_ab", "shape": [B, H, S, D],
                         "impl": name,
                         "error": f"{type(e).__name__}: {e}"[:160]})
                continue
            emit(f, {"family": "kernel_ab", "shape": [B, H, S, D],
                     "impl": name, "us": round(dt * 1e6, 1),
                     "useful_tflops_s": round(fl / dt / 1e12, 1)})

    f.close()
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
