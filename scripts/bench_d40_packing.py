"""D=40 lane-packing experiment: can block-diagonal head-packing beat the
per-head zero-pad for SD-1.5's QK^T / PV matmuls? (VERDICT r4 #7)

SD-1.5's checkpoint fixes head dim D=40; on a 128-lane MXU every per-head
matmul whose shared dimension is D runs at ≤ 40/128 = 31.25% of peak
useful throughput (the contraction — QK^T — or the output width — P@V —
carries only 40 live lanes). The one lever that raises the live-lane count
without changing the math is packing p heads block-diagonally:

  QK^T, p=2:  Q_pack = [S, 2D]  (two heads' Q concatenated on lanes)
              K_blk  = [2D, 2S] (block-diagonal: head h's K^T occupies
                                 rows hD:(h+1)D, cols hS:(h+1)S; zeros
                                 elsewhere)
              Q_pack @ K_blk = [S, 2S] — exact per-head logits side by
              side (the cross blocks multiply live Q lanes into ZERO K
              rows, adding 0).

Useful-lane density rises ×p, but machine MACs rise ×p too (the MXU
multiplies the structural zeros — v5e has no zero-skip), so the useful
throughput is ALGEBRAICALLY identical:

  per-head padded: p heads × (S·S·128_pad) machine MACs for p·S·S·40 useful
  p-packed:        S·(pS)·roundup(pD,128) machine MACs for the same useful
  → p=2: 2·S·S·128 vs S·2S·128 — equal. p=3: 3·S·S·128 vs S·3S·128 — equal.

This script measures both anyway (plus XLA's own unpadded einsum) so the
bound is EMPIRICAL, not just argued: if packing ever won, it would be via
second-order effects (fewer passes, better tiling), and if it loses, the
40/128 ceiling stands as the documented single-image bound for SD-1.5
attention on v5e (docs/ARCHITECTURE.md §"SD-1.5 MFU attribution").

Runs on the real chip; one JSON line per variant to stdout and
artifacts/round5_perf/d40_packing.jsonl. Useful TF/s convention: the
per-head MAC count 2·B·H·S·S·D (signal FLOPs), like the flash-kernel
numbers in ARCHITECTURE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "round5_perf", "d40_packing.jsonl")

B, H, S, D = 2, 8, 4096, 40  # SD-1.5 64²-resolution self-attention
REPS = 20


def _time(fn, *args):
    out = fn(*args)  # compile
    jax.device_get(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.device_get(out)  # the relay only syncs on device_get
    return (time.time() - t0) / REPS


def main():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B * H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B * H, S, D), jnp.bfloat16)
    useful_tf = 2 * B * H * S * S * D / 1e12

    recs = []

    # (a) XLA's own batched einsum at D=40 (it pads lanes internally)
    f_xla = jax.jit(lambda q, k: jnp.einsum(
        "bsd,btd->bst", q, k, preferred_element_type=jnp.float32))
    dt = _time(f_xla, q, k)
    recs.append({"variant": "xla_einsum_d40", "ms": round(dt * 1e3, 3),
                 "useful_tflops_s": round(useful_tf / dt, 1)})

    # (b) explicit zero-pad to 128 lanes (what the flash kernel does)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 128 - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 128 - D)))
    dt = _time(f_xla, qp, kp)
    recs.append({"variant": "padded_d128", "ms": round(dt * 1e3, 3),
                 "useful_tflops_s": round(useful_tf / dt, 1)})

    # (c) block-diagonal p=3 packing: 120 live lanes of 128. B*H=16 is not
    # divisible by 3, so the packed measurement runs on the first g*p=15
    # heads (per-head throughput is what's compared, so trimming one head
    # just scales the useful-FLOP numerator to match).
    p = 3
    g = B * H // p  # packed groups (heads beyond g*p trimmed)
    useful_tf_p = 2 * g * p * S * S * D / 1e12
    q3 = q[:g * p].reshape(g, p, S, D).transpose(0, 2, 1, 3) \
                  .reshape(g, S, p * D)
    # K_blk [g, pD, pS]: head h occupies rows hD:(h+1)D, cols hS:(h+1)S
    kt = k[:g * p].reshape(g, p, S, D).transpose(0, 1, 3, 2)  # [g, p, D, S]
    kblk = jnp.zeros((g, p * D, p * S), jnp.bfloat16)
    for h in range(p):
        kblk = kblk.at[:, h * D:(h + 1) * D, h * S:(h + 1) * S].set(kt[:, h])
    f_blk = jax.jit(lambda a, b: jnp.einsum(
        "gsd,gdt->gst", a, b, preferred_element_type=jnp.float32))
    dt = _time(f_blk, q3, kblk)
    recs.append({"variant": "blockdiag_p3_d120", "ms": round(dt * 1e3, 3),
                 "useful_tflops_s": round(useful_tf_p / dt, 1)})

    # (d) the upper reference point: a D=128 problem of the same useful
    # FLOPs run as a dense matmul (what SD would get if its head dim were
    # MXU-native) — the gap between (d) and (a/b/c) IS the lane tax
    q128 = jax.random.normal(rng, (B * H, S, 128), jnp.bfloat16)
    k128 = jax.random.normal(jax.random.PRNGKey(2), (B * H, S, 128),
                             jnp.bfloat16)
    dt = _time(f_xla, q128, k128)
    tf128 = 2 * B * H * S * S * 128 / 1e12
    recs.append({"variant": "dense_d128_reference",
                 "ms": round(dt * 1e3, 3),
                 "useful_tflops_s": round(tf128 / dt, 1)})

    meta = {"shape": [B, H, S, D], "reps": REPS,
            "useful_flops_convention": "2*B*H*S*S*D"}
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    with open(OUT, "a") as f:
        for r in recs:
            r.update(meta)
            print(json.dumps(r))
            f.write(json.dumps(r) + "\n")
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
