"""Pallas 3×3 stride-1 convolution (NHWC) — EXPERIMENTAL, not integrated.

Motivation: XLA's conv on v5e is batch-bound (measured 33 TFLOP/s at the
UNet's CFG batch B=2 vs 64 at B=8) and convs dominate the UNet step. This
kernel keeps one (batch row × output-channel tile) fully VMEM-resident and
computes the conv as 9 shifted (H·W, C)×(C, O) MXU matmuls with fp32
accumulation.

Status (round 1 measurement, v5e): 21 TFLOP/s at B=2 64²×320 — numerically
correct (tested) but NOT faster than XLA; the VMEM-resident pad-copy and
per-tap reshape traffic eat the win. A halo-strip pipelined variant (DMA'd
input strips, fused tap accumulation in registers) is the round-2 path; the
UNet keeps XLA convs until a kernel actually wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, xpad_ref, *, H, W, C, NT):
    # zero the padded buffer borders once, then paste the input
    xpad_ref[0, :, :] = jnp.zeros((W + 2, C), x_ref.dtype)
    xpad_ref[H + 1, :, :] = jnp.zeros((W + 2, C), x_ref.dtype)
    xpad_ref[:, 0, :] = jnp.zeros((H + 2, C), x_ref.dtype)
    xpad_ref[:, W + 1, :] = jnp.zeros((H + 2, C), x_ref.dtype)
    xpad_ref[1 : H + 1, 1 : W + 1, :] = x_ref[0]

    acc = jnp.zeros((H * W, NT), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xpad_ref[dy : dy + H, dx : dx + W, :].reshape(H * W, C)
            acc = acc + jax.lax.dot_general(
                xs,
                w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    o_ref[0] = acc.reshape(H, W, NT).astype(o_ref.dtype)


def conv3x3_supported(x_shape, w_shape) -> bool:
    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    _, H, W, C = x_shape
    O = w_shape[3]
    # lanes pad internally; require sublane-friendly channel counts
    if C % 64 or O % 64:
        return False
    if O % min(O, 512):
        return False
    # padded row buffer + weights tile must fit VMEM comfortably
    n_tile = min(O, 512)
    vmem = (H + 2) * (W + 2) * C * 2 + 9 * C * n_tile * 2 + H * W * n_tile * 6
    return vmem < 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """x [B,H,W,C] (bf16/f32), w [3,3,C,O], b [O] → [B,H,W,O]."""
    B, H, W, C = x.shape
    O = w.shape[3]
    NT = min(O, 512)
    assert O % NT == 0

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, NT=NT),
        grid=(B, O // NT),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b_, n: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, NT), lambda b_, n: (0, 0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT), lambda b_, n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, NT), lambda b_, n: (b_, 0, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * O * 9,
            bytes_accessed=(x.size + w.size + b.size) * 2
            + B * H * W * O * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, O))
    return out
