"""Pallas 3×3 stride-1 convolution (NHWC), flat-offset formulation.

Motivation: XLA's conv on v5e is batch-bound at the UNet's small CFG batch
(measured 33 TFLOP/s at B=2 vs 64 at B=8) and convs dominate the UNet step
(SURVEY §3.5). Round 1's experimental kernel (9 shifted 2-D slices of a
VMEM-padded block) lost to relayout traffic (21 TF/s).

This version eliminates the 2-D relayouts with a *flat-offset* formulation:
zero-pad the input to (H+2, W+2, C) and flatten to X' [(H+2)·(W+2), C].
For output pixel (h, w) at flat row m = h·(W+2) + w,

    out[m] = Σ_{dy,dx} X'[m + dy·(W+2) + dx] @ W[dy, dx]

i.e. every tap contributes a *contiguous* slice of X' at a constant sublane
offset — a cheap shift, no gather, no 2-D relayout. The kernel grids over
(batch, row-strips, output-channel tiles) and accumulates the 9 tap matmuls
in fp32 on the MXU (bf16 operands stay bf16 — the MXU fast path). The
output carries W+2 columns per row (2 garbage); the caller slices them off.

Padding/flatten/slice around the pallas_call are XLA ops that fuse with the
neighbors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 10 * 1024 * 1024  # conservative per-instance working set

# Global gate for routing the UNet/VAE 3×3 convs through the Pallas kernel
# (models/unet.py _conv). Enabled per-process via enable_pallas_conv();
# checked at trace time, so flip it before building jitted programs.
_PALLAS_CONV = False


def enable_pallas_conv(on: bool = True) -> None:
    global _PALLAS_CONV
    _PALLAS_CONV = on


def pallas_conv_enabled() -> bool:
    return _PALLAS_CONV


def _kernel(x_ref, w_ref, b_ref, o_ref, *, SH, Wp, C, NT):
    # x_ref: full padded flat input (1, M'+slack, C) for this batch row;
    # strip position comes from the grid. Mosaic requires dynamic sublane
    # offsets to be multiples of 8, so the dynamic read happens once at the
    # aligned strip base (SH·Wp % 8 enforced by _pick_tiles) and the 9 tap
    # shifts are *static* value slices (cheap sublane rotates).
    s = pl.program_id(1)
    rows = SH * Wp
    xall = x_ref[0, pl.ds(s * rows, rows + 2 * Wp + 8), :]
    acc = jnp.zeros((rows, NT), jnp.float32)
    for tap in range(9):
        off = (tap // 3) * Wp + (tap % 3)
        xs = jax.lax.slice(xall, (off, 0), (off + rows, C))
        acc = acc + jax.lax.dot_general(
            xs,
            w_ref[tap],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_tiles(H, W, C, O, itemsize=2):
    """Choose (SH, NT) so the working set fits the VMEM budget."""
    Wp = W + 2
    x_bytes = (H + 2) * Wp * C * itemsize + 8 * Wp * itemsize
    for NT in (512, 256, 128):
        if O % min(O, NT):
            continue
        nt = min(O, NT)
        w_bytes = 9 * C * nt * itemsize
        SH = H
        while SH >= 4:
            out_bytes = SH * Wp * nt * (itemsize + 4)  # out + fp32 acc
            # SH·Wp must be 8-aligned (Mosaic dynamic-offset constraint);
            # Wp is even, so SH % 4 == 0 suffices.
            if (x_bytes + w_bytes + out_bytes <= VMEM_BUDGET
                    and H % SH == 0 and (SH * Wp) % 8 == 0):
                return SH, nt
            SH //= 2
    return None


def conv3x3_supported(x_shape, w_shape, itemsize: int = 2) -> bool:
    """Gate for routing Conv2D through the Pallas kernel. ``itemsize``
    must match the runtime dtype — the VMEM fit depends on it (a float32
    activation needs twice the budget of bf16)."""
    if len(w_shape) != 4 or w_shape[:2] != (3, 3):
        return False
    _, H, W, C = x_shape
    O = w_shape[3]
    if H < 8 or W < 8:
        return False  # tiny spatial dims: strip rows < sublane tile
    if C % 64 or O % 64:
        return False
    return _pick_tiles(H, W, C, O, itemsize) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """x [B,H,W,C] (bf16/f32), w [3,3,C,O], b [O] → [B,H,W,O]."""
    B, H, W, C = x.shape
    O = w.shape[3]
    Wp = W + 2
    SH, NT = _pick_tiles(H, W, C, O, x.dtype.itemsize)

    # pad once, flatten, and append 8 slack rows (the last strip's dy=2,dx=2
    # tap reads 2 flat rows past (H+2)*Wp)
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)]).reshape(B, -1, C)
    xp = jnp.pad(xp, [(0, 0), (0, 8), (0, 0)])
    wt = w.reshape(9, C, O)

    out = pl.pallas_call(
        functools.partial(_kernel, SH=SH, Wp=Wp, C=C, NT=NT),
        grid=(B, H // SH, O // NT),
        in_specs=[
            pl.BlockSpec((1, (H + 2) * Wp + 8, C), lambda b_, s, n: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, NT), lambda b_, s, n: (0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT), lambda b_, s, n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SH * Wp, NT), lambda b_, s, n: (b_, s, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * Wp, O), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Wp * C * O * 9,
            bytes_accessed=(x.size + w.size + b.size) * x.dtype.itemsize
            + B * H * Wp * O * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wt, b.reshape(1, O))
    return out.reshape(B, H, Wp, O)[:, :, :W, :]
