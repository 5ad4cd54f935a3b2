"""Attention ops: Pallas flash self-attention + fused cross-attention.

The reference forgoes every fast-attention path because its processors must
return materialized probabilities for hook capture
(models/attention_processor.py:1157-1162 — even the SDPA processor computes
explicit probs). Here capture is a *typed side output* requested per layer,
so each call picks the right implementation:

  * ``flash_attention`` — Pallas kernel for self-attention over latent
    tokens (seq 1024-4096). KV for one (batch, head) fits VMEM at these
    lengths, so the kernel streams Q tiles against fully-resident K/V and
    materializes scores only in VMEM ("lazy flash": the [S,S] probs never
    touch HBM, which is what makes it bandwidth-optimal vs the XLA einsum
    path). Also the injection path: the rich pass's self-attention
    injection is ``flash_attention(q_ref, k_ref, v_region)`` — the
    reference's stored-probs rewrite (region_diffusion.py:356-375) without
    ever storing probs.
  * ``attention_with_probs`` — XLA path returning (out, probs) for the few
    registry layers whose head-averaged maps the token-mapper consumes
    (utils/attention_utils.py:12-67). Only used at small seq (≤1024).
  * ``cross_attention`` — XLA path for text KV (77 tokens): probs are
    [H, S, 77] (negligible), so a fused einsum+softmax is already
    speed-of-light; supports the font-size reweighting
    (attention_processor.py:386-399) as a log-space bias + sign mask, and
    an optional probs output.

All functions take [B, H, S, D] and return [B, H, S, D].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


# ========================================================== full-row kernel
_LOG2E = 1.4426950408889634


def _full_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int):
    """One (batch*head, q-tile): softmax over the FULL KV row.

    For the UNet's self-attention shapes (S ≤ 4096) K/V for one (b,h) fit in
    VMEM, so the online-softmax machinery (per-block running max/sum and acc
    rescales — all VPU passes over small tiles) is pure overhead. Instead:
    one fat QK matmul [blk_q,Dp]@[Dp,S], one softmax pass over the row, one
    fat PV matmul [blk_q,S]@[S,Dp]. The 1/l normalization happens *after*
    PV on the [blk_q,Dp] tile (S/Dp-fold fewer divides), and exp2 is used
    with log2(e) pre-folded into the Q scale. Measured ~4-5× faster than
    the online kernel at SD/SDXL shapes (scripts/bench_attn_landscape.py).
    """
    q = q_ref[0]  # (BQ, Dp), storage dtype, pre-scaled by scale*log2(e)
    k = k_ref[0]  # (Sp, Dp)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Sp) fp32, log2-scaled logits
    if k.shape[0] != kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(q.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Dp) fp32
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _full_kernel_t(q_ref, k_ref, vt_ref, ot_ref, *, kv_len: int):
    """Transposed full-row kernel: all products computed in K-major layout.

    Motivation (the D=40 lane-padding harvest, ARCHITECTURE.md round-5
    section): with head dim d < 128 the classic layout pads BOTH matmuls to
    128 lanes — QK contracts over d (pad 40→128) and PV's output dim is d
    (pad 40→128) — so each executes 128/d× the useful MACs. The PV pad is
    avoidable: compute the TRANSPOSED product

        sT  = K @ Q^T            [Skv, blk_q]   (contraction d — still padded,
                                                 inherent: exact attention
                                                 must contract Q·K over d)
        oT  = V^T @ pT           [dt,  blk_q]   (contraction Skv — FULL lanes;
                                                 dt = d rounded to the sublane
                                                 tile, 40→48 bf16, streamed as
                                                 dt MXU rows: no 128-pad)

    Hardware MACs per tile drop from blk_q·Skv·(128+128) to
    blk_q·Skv·(128+dt): effective ceiling for d=40 rises 61.5 → 89.5 TF/s
    (197·2d/(128+dt)); d=64 (SDXL) 98.5 → 131. Softmax reduces over the
    SUBLANE axis (rows of sT) — same element traffic as the lane reduction.
    V arrives pre-transposed ([dt, Skv] — sublanes dt, lanes Skv: no lane
    pad at all) so the kernel's second dot is a clean [dt,Skv]@[Skv,blk_q];
    the output transpose back to [S, d] is one cheap HBM pass outside.
    Measured on-chip vs the classic kernel: scripts/bench_lane_padding.py →
    artifacts/round5_perf/lane_padding.jsonl.
    """
    q = q_ref[0]   # (BQ, Dp) storage dtype, pre-scaled by scale*log2(e)
    k = k_ref[0]   # (Sp, Dp)
    vt = vt_ref[0]  # (dt, Sp) pre-transposed V
    st = jax.lax.dot_general(
        k,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Sp, BQ) fp32, log2-scaled logits, kv index in SUBLANES
    if k.shape[0] != kv_len:
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(row < kv_len, st, _NEG_INF)
    m = jnp.max(st, axis=0, keepdims=True)   # (1, BQ)
    p = jnp.exp2(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)    # (1, BQ)
    acc = jax.lax.dot_general(
        vt,
        p.astype(q.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (dt, BQ) fp32 — contraction over Skv: full MXU lanes
    ot_ref[0] = (acc / l).astype(ot_ref.dtype)


# VMEM working-set cap for the full-row path: K+V (bf16) + per-row buffers
# per instance, with headroom for double-buffered q/out tiles. 14 of the
# ~16 MB/core: with the honest row budget below (s fp32 + p fp32 + cast
# coexisting) this keeps the production shapes on the same layouts that
# were benchmarked on-chip in round 2 (S=4096 bf16 → blk_q=256 at 13 MB).
_FULL_PATH_VMEM = 14 * 1024 * 1024


def _full_path_layout(sq: int, skv_p: int, dp: int, itemsize: int,
                      row_elem_bytes: int | None = None):
    """Pick blk_q for a full-row kernel, or None if it can't fit VMEM.

    ``row_elem_bytes`` models the per-element VMEM cost of the [blk_q,
    skv_p] row buffers. The plain kernel's peak is s fp32 + p fp32 +
    p.astype(storage) coexisting before the PV matmul (8 + itemsize, the
    default — budgeting only 4 + itemsize risked a Mosaic VMEM-exceeded
    compile near the fit boundary); the capture-fused avg-probs kernel
    additionally holds pn fp32 + the pavg accumulator fp32
    (16 + itemsize). Shared by both kernels so their entry conditions
    stay in lockstep.
    """
    if row_elem_bytes is None:
        row_elem_bytes = 8 + itemsize
    kv_bytes = 2 * skv_p * dp * itemsize
    for blk_q in (1024, 512, 256, 128):
        if blk_q > _round_up(sq, 8):
            continue
        s_bytes = blk_q * skv_p * row_elem_bytes
        q_bytes = 2 * 2 * blk_q * dp * itemsize  # double-buffered q + out
        if kv_bytes + s_bytes + q_bytes <= _FULL_PATH_VMEM:
            return blk_q
    return None


def avg_probs_kernel_fits(sq: int, skv: int, d: int, dtype) -> bool:
    """True when the capture-fused avg-probs kernel's full-row VMEM layout
    fits for these shapes. Callers (models/unet.py capture path) use this to
    degrade to ``attention_with_probs`` + mean instead of crashing at an
    unusual resolution (``flash_attention_avg_probs`` raises on no-fit,
    unlike ``flash_attention`` which falls back to the online kernel)."""
    itemsize = jnp.dtype(dtype).itemsize
    return _full_path_layout(
        sq, _round_up(skv, 128), _round_up(d, 128), itemsize,
        row_elem_bytes=16 + itemsize,
    ) is not None


def _full_kernel_avgp(q_ref, k_ref, v_ref, o_ref, pavg_ref, *, kv_len: int,
                      heads: int):
    """Full-row kernel that additionally emits head-AVERAGED probs.

    Capture layers (the 32²-res registry layers the token mapper consumes)
    only ever use the head-averaged probs (region_diffusion.py:417 via
    reshape_batch_dim_to_heads_and_average) — so the [B,H,S,S] per-head
    probs never need to exist in HBM. Grid is (b, q-tiles, h) with h
    innermost; the pavg output block maps to (b, q-tile) and is revisited
    across h, accumulating p/l/heads in VMEM.
    """
    h = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if k.shape[0] != kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(q.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    pn = p / (l * heads)

    @pl.when(h == 0)
    def _init():
        pavg_ref[0] = pn

    @pl.when(h > 0)
    def _acc():
        pavg_ref[0] += pn


def flash_attention_avg_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flash attention returning (out [B,H,Sq,D], head-avg probs
    [B,Sq,Skv] fp32) without materializing per-head probs in HBM.

    Drop-in for the capture path where only the head average is consumed
    (the XLA ``attention_with_probs`` + mean writes/reads the full
    [B,H,S,S] tensor). Requires the full-row VMEM layout (S ≤ ~4096).

    Under a multi-device mesh the call routes through a
    ``custom_partitioning`` rule (batch/q-seq shardable; heads replicated —
    the kernel reduces over heads in VMEM; KV-seq and head-dim replicated)
    so GSPMD/Shardy partitions the kernel instead of treating it as an
    opaque call.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if jax.device_count() > 1:
        return _flash_avgp_cp(float(scale), bool(interpret))(q, k, v)
    return _flash_avgp_impl(q, k, v, float(scale), interpret)


def _flash_avgp_impl(q, k, v, scale: float, interpret: bool):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    dp = _round_up(d, 128)
    itemsize = jnp.dtype(q.dtype).itemsize
    skv_p = _round_up(skv, 128)
    # row buffers: s fp32 + p fp32 + pn fp32 + pavg fp32 + p cast to storage
    blk_q = _full_path_layout(sq, skv_p, dp, itemsize,
                              row_elem_bytes=16 + itemsize)
    if blk_q is None:
        raise ValueError(
            f"KV too large for the full-row capture kernel: S={sq}/{skv}")
    sq_p = _round_up(sq, blk_q)

    qs = q * jnp.asarray(scale * _LOG2E, q.dtype)
    qp = _pad_axis(_pad_last(qs, dp), 2, sq_p)
    kp = _pad_axis(_pad_last(k, dp), 2, skv_p)
    vp = _pad_axis(_pad_last(v, dp), 2, skv_p)

    out, pavg = pl.pallas_call(
        functools.partial(_full_kernel_avgp, kv_len=skv, heads=h),
        grid=(b, sq_p // blk_q, h),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, dp), lambda i, j, n: (i, n, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_p, dp), lambda i, j, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv_p, dp), lambda i, j, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, dp), lambda i, j, n: (i, n, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, skv_p), lambda i, j, n: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, dp), q.dtype),
            jax.ShapeDtypeStruct((b, sq_p, skv_p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * itemsize
            + b * sq_p * skv_p * 4,
            transcendentals=b * h * sq * skv,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :sq, :d], pavg[:, :sq, :skv]


# =============================================================== flash kernel
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, blk_k: int):
    """One (batch*head, q-tile): online-softmax over K tiles.

    K/V blocks are VMEM-resident for the whole row; scores live only in
    registers/VMEM. Matmul inputs stay in the storage dtype (bf16 → MXU
    fast path) with fp32 accumulation via preferred_element_type; softmax
    statistics are fp32.
    """
    q = q_ref[0]  # (BQ, D), storage dtype
    blk_q, d = q.shape
    skv = k_ref.shape[1]
    num_k = skv // blk_k
    in_dtype = q.dtype

    acc = jnp.zeros((blk_q, d), dtype=jnp.float32)
    m = jnp.full((blk_q, 1), _NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((blk_q, 1), dtype=jnp.float32)

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(j * blk_k, blk_k), :]
        v_blk = v_ref[0, pl.ds(j * blk_k, blk_k), :]
        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) fp32
        if kv_len % blk_k != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * blk_k
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(in_dtype),
            v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_last(x, to: int):
    d = x.shape[-1]
    if d == to:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, to - d)]
    return jnp.pad(x, pad)


def _pad_axis(x, axis: int, to: int):
    s = x.shape[axis]
    if s == to:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - s)
    return jnp.pad(x, pad)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=(
    "scale", "block_q", "block_k", "interpret", "_fullrow"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int = 512,
    interpret: bool = False,
    _fullrow: str | None = None,
) -> jnp.ndarray:
    """Pallas flash attention. q: [B,H,Sq,D]; k,v: [B,H,Skv,D].

    Sq/Skv need not be tile-aligned (padded internally; padded KV columns are
    masked out). D is zero-padded to a lane multiple (zero K-pad adds 0 to
    logits, zero V-pad yields sliced-away output columns).

    Path selection (block_q=None): when K+V+scores for one (b,h) fit VMEM
    (all UNet self-attention shapes, S ≤ 4096) a full-row softmax kernel is
    used — no online rescale passes, normalization after PV, exp2 softmax.
    Otherwise (e.g. VAE attention at 16k+ tokens) the online-softmax kernel
    streams K/V blocks. Passing block_q explicitly forces the online path
    with those block sizes.

    Under a multi-device mesh the call routes through a
    ``custom_partitioning`` rule: batch, heads, and q-seq are shardable
    (each (b, h, q-row) is independent given full K/V), KV-seq and head-dim
    are replicated — so GSPMD/Shardy partitions the kernel across the mesh
    instead of all-gathering around an opaque custom call.

    ``_fullrow`` is a bench/debug knob selecting the full-row kernel layout:
    ``None`` (auto — the measured shape-dispatch below), ``"classic"`` or
    ``"transposed"`` (force ``_full_kernel_t``, the D<128 lane-padding
    variant) so A/B microbenches and parity tests can pin either layout at
    any shape (scripts/bench_lane_padding.py). Production callers never
    pass it.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if jax.device_count() > 1:
        return _flash_cp(float(scale), block_q, block_k, bool(interpret),
                         _fullrow)(q, k, v)
    return _flash_impl(q, k, v, float(scale), block_q, block_k, interpret,
                       _fullrow)


def _flash_impl(q, k, v, scale: float, block_q, block_k, interpret,
                fullrow: str | None = None):
    b, h, sq, d = q.shape
    skv = k.shape[2]

    dp = _round_up(d, 128)
    itemsize = jnp.dtype(q.dtype).itemsize

    full_blk_q = _full_path_layout(sq, _round_up(skv, 128), dp, itemsize)
    # Measured shape-dispatch (artifacts/round5_perf/lane_padding.jsonl,
    # real-chip A/B at every production shape): the transposed kernel wins
    # ONLY in the d=80, S≤1024 bucket (SD-1.5's 32²-res self-attention:
    # +30% at B=2, +3% at B=4). Everywhere else the kernel is not
    # MXU-lane-bound — softmax VPU passes and VMEM traffic dominate — so
    # skipping the PV lane pad buys nothing and the extra relayouts lose
    # (full numbers + the ceiling argument: docs/ARCHITECTURE.md
    # §"round 5: the D=40 lane-padding bound").
    use_t = fullrow == "transposed" or (
        fullrow is None and d == 80 and skv <= 1024)
    if (block_q is None and full_blk_q is not None and d != dp and use_t):
        # Transposed full-row path: head dim needs lane padding (d < dp), so
        # the PV product is computed K-major to skip its 128-lane pad
        # entirely (see _full_kernel_t). Entry condition shares
        # _full_path_layout with the classic path: the row buffers (sT/pT)
        # are the same sizes transposed, and K+VT is strictly smaller than
        # the classic K+V.
        blk_q = full_blk_q
        sq_p = _round_up(sq, blk_q)
        skv_p = _round_up(skv, 128)
        dt = _round_up(d, 16 if itemsize == 2 else 8)
        qs = q * jnp.asarray(scale * _LOG2E, q.dtype)
        qp = _pad_axis(_pad_last(qs, dp), 2, sq_p).reshape(b * h, sq_p, dp)
        kp = _pad_axis(_pad_last(k, dp), 2, skv_p).reshape(b * h, skv_p, dp)
        vtp = _pad_axis(
            _pad_axis(v, 3, dt), 2, skv_p
        ).reshape(b * h, skv_p, dt).transpose(0, 2, 1)  # [b*h, dt, skv_p]
        ot = pl.pallas_call(
            functools.partial(_full_kernel_t, kv_len=skv),
            grid=(b * h, sq_p // blk_q),
            in_specs=[
                pl.BlockSpec(
                    (1, blk_q, dp), lambda i, j: (i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, skv_p, dp), lambda i, j: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, dt, skv_p), lambda i, j: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, dt, blk_q), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, dt, sq_p), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq * skv * d,
                bytes_accessed=(b * h)
                * (sq_p * dp + skv_p * dp + skv_p * dt) * itemsize,
                transcendentals=b * h * sq * skv,
            ),
            interpret=interpret,
        )(qp, kp, vtp)
        return ot.transpose(0, 2, 1).reshape(b, h, sq_p, dt)[:, :, :sq, :d]

    if block_q is None and full_blk_q is not None:
        # Full-row softmax path: KV resident, exp2 with log2(e) in the scale.
        blk_q = full_blk_q
        sq_p = _round_up(sq, blk_q)
        skv_p = _round_up(skv, 128)
        qs = q * jnp.asarray(scale * _LOG2E, q.dtype)
        qp = _pad_axis(_pad_last(qs, dp), 2, sq_p).reshape(b * h, sq_p, dp)
        kp = _pad_axis(_pad_last(k, dp), 2, skv_p).reshape(b * h, skv_p, dp)
        vp = _pad_axis(_pad_last(v, dp), 2, skv_p).reshape(b * h, skv_p, dp)
        out = pl.pallas_call(
            functools.partial(_full_kernel, kv_len=skv),
            grid=(b * h, sq_p // blk_q),
            in_specs=[
                pl.BlockSpec(
                    (1, blk_q, dp), lambda i, j: (i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, skv_p, dp), lambda i, j: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, skv_p, dp), lambda i, j: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, blk_q, dp), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq * skv * d,
                bytes_accessed=(b * h) * (sq_p + 2 * skv_p) * dp * itemsize,
                transcendentals=b * h * sq * skv,
            ),
            interpret=interpret,
        )(qp, kp, vp)
        return out.reshape(b, h, sq_p, dp)[:, :, :sq, :d]

    if block_q is None:
        block_q = 512 if d <= 48 else 2048
    blk_q = min(block_q, _round_up(sq, 8))
    sq_p = _round_up(sq, blk_q)
    blk_k = min(block_k, _round_up(skv, 128))
    skv_p = _round_up(skv, blk_k)

    qp = _pad_axis(_pad_last(q * jnp.asarray(scale, q.dtype), dp), 2, sq_p)
    kp = _pad_axis(_pad_last(k, dp), 2, skv_p)
    vp = _pad_axis(_pad_last(v, dp), 2, skv_p)

    qp = qp.reshape(b * h, sq_p, dp)
    kp = kp.reshape(b * h, skv_p, dp)
    vp = vp.reshape(b * h, skv_p, dp)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=skv, blk_k=blk_k),
        grid=(b * h, sq_p // blk_q),
        in_specs=[
            pl.BlockSpec(
                (1, blk_q, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv_p, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv_p, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    return out.reshape(b, h, sq_p, dp)[:, :, :sq, :d]


# ===================================================== SPMD partitioning
# GSPMD/Shardy treat a pallas_call as an opaque custom call: without a rule
# the partitioner would all-gather sharded operands around it. Each (batch,
# head, q-row) of flash attention is independent given the full K/V row, so
# the kernels are registered with custom_partitioning rules that let the
# batch/head/q-seq shardings flow THROUGH the kernel (each device runs the
# unmodified kernel on its local shard — no collectives) while KV-seq and
# head-dim are forced replicated. The head-averaging capture kernel also
# replicates heads (it reduces over them in VMEM).
from jax.sharding import PartitionSpec as P  # noqa: E402  (section-local)


def _keep_dims_spec(spec, rank: int, keep: frozenset) -> P:
    s = tuple(spec) + (None,) * (rank - len(tuple(spec)))
    return P(*[s[i] if i in keep else None for i in range(rank)])


@functools.lru_cache(maxsize=None)
def _flash_cp(scale: float, block_q, block_k, interpret: bool,
              fullrow: str | None = None):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    def fn(q, k, v):
        return _flash_impl(q, k, v, scale, block_q, block_k, interpret,
                           fullrow)

    fcp = custom_partitioning(fn)
    keep = frozenset({0, 1, 2})  # b, h, sq shardable; d replicated

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(
            mesh, _keep_dims_spec(arg_shapes[0].sharding.spec, 4, keep))

    def partition(mesh, arg_shapes, result_shape):
        q_sh = NamedSharding(
            mesh, _keep_dims_spec(arg_shapes[0].sharding.spec, 4, keep))
        kv_sh = NamedSharding(
            mesh,
            _keep_dims_spec(arg_shapes[0].sharding.spec, 4, frozenset({0, 1})))
        return mesh, fn, q_sh, (q_sh, kv_sh, kv_sh)

    fcp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h s d, b h t d, b h t d -> b h s d",
        need_replication_factors=("d", "t"),  # sorted by factor index
    )
    return fcp


@functools.lru_cache(maxsize=None)
def _flash_avgp_cp(scale: float, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    def fn(q, k, v):
        return _flash_avgp_impl(q, k, v, scale, interpret)

    fcp = custom_partitioning(fn)
    keep = frozenset({0, 2})  # b, sq shardable; h reduced in-kernel, d repl.

    def _shardings(mesh, q_spec):
        out = _keep_dims_spec(q_spec, 4, keep)
        pavg = P(out[0], out[2], None)  # [B, Sq, Skv]
        return NamedSharding(mesh, out), NamedSharding(mesh, pavg)

    def infer(mesh, arg_shapes, result_shape):
        return _shardings(mesh, arg_shapes[0].sharding.spec)

    def partition(mesh, arg_shapes, result_shape):
        out_sh, pavg_sh = _shardings(mesh, arg_shapes[0].sharding.spec)
        kv_sh = NamedSharding(
            mesh,
            _keep_dims_spec(arg_shapes[0].sharding.spec, 4, frozenset({0})))
        q_sh = out_sh
        return mesh, fn, (out_sh, pavg_sh), (q_sh, kv_sh, kv_sh)

    fcp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b h s d, b h t d, b h t d -> b h s d, b s t",
        need_replication_factors=("h", "d", "t"),  # sorted by factor index
    )
    return fcp


# ================================================================= XLA paths
def attention_with_probs(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit attention returning (out, probs). For capture layers only.

    probs: [B, H, Sq, Skv] float32 post-softmax (upcast like the reference's
    upcast_softmax path).
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)
    return out, p


def cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    token_weights: jnp.ndarray | None = None,
    token_signs: jnp.ndarray | None = None,
    return_probs: bool = False,
):
    """Text cross-attention (Skv = 77) with optional font-size reweighting.

    ``token_weights``/``token_signs`` are dense (Skv,) vectors (1.0 where no
    reweighting): probs = softmax(s + log w) * sign — algebraically equal to
    the reference's exp-scale + renormalize + sign re-application
    (attention_processor.py:386-399). Negative signs yield *negative*
    attention (the strike-through repulsion semantics).

    Returns out or (out, probs[f32]) — probs have the sign applied, matching
    what the reference's hooks would see.
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if token_weights is not None:
        s = s + jnp.log(token_weights)[None, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if token_signs is not None:
        p = p * token_signs[None, None, None, :]
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)
    if return_probs:
        return out, p
    return out


def make_token_weight_vectors(
    word_pos, font_size, seq_len: int = 77
) -> tuple[jnp.ndarray, jnp.ndarray] | tuple[None, None]:
    """Dense (|w|, sign) vectors from sparse (word_pos, font_size) spec.

    Host-side helper mirroring utils/richtext_utils.py:188-209 output.
    """
    if word_pos is None or font_size is None or len(word_pos) == 0:
        return None, None
    import numpy as np

    w = np.ones(seq_len, dtype=np.float32)
    s = np.ones(seq_len, dtype=np.float32)
    w[np.asarray(word_pos)] = np.abs(np.asarray(font_size))
    s[np.asarray(word_pos)] = np.sign(np.asarray(font_size))
    return jnp.asarray(w), jnp.asarray(s)
