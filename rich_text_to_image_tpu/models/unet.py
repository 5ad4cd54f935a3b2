"""UNet2DCondition in flax — TPU-native re-design of the reference's forked
diffusers UNet (models/unet_2d_condition.py, models/attention_processor.py,
models/resnet.py).

The reference achieves attention capture / injection / reweighting by
PyTorch forward hooks mutating a module tree. Here the same capabilities are
*functional*:

  * ``capture`` (static :class:`CaptureSpec`) decides which layers emit
    head-averaged attention probabilities, (Q, K) pairs, or resnet hidden
    features into the ``aux`` dict returned alongside eps.
  * ``controls`` (:class:`UNetControls` pytree) carries injected (Q, K) per
    self-attention layer, injected resnet features, the traced
    ``inject_gate`` (the reference's per-step ``feat_inject_step``,
    region_diffusion.py:104), and font-size token weight vectors
    (attention_processor.py:386-399).

Layers are *named* with the reference's registry strings (e.g.
``down_blocks.1.attentions.0.transformer_blocks.0.attn1``) so capture sets
and injection dicts key off the exact names in
utils/attention_utils.py:12-67.

Layout: NHWC activations / HWIO conv kernels (TPU-native). Self-attention
runs the Pallas flash kernel except on capture layers (which need probs and
are small); cross-attention (77 KV tokens) is the fused XLA path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import (
    attention_with_probs,
    avg_probs_kernel_fits,
    cross_attention,
    flash_attention,
    flash_attention_avg_probs,
)
from .config import UNetConfig


# ------------------------------------------------------------------ controls
@dataclasses.dataclass
class UNetControls:
    """Traced control inputs (all optional; None = off)."""

    token_weights: Optional[jnp.ndarray] = None  # (77,) or (B,77) |font size|
    token_signs: Optional[jnp.ndarray] = None
    inject_gate: Optional[jnp.ndarray] = None  # scalar bool
    inject_qk: Optional[dict[str, tuple[jnp.ndarray, jnp.ndarray]]] = None
    inject_resnet: Optional[dict[str, jnp.ndarray]] = None
    # prompt-to-prompt cross-attention editing: per-layer base probs
    # [1,H,S,77], a token mapper [77] (edited→base columns) and a per-token
    # mix weight [77] (alphas × step gate)
    inject_cross: Optional[dict[str, jnp.ndarray]] = None
    cross_mapper: Optional[jnp.ndarray] = None
    cross_mix: Optional[jnp.ndarray] = None
    # In-batch injection (static metadata): rows [inject_dst[0], inject_dst[1])
    # take row ``inject_src``'s (Q, K) at every self-attn layer and its
    # pre-residual feature at INJECT_RESNET_NAME, under ``inject_gate``.
    # Mathematically identical to the reference's two-forward
    # capture-(Q,K)-then-inject flow (region_diffusion.py:313-395) but in ONE
    # merged forward: no per-layer (Q,K) HBM roundtrip between launches, and
    # the refer + span rows batch onto the MXU together.
    inject_src: Optional[int] = None
    inject_dst: Optional[tuple] = None


jax.tree_util.register_dataclass(
    UNetControls,
    data_fields=[
        "token_weights", "token_signs", "inject_gate", "inject_qk",
        "inject_resnet", "inject_cross", "cross_mapper", "cross_mix",
    ],
    meta_fields=["inject_src", "inject_dst"],
)


@dataclasses.dataclass(frozen=True)
class CaptureSpec:
    """Static capture requests (pytree-stable across scan steps)."""

    self_probs: frozenset = frozenset()  # attn1 names → head-avg probs
    cross_probs: frozenset = frozenset()  # attn2 names → head-avg probs
    qk: bool = False  # all attn1 (q, k) + resnet features
    resnet: frozenset = frozenset()  # resnet names → hidden feature
    cross_full: bool = False  # all attn2 full probs (prompt-to-prompt)


EMPTY_CAPTURE = CaptureSpec()
# The resnet whose pre-residual feature the reference injects
# (region_diffusion.py:349, asserted 16² for SD / 64² for SDXL).
INJECT_RESNET_NAME = "up_blocks.1.resnets.1"


_FORCE_FLASH = False


def force_flash(on: bool) -> None:
    """Test hook: route self-attention through the Pallas kernels regardless
    of backend/sequence length (interpret mode on CPU). Lets the mesh-parity
    tests execute the *kernel* path under a sharded 8-CPU mesh — without it
    every mesh test silently takes the XLA path and multi-chip correctness
    of the kernels is never evidenced (tests/test_pallas_sharded.py)."""
    global _FORCE_FLASH
    _FORCE_FLASH = bool(on)


def _use_flash(seq: int) -> bool:
    # below ~512 tokens the fused XLA path beats kernel launch overhead;
    # on the CPU backend (full-size models in tests/benchmarks) the Pallas
    # kernels would need interpret mode — orders of magnitude slower than
    # XLA's fused attention — so CPU always takes the XLA path
    if _FORCE_FLASH:
        return True
    return seq >= 512 and jax.default_backend() != "cpu"


def _flash_interpret() -> bool:
    # Pallas kernels need interpret mode off-TPU (the force_flash test path)
    return jax.default_backend() == "cpu"


# ------------------------------------------------------------------- helpers
def timestep_embedding(
    t: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers ``get_timestep_embedding`` parity."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[..., None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[..., half:], emb[..., :half]], axis=-1)
    return emb


def _groupnorm(groups, dtype, name, eps=1e-5):
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype, name=name)


class Conv2D(nn.Module):
    """nn.Conv-compatible 2-D conv (identical param tree: ``kernel`` HWIO +
    ``bias``) that routes 3×3/stride-1/pad-1 calls through the Pallas
    flat-offset kernel (ops/conv.py) when ``enable_pallas_conv()`` is on and
    the shape qualifies; falls back to XLA's conv otherwise."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.conv import conv3x3, conv3x3_supported, pallas_conv_enabled

        k = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if (pallas_conv_enabled() and k == 3 and self.stride == 1
                and self.pad == 1
                and conv3x3_supported(x.shape, kernel.shape,
                                      jnp.dtype(self.dtype).itemsize)):
            return conv3x3(x, kernel, bias,
                           interpret=jax.default_backend() == "cpu")
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride),
            [(self.pad, self.pad), (self.pad, self.pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


def _conv(features, kernel=3, stride=1, pad=1, dtype=jnp.float32, name=None):
    return Conv2D(features, kernel, stride, pad, dtype=dtype, name=name)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


# -------------------------------------------------------------------- resnet
class ResnetBlock(nn.Module):
    """GN-SiLU-Conv ×2 + time projection; returns (out, hidden).

    ``hidden`` is the pre-residual branch the reference exposes for feature
    injection (models/resnet.py:590-645); when this layer's name appears in
    ``controls.inject_resnet`` the branch is replaced under ``inject_gate``.
    """

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""

    @nn.compact
    def __call__(self, x, temb, controls: UNetControls | None = None):
        in_ch = x.shape[-1]
        h = _groupnorm(self.groups, self.dtype, "norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = _groupnorm(self.groups, self.dtype, "norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv2")(h)

        if (
            controls is not None
            and controls.inject_resnet is not None
            and self.layer_name in controls.inject_resnet
        ):
            injected = controls.inject_resnet[self.layer_name].astype(h.dtype)
            gate = controls.inject_gate
            if (controls.inject_dst is not None
                    and controls.inject_src is None):
                # explicit feature into a row RANGE (refer-precomputed rich
                # launch: only span rows take the stored refer feature)
                d0, d1 = controls.inject_dst
                hs = jnp.broadcast_to(injected, (d1 - d0,) + h.shape[1:])
                if gate is not None:
                    hs = jnp.where(gate, hs, h[d0:d1])
                h_out = h.at[d0:d1].set(hs)
            elif gate is None:
                h_out = injected
            else:
                h_out = jnp.where(gate, injected, h)
        elif (
            controls is not None
            and controls.inject_src is not None
            and self.layer_name == INJECT_RESNET_NAME
        ):
            # in-batch feature injection (see UNetControls.inject_src)
            s0 = controls.inject_src
            d0, d1 = controls.inject_dst
            hs = jnp.broadcast_to(h[s0:s0 + 1], (d1 - d0,) + h.shape[1:])
            gate = controls.inject_gate
            if gate is not None:
                hs = jnp.where(gate, hs, h[d0:d1])
            h_out = h.at[d0:d1].set(hs)
        else:
            h_out = h

        if in_ch != self.out_channels:
            x = _conv(
                self.out_channels, kernel=1, pad=0, dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h_out, h


# ----------------------------------------------------------------- attention
class Attention(nn.Module):
    """Self- or cross-attention with functional capture/inject dispatch."""

    heads: int
    dim: int  # query dim (= channels)
    kv_dim: int | None = None  # cross-attention key/value dim
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""

    @nn.compact
    def __call__(
        self,
        x,  # [B, S, C]
        context=None,  # [B, 77, kv_dim] for cross-attn
        controls: UNetControls | None = None,
        capture: CaptureSpec = EMPTY_CAPTURE,
        aux: dict | None = None,
    ):
        is_cross = context is not None
        ctx = context if is_cross else x
        B, S, C = x.shape
        hd = self.dim // self.heads
        scale = hd**-0.5

        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        def split(t):
            return t.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)

        name = self.layer_name
        if is_cross:
            want_probs = name in capture.cross_probs or capture.cross_full
            tw = controls.token_weights if controls is not None else None
            ts = controls.token_signs if controls is not None else None
            inj_cross = (
                controls.inject_cross.get(name)
                if controls is not None and controls.inject_cross is not None
                else None
            )
            if tw is not None and tw.ndim == 1:
                tw, ts = tw[None], ts[None]
            explicit = tw is not None or want_probs or inj_cross is not None
            if explicit:
                # post-softmax controls compose in order: exp-domain token
                # weights (font size) → prompt-to-prompt probs blending →
                # sign/equalizer scaling (no renormalization).
                s = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
                ) * scale
                if tw is not None:
                    s = s + jnp.log(tw)[:, None, None, :]
                probs = jax.nn.softmax(s, axis=-1)
                if inj_cross is not None:
                    # prompt-to-prompt editing: blend the base pass's probs,
                    # re-indexed through the token mapper, into this pass's
                    # probs per target token. A 1-D mapper is Refine's column
                    # gather (ptp AttentionRefine.replace_cross_attention); a
                    # 2-D mapper is Replace's matrix form supporting
                    # fractional redistribution for unequal-length word swaps
                    # (ptp AttentionReplace + seq_aligner.py:153-187).
                    base = inj_cross.astype(probs.dtype)
                    if controls.cross_mapper.ndim == 2:
                        mapped = jnp.einsum(
                            "bhqw,wn->bhqn", base,
                            controls.cross_mapper.astype(base.dtype),
                        )
                    else:
                        mapped = jnp.take(base, controls.cross_mapper, axis=-1)
                    mix = controls.cross_mix[None, None, None, :]
                    probs = mix * mapped + (1.0 - mix) * probs
                if ts is not None:
                    probs = probs * ts[:, None, None, :]
                o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)
            else:
                o = cross_attention(q, k, v, scale)
                probs = None
            if aux is not None and name in capture.cross_probs:
                # head-average, reference parity (attention_processor.py:541-545
                # via reshape_batch_dim_to_heads_and_average)
                aux.setdefault("cross_probs", {})[name] = jnp.mean(probs, axis=1)
            if aux is not None and capture.cross_full:
                aux.setdefault("cross_probs_full", {})[name] = probs
        else:
            # ----- self-attention
            inj = (
                controls.inject_qk.get(name)
                if controls is not None and controls.inject_qk is not None
                else None
            )
            if inj is not None:
                qi, ki = inj
                if qi.ndim == 3:
                    # pre-split [B, S, C] storage layout (refer-precompute
                    # buffers keep C=H·hd minor so the TPU (8,128) tiling
                    # doesn't pad hd → 128); split to [B, H, S, hd] here
                    qi = qi.reshape(
                        qi.shape[0], qi.shape[1], self.heads, hd
                    ).transpose(0, 2, 1, 3)
                    ki = ki.reshape(
                        ki.shape[0], ki.shape[1], self.heads, hd
                    ).transpose(0, 2, 1, 3)
                gate = controls.inject_gate
                if (controls.inject_dst is not None
                        and controls.inject_src is None):
                    # explicit (Q, K) into a row RANGE only: the
                    # refer-precomputed rich launch carries
                    # [uncond, base, spans...] in one batch and only the span
                    # rows take the stored refer (Q, K)
                    d0, d1 = controls.inject_dst
                    qs = jnp.broadcast_to(
                        qi.astype(q.dtype), (d1 - d0,) + q.shape[1:])
                    ks = jnp.broadcast_to(
                        ki.astype(k.dtype), (d1 - d0,) + k.shape[1:])
                    if gate is not None:
                        qs = jnp.where(gate, qs, q[d0:d1])
                        ks = jnp.where(gate, ks, k[d0:d1])
                    q_used = q.at[d0:d1].set(qs)
                    k_used = k.at[d0:d1].set(ks)
                elif gate is not None:
                    # broadcast the single reference row over the region batch
                    q_used = jnp.where(gate, qi.astype(q.dtype), q)
                    k_used = jnp.where(gate, ki.astype(k.dtype), k)
                else:
                    q_used, k_used = qi.astype(q.dtype), ki.astype(k.dtype)
            else:
                q_used, k_used = q, k

            if controls is not None and controls.inject_src is not None:
                # in-batch injection: dst rows attend with the src row's
                # (Q, K) — same math as the two-forward inject_qk flow
                s0 = controls.inject_src
                d0, d1 = controls.inject_dst
                gate = controls.inject_gate
                qs = jnp.broadcast_to(q[s0:s0 + 1], (d1 - d0,) + q.shape[1:])
                ks = jnp.broadcast_to(k[s0:s0 + 1], (d1 - d0,) + k.shape[1:])
                if gate is not None:
                    qs = jnp.where(gate, qs, q_used[d0:d1])
                    ks = jnp.where(gate, ks, k_used[d0:d1])
                q_used = q_used.at[d0:d1].set(qs)
                k_used = k_used.at[d0:d1].set(ks)

            want_probs = name in capture.self_probs
            if want_probs:
                # capture layers consume only the head AVERAGE
                # (region_diffusion.py:417) — the fused kernel emits it
                # without materializing [B,H,S,S] probs in HBM; degrade to
                # the XLA path (not a crash) when its full-row layout
                # can't fit VMEM at an unusual resolution
                if (_use_flash(S) and self.dtype != jnp.float64
                        and avg_probs_kernel_fits(
                            S, k_used.shape[2], q_used.shape[-1],
                            q_used.dtype)):
                    o, pavg = flash_attention_avg_probs(
                        q_used, k_used, v, scale,
                        interpret=_flash_interpret())
                else:
                    o, probs = attention_with_probs(q_used, k_used, v, scale)
                    pavg = jnp.mean(probs, axis=1)
                if aux is not None:
                    aux.setdefault("self_probs", {})[name] = pavg
            elif _use_flash(S) and self.dtype != jnp.float64:
                o = flash_attention(q_used, k_used, v, scale,
                                    interpret=_flash_interpret())
            else:
                o = cross_attention(q_used, k_used, v, scale)
            if capture.qk and aux is not None:
                aux.setdefault("self_qk", {})[name] = (q, k)

        o = o.transpose(0, 2, 1, 3).reshape(B, S, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(o)


class FeedForward(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * 4
        h = nn.Dense(inner * 2, dtype=self.dtype, name="geglu")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    kv_dim: int
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""  # "...transformer_blocks.{i}"

    @nn.compact
    def __call__(self, x, context, controls, capture, aux):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.heads, self.dim, dtype=self.dtype, name="attn1",
            layer_name=f"{self.layer_name}.attn1",
        )(h, None, controls, capture, aux)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.heads, self.dim, kv_dim=self.kv_dim, dtype=self.dtype,
            name="attn2", layer_name=f"{self.layer_name}.attn2",
        )(h, context, controls, capture, aux)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    heads: int
    dim: int
    depth: int
    kv_dim: int
    use_linear_projection: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""  # "...attentions.{i}"

    @nn.compact
    def __call__(self, x, context, controls, capture, aux):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(h)
        else:
            h = _conv(self.dim, kernel=1, pad=0, dtype=self.dtype,
                      name="proj_in")(h)
            h = h.reshape(B, H * W, self.dim)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.dim, self.heads, self.kv_dim, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
                layer_name=f"{self.layer_name}.transformer_blocks.{i}",
            )(h, context, controls, capture, aux)
        if self.use_linear_projection:
            h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, self.dim)
            h = _conv(C, kernel=1, pad=0, dtype=self.dtype, name="proj_out")(h)
        return h + residual


class DualTransformer2D(nn.Module):
    """Two-stream transformer for dual-conditioned checkpoints.

    Behavioral contract of the reference's ``DualTransformer2DModel``
    (models/dual_transformer_2d.py:97-151): ``context`` is the
    concatenation of two condition sequences (lengths
    ``condition_lengths``); condition ``i`` is encoded by stream
    ``transformer_index[i]``; the two residual deltas are mixed by
    ``mix_ratio`` and added back to the input. Never instantiated by the
    SD-1.5/SDXL configs — both streams share ``kv_dim`` like the
    reference's twin ``Transformer2DModel``s.

    TPU note: both streams always run (static graph — no data-dependent
    dispatch); the split points are static so XLA sees two fixed-shape
    attention programs per call.
    """

    heads: int
    dim: int
    depth: int
    kv_dim: int
    use_linear_projection: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""
    condition_lengths: tuple[int, int] = (77, 257)
    transformer_index: tuple[int, int] = (1, 0)
    mix_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, context, controls, capture, aux):
        if tuple(sorted(self.transformer_index)) != (0, 1):
            # the reference always instantiates BOTH streams; a degenerate
            # routing like (0, 0) would leave the unused stream's params
            # uncreated under flax lazy init, so loading a real dual
            # checkpoint would fail with a param-structure mismatch
            raise ValueError(
                "transformer_index must be a permutation of (0, 1), got "
                f"{self.transformer_index}"
            )
        streams = [
            Transformer2D(
                self.heads, self.dim, self.depth, self.kv_dim,
                self.use_linear_projection, self.groups, self.dtype,
                name=f"transformers_{j}",
                layer_name=f"{self.layer_name}.transformers.{j}",
            )
            for j in range(2)
        ]
        deltas = []
        start = 0
        for i in range(2):
            cond = context[:, start:start + self.condition_lengths[i]]
            out = streams[self.transformer_index[i]](
                x, cond, controls, capture, aux)
            deltas.append(out - x)
            start += self.condition_lengths[i]
        return x + deltas[0] * self.mix_ratio + deltas[1] * (
            1.0 - self.mix_ratio)


def _attn_transformer(cfg, heads, channels, depth, dtype, name, layer_name):
    """The attention block's transformer: dual-stream iff the config asks."""
    if cfg.dual_cross_attention:
        return DualTransformer2D(
            heads, channels, depth, cfg.cross_attention_dim,
            cfg.use_linear_projection, cfg.norm_num_groups, dtype,
            name=name, layer_name=layer_name,
            condition_lengths=tuple(cfg.dual_condition_lengths),
            transformer_index=tuple(cfg.dual_transformer_index),
            mix_ratio=cfg.dual_mix_ratio,
        )
    return Transformer2D(
        heads, channels, depth, cfg.cross_attention_dim,
        cfg.use_linear_projection, cfg.norm_num_groups, dtype,
        name=name, layer_name=layer_name,
    )


# -------------------------------------------------------------------- blocks
class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    heads: int
    depth: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""

    @nn.compact
    def __call__(self, x, temb, context, controls, capture, aux):
        skips = []
        for i in range(self.cfg.layers_per_block):
            x, _ = ResnetBlock(
                self.out_channels, self.cfg.norm_num_groups, self.dtype,
                name=f"resnets_{i}", layer_name=f"{self.layer_name}.resnets.{i}",
            )(x, temb, controls)
            x = _attn_transformer(
                self.cfg, self.heads, self.out_channels, self.depth,
                self.dtype, f"attentions_{i}",
                f"{self.layer_name}.attentions.{i}",
            )(x, context, controls, capture, aux)
            skips.append(x)
        if self.add_downsample:
            x = _conv(self.out_channels, stride=2, dtype=self.dtype,
                      name="downsample")(x)
            skips.append(x)
        return x, skips


class DownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""

    @nn.compact
    def __call__(self, x, temb, controls):
        skips = []
        for i in range(self.cfg.layers_per_block):
            x, _ = ResnetBlock(
                self.out_channels, self.cfg.norm_num_groups, self.dtype,
                name=f"resnets_{i}", layer_name=f"{self.layer_name}.resnets.{i}",
            )(x, temb, controls)
            skips.append(x)
        if self.add_downsample:
            x = _conv(self.out_channels, stride=2, dtype=self.dtype,
                      name="downsample")(x)
            skips.append(x)
        return x, skips


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    heads: int
    depth: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""

    @nn.compact
    def __call__(self, x, skips, temb, context, controls, capture, aux):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            rname = f"{self.layer_name}.resnets.{i}"
            x, hidden = ResnetBlock(
                self.out_channels, self.cfg.norm_num_groups, self.dtype,
                name=f"resnets_{i}", layer_name=rname,
            )(x, temb, controls)
            if rname in capture.resnet and aux is not None:
                aux.setdefault("resnet_hidden", {})[rname] = hidden
            x = _attn_transformer(
                self.cfg, self.heads, self.out_channels, self.depth,
                self.dtype, f"attentions_{i}",
                f"{self.layer_name}.attentions.{i}",
            )(x, context, controls, capture, aux)
        if self.add_upsample:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            x = _conv(self.out_channels, dtype=self.dtype, name="upsample")(x)
        return x


class UpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    layer_name: str = ""

    @nn.compact
    def __call__(self, x, skips, temb, controls, capture, aux):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            rname = f"{self.layer_name}.resnets.{i}"
            x, hidden = ResnetBlock(
                self.out_channels, self.cfg.norm_num_groups, self.dtype,
                name=f"resnets_{i}", layer_name=rname,
            )(x, temb, controls)
            if rname in capture.resnet and aux is not None:
                aux.setdefault("resnet_hidden", {})[rname] = hidden
        if self.add_upsample:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            x = _conv(self.out_channels, dtype=self.dtype, name="upsample")(x)
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig
    channels: int
    heads: int
    depth: int
    dtype: jnp.dtype = jnp.float32
    layer_name: str = "mid_block"

    @nn.compact
    def __call__(self, x, temb, context, controls, capture, aux):
        x, _ = ResnetBlock(
            self.channels, self.cfg.norm_num_groups, self.dtype,
            name="resnets_0", layer_name=f"{self.layer_name}.resnets.0",
        )(x, temb, controls)
        x = _attn_transformer(
            self.cfg, self.heads, self.channels, self.depth, self.dtype,
            "attentions_0", f"{self.layer_name}.attentions.0",
        )(x, context, controls, capture, aux)
        x, _ = ResnetBlock(
            self.channels, self.cfg.norm_num_groups, self.dtype,
            name="resnets_1", layer_name=f"{self.layer_name}.resnets.1",
        )(x, temb, controls)
        return x


# ---------------------------------------------------------------------- UNet
class UNet2DCondition(nn.Module):
    """setup()-style UNet split into ``embed_time`` / ``encode`` / ``decode``.

    ``__call__`` composes the three exactly; the split additionally enables
    the opt-in *encoder reuse* turbo mode ("Faster Diffusion",
    arXiv 2312.09608, PAPERS.md): the denoising scan caches
    ``encode``'s (x, skips) pytree at key steps and, on non-key steps, runs
    only ``embed_time`` + ``decode`` with the cached encoder features —
    skipping the whole down path. The reference has no counterpart (it
    always runs full forwards, models/unet_2d_condition.py:703-983).
    """

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.time_embedding = TimestepEmbedding(cfg.time_embed_dim, self.dtype)
        if cfg.addition_embed_type == "text_time":
            self.add_embedding = TimestepEmbedding(
                cfg.time_embed_dim, self.dtype
            )
        self.conv_in = Conv2D(cfg.block_out_channels[0], dtype=self.dtype)

        heads = cfg.heads_per_level
        down = []
        for lvl, btype in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[lvl]
            last = lvl == len(cfg.down_block_types) - 1
            lname = f"down_blocks.{lvl}"
            if btype == "CrossAttnDownBlock2D":
                down.append(CrossAttnDownBlock(
                    cfg, ch, heads[lvl], cfg.transformer_layers_per_block[lvl],
                    not last, self.dtype, layer_name=lname,
                ))
            else:
                down.append(DownBlock(cfg, ch, not last, self.dtype,
                                      layer_name=lname))
        self.down_blocks = down

        self.mid_block = MidBlock(
            cfg, cfg.block_out_channels[-1], heads[-1],
            cfg.transformer_layers_per_block[-1], self.dtype,
        )

        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(heads))
        rev_depth = list(reversed(cfg.transformer_layers_per_block))
        up = []
        for lvl, btype in enumerate(cfg.up_block_types):
            ch = rev_channels[lvl]
            last = lvl == len(cfg.up_block_types) - 1
            lname = f"up_blocks.{lvl}"
            if btype == "CrossAttnUpBlock2D":
                up.append(CrossAttnUpBlock(
                    cfg, ch, rev_heads[lvl], rev_depth[lvl], not last,
                    self.dtype, layer_name=lname,
                ))
            else:
                up.append(UpBlock(cfg, ch, not last, self.dtype,
                                  layer_name=lname))
        self.up_blocks = up

        self.conv_norm_out = nn.GroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=self.dtype
        )
        self.conv_out = Conv2D(cfg.out_channels, dtype=self.dtype)

    # ---- phase 0: time (+ SDXL micro-conditioning) embedding — cheap,
    # recomputed every step even when the encoder is reused.
    def embed_time(self, timesteps, batch: int,
                   added_cond: dict | None = None):
        cfg = self.cfg
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (batch,))
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift,
        ).astype(self.dtype)
        emb = self.time_embedding(t_emb)
        if cfg.addition_embed_type == "text_time":
            time_ids = added_cond["time_ids"]  # [B, 6]
            te = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift,
            ).reshape(batch, -1)
            add_emb = jnp.concatenate(
                [added_cond["text_embeds"], te.astype(self.dtype)], axis=-1
            )
            emb = emb + self.add_embedding(add_emb.astype(self.dtype))
        return emb

    # ---- phase 1: conv_in + down blocks (the reusable "encoder")
    def encode(
        self,
        sample,  # [B, H, W, C] (NHWC)
        emb,  # [B, time_embed_dim] from embed_time
        encoder_hidden_states,  # [B, 77, kv_dim]
        controls: UNetControls | None = None,
        capture: CaptureSpec | None = EMPTY_CAPTURE,
    ):
        capture = EMPTY_CAPTURE if capture is None else capture
        aux: dict = {}
        context = encoder_hidden_states.astype(self.dtype)
        x = self.conv_in(sample.astype(self.dtype))
        skips = [x]
        for lvl, blk in enumerate(self.down_blocks):
            if isinstance(blk, CrossAttnDownBlock):
                x, s = blk(x, emb, context, controls, capture, aux)
            else:
                x, s = blk(x, emb, controls)
            skips += s
        return {"x": x, "skips": tuple(skips), "aux": aux}

    # ---- phase 2: mid + up blocks + head
    def decode(
        self,
        enc: dict,  # encode() output (possibly cached from a key step)
        emb,
        encoder_hidden_states,
        controls: UNetControls | None = None,
        capture: CaptureSpec | None = EMPTY_CAPTURE,
    ):
        capture = EMPTY_CAPTURE if capture is None else capture
        # copy nested capture dicts too — decode's setdefault must not
        # mutate the (possibly scan-carried) encoder cache in place
        aux = {k: dict(v) if isinstance(v, dict) else v
               for k, v in enc["aux"].items()}
        context = encoder_hidden_states.astype(self.dtype)
        skips = list(enc["skips"])
        x = self.mid_block(enc["x"], emb, context, controls, capture, aux)
        for blk in self.up_blocks:
            if isinstance(blk, CrossAttnUpBlock):
                x = blk(x, skips, emb, context, controls, capture, aux)
            else:
                x = blk(x, skips, emb, controls, capture, aux)
        x = self.conv_norm_out(x)
        x = nn.silu(x)
        x = self.conv_out(x)
        return x, aux

    def __call__(
        self,
        sample,  # [B, H, W, C] (NHWC)
        timesteps,  # scalar or [B]
        encoder_hidden_states,  # [B, 77, kv_dim]
        added_cond: dict | None = None,  # SDXL: {"text_embeds", "time_ids"}
        controls: UNetControls | None = None,
        capture: CaptureSpec = EMPTY_CAPTURE,
    ):
        emb = self.embed_time(timesteps, sample.shape[0], added_cond)
        enc = self.encode(sample, emb, encoder_hidden_states, controls, capture)
        return self.decode(enc, emb, encoder_hidden_states, controls, capture)
