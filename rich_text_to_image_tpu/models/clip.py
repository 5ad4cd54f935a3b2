"""CLIP text encoders (ViT-L text tower and OpenCLIP-G tower) in flax.

Covers both reference uses: SD-1.5's ``CLIPTextModel``
(models/region_diffusion.py:30-31) and SDXL's dual
``CLIPTextModel(WithProjection)`` pair whose *penultimate* hidden state feeds
the UNet and whose projected pooled output conditions the micro-embedding
(models/region_diffusion_sdxl.py:351-356).

Output contract of ``apply``:
  last_hidden_state [B, 77, D] — after final layer norm,
  penultimate       [B, 77, D] — hidden_states[-2] (pre final LN),
  pooled            [B, D]     — hidden at each row's EOS position,
  projected         [B, P]     — pooled @ text_projection (if configured).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .config import CLIPTextConfig

_ACTS = {
    "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
    "gelu": lambda x: nn.gelu(x, approximate=False),  # HF "gelu" = exact erf
}


class _MHA(nn.Module):
    """Standard multi-head attention with additive mask, torch-CLIP parity."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        hd = d // self.heads
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dense("q_proj")(x) * (hd**-0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s + mask
        p = nn.softmax(s, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(*x.shape)
        return dense("out_proj")(o)


class _Block(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + _MHA(cfg.num_attention_heads, self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _ACTS[cfg.hidden_act](h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, eos_token_id: int | None = None):
        cfg = self.cfg
        B, S = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
        ).astype(self.dtype)
        x = tok + pos[None, :S]

        # causal mask (CLIP text towers are causal)
        mask = jnp.triu(jnp.full((S, S), -jnp.inf, dtype=jnp.float32), k=1)
        mask = mask[None, None]

        penultimate = None
        for i in range(cfg.num_hidden_layers):
            if i == cfg.num_hidden_layers - 1:
                penultimate = x
            x = _Block(cfg, self.dtype, name=f"layers_{i}")(x, mask)

        last = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x)

        # pooled = hidden at EOS. HF convention: argmax of ids == eos_token_id
        # (first occurrence); fall back to the ids' max value (original CLIP).
        if eos_token_id is None:
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last[jnp.arange(B), eos_pos]

        out = {
            "last_hidden_state": last,
            "penultimate": penultimate,
            "pooled": pooled,
        }
        if cfg.projection_dim is not None:
            proj = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype,
                name="text_projection",
            )(pooled)
            out["projected"] = proj
        return out
