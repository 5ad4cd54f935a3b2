"""CLIP vision transformer (ViT-B/32) + image/text scoring head.

Backs the style benchmark's regional CLIP similarity metric (reference:
utils/clip_utils.py:46-81 wraps OpenAI CLIP ViT-B/32). Implemented in flax
with the same block structure as the text tower; weights convert from an
OpenAI-CLIP or HF state dict.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .clip import _Block
from .config import CLIPTextConfig, CLIPVisionConfig

# OpenAI CLIP preprocessing constants (clip_utils.py:15-17)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPVisionModel(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] normalized
        cfg = self.cfg
        B = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixels)
        x = x.reshape(B, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.tile(cls[None, None], (B, 1, 1)), x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, cfg.hidden_size),
        ).astype(self.dtype)
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)
        blk_cfg = CLIPTextConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_attention_heads=cfg.num_attention_heads,
            hidden_act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
        )
        mask = jnp.zeros((1, 1, x.shape[1], x.shape[1]), jnp.float32)
        for i in range(cfg.num_hidden_layers):
            x = _Block(blk_cfg, self.dtype, name=f"layers_{i}")(x, mask)
        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(x[:, 0])
        proj = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled)
        return {"pooled": pooled, "projected": proj}


def preprocess_images(images, image_size: int = 224):
    """uint8/float [B,H,W,3] → CLIP-normalized [B,224,224,3].

    clean-fid style: bicubic resize (antialias) to 224² + normalize
    (reference clip_utils.py:11-18 resizes then center-crops; for square
    inputs — our generated images — the crop is identity).
    """
    from ..ops.resize import resize_bicubic

    x = jnp.asarray(images, jnp.float32)
    if x.max() > 2.0:
        x = x / 255.0
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = resize_bicubic(x.transpose(0, 3, 1, 2), (image_size, image_size))
        x = x.transpose(0, 2, 3, 1)
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
