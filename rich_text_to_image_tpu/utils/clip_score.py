"""CLIP image-text scorer (reference utils/clip_utils.py:46-81).

Normalized cosine similarity between CLIP image and text embeddings, used by
the style benchmark on mask-composited region crops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.clip import CLIPTextModel
from ..models.clip_vision import CLIPVisionModel, preprocess_images
from ..models.config import CLIPTextConfig, CLIPVisionConfig
from ..models.tokenizer import CLIPTokenizer


class CLIPScorer:
    """get_clip_score(image, text) → cosine similarity."""

    def __init__(self, text_params, vision_params, tokenizer: CLIPTokenizer,
                 text_cfg: CLIPTextConfig, vision_cfg: CLIPVisionConfig):
        self.text_model = CLIPTextModel(text_cfg)
        self.vision_model = CLIPVisionModel(vision_cfg)
        self.text_params = text_params
        self.vision_params = vision_params
        self.tokenizer = tokenizer
        self.image_size = vision_cfg.image_size

    @classmethod
    def from_pretrained(cls, clip_dir: str):
        """Load from a local HF clip-vit-base-patch32-layout directory
        (model.safetensors holding both towers + projections)."""
        import jax.numpy as jnp

        from ..models.convert import (
            convert_clip_text,
            convert_clip_vision,
            load_safetensors_dir,
        )
        from ..models.config import CLIP_VIT_B32_VISION, CLIPTextConfig

        sd = load_safetensors_dir(clip_dir)
        text_cfg = CLIPTextConfig(
            hidden_size=512, intermediate_size=2048, num_hidden_layers=12,
            num_attention_heads=8, projection_dim=512,
        )  # CLIP ViT-B/32 text tower
        vision_cfg = CLIP_VIT_B32_VISION
        tokenizer = CLIPTokenizer.from_pretrained(clip_dir)
        text = CLIPTextModel(text_cfg)
        vision = CLIPVisionModel(vision_cfg)
        t_tree = jax.eval_shape(
            lambda: text.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 77), jnp.int32)))
        v_tree = jax.eval_shape(
            lambda: vision.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size,
                           3))))
        tp = {"params": convert_clip_text(sd, text_cfg, t_tree["params"])}
        vp = {"params": convert_clip_vision(sd, v_tree["params"])}
        return cls(tp, vp, tokenizer, text_cfg, vision_cfg)

    @classmethod
    def random_init(cls, seed: int = 0,
                    text_cfg: CLIPTextConfig | None = None,
                    vision_cfg: CLIPVisionConfig | None = None,
                    tokenizer: CLIPTokenizer | None = None):
        tokenizer = tokenizer or CLIPTokenizer.byte_level()
        text_cfg = text_cfg or CLIPTextConfig(
            vocab_size=max(1000, len(tokenizer.encoder)), projection_dim=512
        )
        vision_cfg = vision_cfg or CLIPVisionConfig()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        tp = CLIPTextModel(text_cfg).init(k1, jnp.zeros((1, 77), jnp.int32))
        vp = CLIPVisionModel(vision_cfg).init(
            k2, jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3))
        )
        return cls(tp, vp, tokenizer, text_cfg, vision_cfg)

    @functools.cached_property
    def _embed(self):
        eos = self.tokenizer.eos_token_id

        @jax.jit
        def run(vp, tp, pixels, ids):
            v = self.vision_model.apply(vp, pixels)["projected"]
            t = self.text_model.apply(tp, ids, eos_token_id=eos)
            t = t.get("projected", t["pooled"])
            v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
            t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
            return jnp.einsum("bd,bd->b", v, t)

        return functools.partial(run, self.vision_params, self.text_params)

    def get_clip_score(self, image, text: str) -> float:
        """image: [H,W,3] or [B,H,W,3] uint8/float; returns mean cosine."""
        import numpy as np

        img = jnp.asarray(image)
        if img.ndim == 3:
            img = img[None]
        pixels = preprocess_images(img, self.image_size)
        ids = jnp.asarray(self.tokenizer([text] * pixels.shape[0]))
        return float(np.mean(np.asarray(self._embed(pixels, ids))))
