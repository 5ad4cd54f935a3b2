"""CLIP vision tower vs transformers oracle (converted random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rich_text_to_image_tpu.models.clip_vision import (
    CLIPVisionModel,
    preprocess_images,
)
from rich_text_to_image_tpu.models.config import CLIPVisionConfig

torch = pytest.importorskip("torch")


def _convert_vision(sd):
    """HF CLIPVisionModelWithProjection state dict → our param tree."""
    import re

    out = {"params": {}}
    p = out["params"]

    def put(path, arr):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(arr)

    put(("patch_embedding", "kernel"),
        sd["vision_model.embeddings.patch_embedding.weight"]
        .transpose(2, 3, 1, 0))
    put(("class_embedding",), sd["vision_model.embeddings.class_embedding"])
    put(("position_embedding",),
        sd["vision_model.embeddings.position_embedding.weight"])
    put(("pre_layrnorm", "scale"), sd["vision_model.pre_layrnorm.weight"])
    put(("pre_layrnorm", "bias"), sd["vision_model.pre_layrnorm.bias"])
    put(("post_layernorm", "scale"), sd["vision_model.post_layernorm.weight"])
    put(("post_layernorm", "bias"), sd["vision_model.post_layernorm.bias"])
    put(("visual_projection", "kernel"),
        sd["visual_projection.weight"].transpose(1, 0))
    n_layers = max(
        int(m.group(1)) + 1
        for k in sd
        if (m := re.match(r"vision_model\.encoder\.layers\.(\d+)\.", k))
    )
    for i in range(n_layers):
        pre = f"vision_model.encoder.layers.{i}."
        for ours, theirs in [
            (("self_attn", "q_proj"), "self_attn.q_proj"),
            (("self_attn", "k_proj"), "self_attn.k_proj"),
            (("self_attn", "v_proj"), "self_attn.v_proj"),
            (("self_attn", "out_proj"), "self_attn.out_proj"),
            (("fc1",), "mlp.fc1"),
            (("fc2",), "mlp.fc2"),
        ]:
            put((f"layers_{i}", *ours, "kernel"),
                sd[pre + theirs + ".weight"].transpose(1, 0))
            put((f"layers_{i}", *ours, "bias"), sd[pre + theirs + ".bias"])
        for ln in ("layer_norm1", "layer_norm2"):
            put((f"layers_{i}", ln, "scale"), sd[pre + ln + ".weight"])
            put((f"layers_{i}", ln, "bias"), sd[pre + ln + ".bias"])
    return out


def test_vs_transformers():
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
    )
    model = CLIPVisionModel(cfg)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    params = _convert_vision(sd)
    ours = model.apply(params, jnp.asarray(x))

    with torch.no_grad():
        hf_out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours["projected"]), hf_out.image_embeds.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_preprocess_shapes():
    imgs = np.random.RandomState(1).randint(0, 255, (2, 64, 48, 3), np.uint8)
    out = preprocess_images(imgs, 224)
    assert out.shape == (2, 224, 224, 3)
    assert float(jnp.abs(out).max()) < 4  # normalized range
