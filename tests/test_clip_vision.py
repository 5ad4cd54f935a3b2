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
    """Via the library converter (models/convert.py)."""
    from rich_text_to_image_tpu.models.convert import convert_clip_vision

    cfg_tiny = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
    )
    model = CLIPVisionModel(cfg_tiny)
    tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    return {"params": convert_clip_vision(sd, tree["params"])}


@pytest.mark.slow  # transformers oracle — full-suite lane
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
