"""Weight-conversion tests.

1. Full-stack CLIP oracle: a random-initialized transformers CLIPTextModel's
   state dict converts into our flax tree and both models agree numerically.
2. Conv/Dense layout micro-oracles vs torch.
3. UNet/VAE converter roundtrip: a synthetic HF-named state dict derived
   from our own tree converts back leaf-for-leaf (catches naming drift).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.models.clip import CLIPTextModel
from rich_text_to_image_tpu.models.convert import (
    _flatten,
    _unet_rule,
    _vae_rule,
    convert_clip_text,
    convert_unet,
    convert_vae,
)
from rich_text_to_image_tpu.models.unet import UNet2DCondition
from rich_text_to_image_tpu.models.vae import AutoencoderKL

torch = pytest.importorskip("torch")


@pytest.mark.slow  # transformers oracle — full-suite lane
def test_clip_text_vs_transformers_full():
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        bos_token_id=98,
        eos_token_id=99,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    ours_cfg = cfg.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
    )
    model = CLIPTextModel(ours_cfg)
    ids = np.array([[98, 5, 6, 7, 99, 99, 99]], dtype=np.int32)
    tree = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params = {"params": convert_clip_text(sd, ours_cfg, tree["params"])}

    with torch.no_grad():
        hf_out = hf(torch.from_numpy(ids).long(), output_hidden_states=True)
    ours = model.apply(params, jnp.asarray(ids), eos_token_id=99)

    np.testing.assert_allclose(
        np.asarray(ours["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours["penultimate"]),
        hf_out.hidden_states[-2].numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pooled"]), hf_out.pooler_output.numpy(),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow  # transformers oracle — full-suite lane
def test_clip_projection_vs_transformers():
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu", projection_dim=24,
        bos_token_id=98, eos_token_id=99,
    )
    torch.manual_seed(1)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    ours_cfg = cfg.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
        projection_dim=24,
    )
    model = CLIPTextModel(ours_cfg)
    ids = np.array([[98, 11, 12, 99, 99]], dtype=np.int32)
    tree = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params = {"params": convert_clip_text(sd, ours_cfg, tree["params"])}

    with torch.no_grad():
        hf_out = hf(torch.from_numpy(ids).long())
    ours = model.apply(params, jnp.asarray(ids), eos_token_id=99)
    np.testing.assert_allclose(
        np.asarray(ours["projected"]), hf_out.text_embeds.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_conv_layout_vs_torch():
    """NCHW/OIHW torch conv == our NHWC/HWIO after converter transpose."""
    torch.manual_seed(2)
    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
    x = torch.randn(1, 3, 9, 9)
    with torch.no_grad():
        want = tconv(x).numpy()  # [1,5,5,5]

    import flax.linen as nn

    conv = nn.Conv(5, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    kernel = jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))
    bias = jnp.asarray(tconv.bias.detach().numpy())
    got = conv.apply(
        {"params": {"kernel": kernel, "bias": bias}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
    )


def test_groupnorm_vs_torch():
    torch.manual_seed(3)
    tgn = torch.nn.GroupNorm(4, 8, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.randn(8))
        tgn.bias.copy_(torch.randn(8))
    x = torch.randn(2, 8, 4, 4)
    with torch.no_grad():
        want = tgn(x).numpy()

    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    got = gn.apply(
        {"params": {"scale": jnp.asarray(tgn.weight.detach().numpy()),
                    "bias": jnp.asarray(tgn.bias.detach().numpy())}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
    )


def _fake_source_from_tree(tree, rule):
    """Inverse-transform our tree into an HF-named numpy state dict."""
    src = {}
    for path, leaf in _flatten(tree).items():
        a = np.asarray(leaf)
        if path[-1] == "kernel":
            a = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a.transpose(1, 0)
        src[rule(path)] = a
    return src


@pytest.mark.slow
def test_unet_converter_roundtrip():
    model = UNet2DCondition(cfg.TINY_UNET)
    tree = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.int32(0),
        jnp.zeros((1, 77, 32)),
    )["params"]
    src = _fake_source_from_tree(tree, _unet_rule)
    # sanity: names look like diffusers names
    assert any(k.startswith("down_blocks.0.resnets.0.conv1") for k in src)
    assert any(".transformer_blocks.0.attn1.to_q.weight" in k for k in src)
    assert any(".ff.net.0.proj.weight" in k for k in src)
    out = convert_unet(src, cfg.TINY_UNET, tree)
    for path, leaf in _flatten(out).items():
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(_flatten(tree)[path]), err_msg=str(path)
        )


@pytest.mark.slow
def test_vae_converter_roundtrip():
    model = AutoencoderKL(cfg.TINY_VAE)
    tree = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    src = _fake_source_from_tree(tree, _vae_rule)
    assert any(k.startswith("encoder.down_blocks.0.resnets.0") for k in src)
    assert any(k.startswith("decoder.up_blocks.0.upsamplers.0.conv") for k in src)
    assert "quant_conv.weight" in src and "post_quant_conv.weight" in src
    assert any("mid_block.attentions.0.to_out.0.weight" in k for k in src)
    out = convert_vae(src, cfg.TINY_VAE, tree)
    for path, leaf in _flatten(out).items():
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(_flatten(tree)[path]), err_msg=str(path)
        )
