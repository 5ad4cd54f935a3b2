"""UNet / VAE / CLIP model tests on tiny configs (CPU).

No pretrained-weight oracle exists offline, so these verify architecture
invariants: shapes, capture plumbing, injection semantics (self-injecting a
pass's own (Q,K) must be a no-op), control gating, and CLIP vs transformers
with a converted random state dict (see test_convert.py for that).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.models.init_utils import fast_init
from rich_text_to_image_tpu.models.clip import CLIPTextModel
from rich_text_to_image_tpu.models.unet import (
    CaptureSpec,
    UNet2DCondition,
    UNetControls,
)
from rich_text_to_image_tpu.models.vae import AutoencoderKL


@pytest.fixture(scope="module")
def tiny_unet():
    # fast_init, not flax init: eager per-op init of even the tiny UNet
    # costs ~40 s on CPU (160 s on a loaded 4-worker host); these tests
    # check shapes/plumbing/invariants, not checkpoint-exact values.
    model = UNet2DCondition(cfg.TINY_UNET)
    sample = jnp.zeros((1, 8, 8, 4))
    ehs = jnp.zeros((1, 77, cfg.TINY_UNET.cross_attention_dim))
    params = fast_init(model, 0, sample, jnp.int32(0), ehs)
    return model, params


def test_unet_shapes(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 32))
    eps, aux = model.apply(params, x, jnp.int32(500), ehs)
    assert eps.shape == (2, 8, 8, 4)
    assert aux == {}


def test_unet_capture_probs(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 32))
    capture = CaptureSpec(
        self_probs=frozenset({"down_blocks.0.attentions.0.transformer_blocks.0.attn1"}),
        cross_probs=frozenset({"mid_block.attentions.0.transformer_blocks.0.attn2"}),
    )
    eps, aux = model.apply(params, x, jnp.int32(500), ehs, capture=capture)
    sp = aux["self_probs"]["down_blocks.0.attentions.0.transformer_blocks.0.attn1"]
    cp = aux["cross_probs"]["mid_block.attentions.0.transformer_blocks.0.attn2"]
    assert sp.shape == (2, 64, 64)  # head-averaged, 8x8 tokens
    assert cp.shape == (2, 1, 77)  # mid at 1x1 for the tiny config
    np.testing.assert_allclose(np.asarray(sp.sum(-1)), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cp.sum(-1)), 1.0, rtol=1e-4)


def test_unet_capture_qk_and_resnet(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    capture = CaptureSpec(qk=True, resnet=frozenset({"up_blocks.1.resnets.1"}))
    _, aux = model.apply(params, x, jnp.int32(500), ehs, capture=capture)
    assert "up_blocks.1.resnets.1" in aux["resnet_hidden"]
    # every attn1 in the topology contributes a (q, k) pair
    assert all(k.endswith(".attn1") for k in aux["self_qk"])
    n_attn1 = 3 * 2 + 1 + 3 * 3  # 3 cross down-blocks ×2, mid, 3 cross up ×3
    assert len(aux["self_qk"]) == n_attn1


def test_unet_self_injection_noop(tiny_unet):
    """Injecting a pass's own (Q,K) must reproduce that pass exactly —
    the functional equivalent of the reference's replacement hooks being
    identity when fed the same trajectory."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(4), (1, 77, 32))
    eps_plain, aux = model.apply(
        params, x, jnp.int32(300), ehs, capture=CaptureSpec(qk=True)
    )
    controls = UNetControls(
        inject_qk=aux["self_qk"], inject_gate=jnp.asarray(True)
    )
    eps_inj, _ = model.apply(params, x, jnp.int32(300), ehs, controls=controls)
    np.testing.assert_allclose(
        np.asarray(eps_inj), np.asarray(eps_plain), rtol=1e-4, atol=1e-5
    )
    # gate off → also identical to plain (where() takes the computed branch)
    controls_off = UNetControls(
        inject_qk=aux["self_qk"], inject_gate=jnp.asarray(False)
    )
    eps_off, _ = model.apply(params, x, jnp.int32(300), ehs, controls=controls_off)
    np.testing.assert_allclose(
        np.asarray(eps_off), np.asarray(eps_plain), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow  # ~2 min: the fused-batch injection path is also pinned
# by the torch oracles and the mesh parity tests
def test_unet_inbatch_injection_matches_two_forward(tiny_unet):
    """Merged-forward in-batch injection (UNetControls.inject_src/dst) must
    reproduce the reference's two-forward flow exactly: forward A captures
    (Q,K) of every attn1 + the inject-resnet feature of its row `src`;
    forward B injects them into the span rows. One batched forward with
    rows [A..., spans...] and inject_src/dst replaces both."""
    model, params = tiny_unet
    rng = np.random.RandomState(0)
    xa = jnp.asarray(rng.randn(4, 8, 8, 4), jnp.float32)   # uncond,base,ru,rc
    xb = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)   # span rows
    ea = jnp.asarray(rng.randn(4, 77, 32), jnp.float32)
    eb = jnp.asarray(rng.randn(2, 77, 32), jnp.float32)
    t = jnp.int32(300)

    # two-forward flow (capture row 3 → inject into spans)
    capture = CaptureSpec(qk=True, resnet=frozenset({"up_blocks.1.resnets.1"}))
    eps_a, aux = model.apply(params, xa, t, ea, capture=capture)
    inj_qk = {n: (q[3:4], k[3:4]) for n, (q, k) in aux["self_qk"].items()}
    inj_res = {n: f[3:4] for n, f in aux["resnet_hidden"].items()}
    eps_b, _ = model.apply(
        params, xb, t, eb,
        controls=UNetControls(inject_gate=jnp.asarray(True),
                              inject_qk=inj_qk, inject_resnet=inj_res),
    )

    # merged in-batch flow
    xm = jnp.concatenate([xa, xb], axis=0)
    em = jnp.concatenate([ea, eb], axis=0)
    eps_m, _ = model.apply(
        params, xm, t, em,
        controls=UNetControls(inject_gate=jnp.asarray(True),
                              inject_src=3, inject_dst=(4, 6)),
    )
    np.testing.assert_allclose(np.asarray(eps_m[:4]), np.asarray(eps_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_m[4:]), np.asarray(eps_b),
                               rtol=1e-4, atol=1e-5)

    # gate off → merged forward equals the plain batched forward
    eps_plain, _ = model.apply(params, xm, t, em)
    eps_off, _ = model.apply(
        params, xm, t, em,
        controls=UNetControls(inject_gate=jnp.asarray(False),
                              inject_src=3, inject_dst=(4, 6)),
    )
    np.testing.assert_allclose(np.asarray(eps_off), np.asarray(eps_plain),
                               rtol=1e-4, atol=1e-5)


def test_unet_resnet_injection_changes_output(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(6), (1, 77, 32))
    name = "up_blocks.1.resnets.1"
    _, aux = model.apply(
        params, x, jnp.int32(100), ehs, capture=CaptureSpec(resnet=frozenset({name}))
    )
    feat = aux["resnet_hidden"][name]
    # self-injection is a no-op
    eps_plain, _ = model.apply(params, x, jnp.int32(100), ehs)
    eps_self, _ = model.apply(
        params, x, jnp.int32(100), ehs,
        controls=UNetControls(inject_resnet={name: feat},
                              inject_gate=jnp.asarray(True)),
    )
    np.testing.assert_allclose(
        np.asarray(eps_self), np.asarray(eps_plain), rtol=1e-4, atol=1e-5
    )
    # injecting a different feature changes the output
    eps_other, _ = model.apply(
        params, x, jnp.int32(100), ehs,
        controls=UNetControls(inject_resnet={name: feat + 1.0},
                              inject_gate=jnp.asarray(True)),
    )
    assert np.abs(np.asarray(eps_other) - np.asarray(eps_plain)).max() > 1e-4


def test_unet_token_weights_change_output(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(8), (1, 77, 32))
    w = jnp.ones(77).at[5].set(8.0)
    s = jnp.ones(77)
    eps_plain, _ = model.apply(params, x, jnp.int32(100), ehs)
    eps_w, _ = model.apply(
        params, x, jnp.int32(100), ehs,
        controls=UNetControls(token_weights=w, token_signs=s),
    )
    assert np.abs(np.asarray(eps_w) - np.asarray(eps_plain)).max() > 1e-5
    # all-ones weights are a no-op
    eps_1, _ = model.apply(
        params, x, jnp.int32(100), ehs,
        controls=UNetControls(token_weights=jnp.ones(77), token_signs=jnp.ones(77)),
    )
    np.testing.assert_allclose(
        np.asarray(eps_1), np.asarray(eps_plain), rtol=1e-4, atol=1e-5
    )


def test_unet_xl_text_time(tiny_unet):
    model = UNet2DCondition(cfg.TINY_XL_UNET)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 16, 16, 4))
    ehs = jnp.zeros((2, 77, 64))
    added = {
        "text_embeds": jnp.zeros((2, 64)),
        "time_ids": jnp.tile(
            jnp.asarray([[128.0, 128.0, 0.0, 0.0, 128.0, 128.0]]), (2, 1)
        ),
    }
    params = fast_init(model, 0, sample, jnp.int32(0), ehs, added_cond=added)
    eps, _ = model.apply(params, sample, jnp.float32(500.0), ehs, added_cond=added)
    assert eps.shape == (2, 16, 16, 4)


@pytest.mark.slow  # ~3 min on a loaded host; tiny-config coverage of
# encode/decode shapes also rides the pipeline tests
def test_vae_roundtrip_shapes():
    model = AutoencoderKL(cfg.TINY_VAE)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    params = model.init(rng, x)
    z = model.apply(params, x, method=model.encode)
    assert z.shape == (1, 16, 16, 4)  # two levels → /2 once
    y = model.apply(params, z / cfg.TINY_VAE.scaling_factor, method=model.decode)
    assert y.shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_vae_decode_differentiable():
    """Color guidance needs grads through decode (region_diffusion.py:151-168)."""
    model = AutoencoderKL(cfg.TINY_VAE)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 3))
    params = model.init(rng, x)

    def loss(z):
        img = model.apply(params, z, method=model.decode)
        img = jnp.clip(img / 2 + 0.5, 0, 1)
        return jnp.mean((img.mean(axis=(1, 2)) - jnp.asarray([1.0, 0.0, 0.0])) ** 2)

    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    g = jax.grad(loss)(z)
    assert g.shape == z.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_clip_text_shapes_and_pooling():
    model = CLIPTextModel(cfg.TINY_TEXT)
    ids = jnp.asarray([[49, 3, 4, 5, 50, 0, 0]], dtype=jnp.int32)
    params = fast_init(model, 0, ids)
    out = model.apply(params, ids, eos_token_id=50)
    assert out["last_hidden_state"].shape == (1, 7, 32)
    assert out["penultimate"].shape == (1, 7, 32)
    assert out["pooled"].shape == (1, 32)
    # pooled row == last_hidden at the eos position (index 4)
    np.testing.assert_allclose(
        np.asarray(out["pooled"][0]), np.asarray(out["last_hidden_state"][0, 4])
    )


def test_clip_projection_variant():
    c = cfg.CLIPTextConfig(
        vocab_size=100, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, projection_dim=24,
    )
    model = CLIPTextModel(c)
    ids = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    params = fast_init(model, 0, ids)
    out = model.apply(params, ids)
    assert out["projected"].shape == (1, 24)


def test_clip_causal():
    """Changing a later token must not affect earlier positions' activations
    (pre-final-LN penultimate output is causal)."""
    model = CLIPTextModel(cfg.TINY_TEXT)
    ids1 = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    ids2 = jnp.asarray([[1, 2, 3, 9]], dtype=jnp.int32)
    params = fast_init(model, 0, ids1)
    o1 = model.apply(params, ids1)["penultimate"]
    o2 = model.apply(params, ids2)["penultimate"]
    np.testing.assert_allclose(np.asarray(o1[0, :3]), np.asarray(o2[0, :3]),
                               rtol=1e-5)
    assert np.abs(np.asarray(o1[0, 3]) - np.asarray(o2[0, 3])).max() > 1e-4


@pytest.mark.slow  # ~4 min differential remat parity — full-suite lane
def test_vae_decoder_remat_blocks_parity():
    """remat_blocks must not change the param tree, outputs, or gradients —
    only the VJP's memory schedule (models/vae.py Decoder.remat_blocks)."""
    plain = AutoencoderKL(cfg.TINY_VAE)
    remat = AutoencoderKL(cfg.TINY_VAE, remat_blocks=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 3))
    params = plain.init(rng, x)
    # same param tree → the remat module accepts the plain params verbatim
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    y_plain = plain.apply(params, z, method=plain.decode)
    y_remat = remat.apply(params, z, method=remat.decode)
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_remat),
                               rtol=1e-6, atol=1e-6)

    def loss(mod):
        def f(zz):
            img = mod.apply(params, zz, method=mod.decode)
            return jnp.mean(jnp.clip(img / 2 + 0.5, 0, 1) ** 2)
        return f

    g_plain = jax.grad(loss(plain))(z)
    g_remat = jax.grad(loss(remat))(z)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_remat),
                               rtol=1e-5, atol=1e-6)
