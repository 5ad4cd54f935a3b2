"""Attention op tests: Pallas flash kernel vs einsum oracle (interpret mode
on CPU), cross-attention font-size reweighting vs the reference algorithm."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rich_text_to_image_tpu.ops.attention import (
    attention_with_probs,
    cross_attention,
    flash_attention,
    make_token_weight_vectors,
)


def _oracle(q, k, v, scale=None):
    d = q.shape[-1]
    scale = scale or 1.0 / math.sqrt(d)
    s = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64)) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64)), p


@pytest.mark.parametrize(
    "b,h,sq,skv,d",
    [
        (1, 2, 256, 256, 64),
        (2, 2, 128, 128, 40),  # SD 64²-res head dim, unaligned D
        (1, 1, 300, 300, 64),  # unaligned seq
        (1, 2, 256, 77, 64),  # cross-attn shaped (padded kv mask path)
        (1, 1, 64, 512, 160),  # D > 128
    ],
)
def test_flash_matches_oracle(b, h, sq, skv, d):
    rng = np.random.RandomState(0)
    q = rng.randn(b, h, sq, d).astype(np.float32)
    k = rng.randn(b, h, skv, d).astype(np.float32)
    v = rng.randn(b, h, skv, d).astype(np.float32)
    want, _ = _oracle(q, k, v)
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            block_q=128, block_k=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_injection_equivalence():
    """flash(q_ref, k_ref, v_region) == probs(q_ref,k_ref) @ v_region —
    the stored-(Q,K) injection design vs the reference's stored-probs."""
    rng = np.random.RandomState(1)
    q = rng.randn(1, 2, 128, 64).astype(np.float32)
    k = rng.randn(1, 2, 128, 64).astype(np.float32)
    v_region = rng.randn(1, 2, 128, 64).astype(np.float32)
    _, probs = _oracle(q, k, v_region)
    want = np.einsum("bhqk,bhkd->bhqd", probs, v_region.astype(np.float64))
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v_region),
            block_q=128, block_k=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "b,h,sq,skv,d",
    [
        (1, 2, 256, 256, 64),
        (2, 2, 128, 128, 40),  # SD 64²-res head dim, unaligned D
        (1, 1, 300, 300, 64),  # unaligned seq → padded-KV mask path
        (1, 2, 256, 77, 64),  # cross-attn shaped
        (1, 1, 64, 512, 160),  # D > 128
        (1, 2, 256, 256, 128),  # lane-aligned D → classic (untransposed) path
        (2, 2, 1024, 1024, 80),  # the auto-dispatch transposed-kernel bucket
    ],
)
@pytest.mark.parametrize("fullrow", [None, "transposed"])
def test_fullrow_path_matches_oracle(b, h, sq, skv, d, fullrow):
    """block_q=None routes through the full-row softmax kernel at these
    VMEM-resident sizes; verify against the same oracle. fullrow=None is
    the production auto-dispatch (classic everywhere except the measured
    d=80/S≤1024 win bucket); "transposed" forces the K-major lane-padding
    kernel at every D<128 shape so its masking/pad paths stay covered."""
    if fullrow == "transposed" and d % 128 == 0:
        pytest.skip("transposed kernel only exists for lane-padded D")
    rng = np.random.RandomState(7)
    q = rng.randn(b, h, sq, d).astype(np.float32)
    k = rng.randn(b, h, skv, d).astype(np.float32)
    v = rng.randn(b, h, skv, d).astype(np.float32)
    want, _ = _oracle(q, k, v)
    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True,
            _fullrow=fullrow,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("d", [40, 64])
def test_fullrow_transposed_bf16(d):
    """The transposed full-row kernel in bf16: V's sublane dim pads to the
    16-row bf16 tile (40→48), the riskiest layout in the D<128 lane-padding
    harvest. Parity vs a bf16-input fp32-softmax oracle at bf16 tolerance,
    and explicit coverage of the padded-KV row mask (skv=300)."""
    rng = np.random.RandomState(11)
    b, h, sq, skv = 2, 2, 128, 300
    q = rng.randn(b, h, sq, d).astype(np.float32)
    k = rng.randn(b, h, skv, d).astype(np.float32)
    v = rng.randn(b, h, skv, d).astype(np.float32)
    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    want, _ = _oracle(
        np.asarray(qb, np.float32), np.asarray(kb, np.float32),
        np.asarray(vb, np.float32))
    got = np.asarray(
        flash_attention(qb, kb, vb, interpret=True, _fullrow="transposed"),
        np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)


@pytest.mark.parametrize("b,h,sq,skv,d", [
    (2, 4, 256, 256, 40),
    (1, 3, 300, 300, 64),  # unaligned seq + odd head count
])
def test_flash_avg_probs_matches_oracle(b, h, sq, skv, d):
    """Capture-fused kernel: out + head-averaged probs, no [B,H,S,S] in HBM."""
    from rich_text_to_image_tpu.ops.attention import flash_attention_avg_probs

    rng = np.random.RandomState(11)
    q = rng.randn(b, h, sq, d).astype(np.float32)
    k = rng.randn(b, h, skv, d).astype(np.float32)
    v = rng.randn(b, h, skv, d).astype(np.float32)
    want_out, want_p = _oracle(q, k, v)
    out, pavg = flash_attention_avg_probs(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pavg), want_p.mean(axis=1), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pavg).sum(-1), 1.0, rtol=1e-4)


def test_attention_with_probs():
    rng = np.random.RandomState(2)
    q = rng.randn(2, 2, 64, 40).astype(np.float32)
    k = rng.randn(2, 2, 64, 40).astype(np.float32)
    v = rng.randn(2, 2, 64, 40).astype(np.float32)
    out, p = attention_with_probs(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want_out, want_p = _oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p), want_p, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-5)


def _reference_fontsize(s, word_pos, font_size):
    """Literal port of attention_processor.py:386-399 for the oracle."""
    s = s - s.max(-1, keepdims=True)
    e = np.exp(s)
    w = np.asarray(font_size, dtype=np.float64)
    e[..., word_pos] = e[..., word_pos] * np.abs(w)
    p = e / e.sum(-1, keepdims=True)
    p[..., word_pos] *= np.sign(w)
    return p


def test_cross_attention_fontsize_parity():
    rng = np.random.RandomState(3)
    b, h, sq, skv, d = 1, 2, 32, 77, 40
    q = rng.randn(b, h, sq, d).astype(np.float32)
    k = rng.randn(b, h, skv, d).astype(np.float32)
    v = rng.randn(b, h, skv, d).astype(np.float32)
    word_pos = np.array([3, 4, 9])
    font_size = np.array([5.0, 5.0, -2.0])

    scale = 1.0 / math.sqrt(d)
    s = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64)) * scale
    want_p = _reference_fontsize(s, word_pos, font_size)
    want_out = np.einsum("bhqk,bhkd->bhqd", want_p, v.astype(np.float64))

    tw, ts = make_token_weight_vectors(word_pos, font_size, skv)
    out, p = cross_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        token_weights=tw, token_signs=ts, return_probs=True,
    )
    np.testing.assert_allclose(np.asarray(p), want_p, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=2e-4, atol=2e-5)
    # strike-through token must have negative attention mass
    assert np.all(np.asarray(p)[..., 9] <= 0)


def test_cross_attention_no_weights_is_softmax():
    rng = np.random.RandomState(4)
    q = rng.randn(1, 1, 16, 64).astype(np.float32)
    k = rng.randn(1, 1, 77, 64).astype(np.float32)
    v = rng.randn(1, 1, 77, 64).astype(np.float32)
    out = cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want, _ = _oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)


def test_make_token_weight_vectors_none():
    assert make_token_weight_vectors(None, None) == (None, None)
    assert make_token_weight_vectors([], []) == (None, None)
