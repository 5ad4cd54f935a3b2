"""Pallas kernel semantics under a sharded mesh.

Every other mesh test exercises the XLA attention path (the CPU backend
veto in models/unet.py:_use_flash); these run the *Pallas* kernels in
interpret mode under a (dp, tp) mesh and pin:

  * the custom_partitioning rules (ops/attention.py): batch/head/q-seq
    shardings flow through ``flash_attention`` unchanged (local compute,
    no gathers), the capture kernel replicates heads (its in-VMEM head
    average needs them all) — numerics equal to the XLA reference either
    way;
  * the full rich pass with the kernels forced on (models.unet.force_flash)
    matches the XLA path under dp=4 × tp=2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rich_text_to_image_tpu.models import unet as unet_mod
from rich_text_to_image_tpu.ops.attention import (
    attention_with_probs,
    flash_attention,
    flash_attention_avg_probs,
)
from rich_text_to_image_tpu.parallel.mesh import make_mesh


@pytest.fixture
def forced_flash():
    unet_mod.force_flash(True)
    yield
    unet_mod.force_flash(False)


def _qkv(b=4, h=4, s=256, d=32, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(b, h, s, d), jnp.float32) for _ in range(3)
    )


def test_flash_partitions_over_batch_and_heads():
    mesh = make_mesh(8, tp=2)  # dp=4, tp=2
    q, k, v = _qkv()
    sh = NamedSharding(mesh, P("dp", "tp"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    out = jax.jit(lambda a, b, c: flash_attention(a, b, c, interpret=True))(
        qs, ks, vs
    )
    ref, _ = attention_with_probs(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # batch/head shardings flow THROUGH the kernel (no forced replication)
    assert tuple(out.sharding.spec)[:2] == ("dp", "tp")


@pytest.mark.parametrize("fullrow", ["classic", "transposed"])
def test_flash_fullrow_force_survives_mesh_dispatch(fullrow, monkeypatch):
    """The _fullrow bench knob must reach the kernel through the
    custom_partitioning wrapper (device_count > 1) — otherwise forced A/B
    runs on multi-chip hosts silently measure the auto dispatch twice.
    Both layouts are numerically identical, so this pins the knob itself:
    _flash_impl must SEE the forced value (recorded via monkeypatch), and
    the result must still match the XLA reference."""
    from rich_text_to_image_tpu.ops import attention as attn_mod

    seen = []
    real_impl = attn_mod._flash_impl

    def recording_impl(q, k, v, scale, block_q, block_k, interpret,
                       fullrow_arg=None):
        seen.append(fullrow_arg)
        return real_impl(q, k, v, scale, block_q, block_k, interpret,
                         fullrow_arg)

    monkeypatch.setattr(attn_mod, "_flash_impl", recording_impl)
    attn_mod._flash_cp.cache_clear()  # cached closures hold _flash_impl refs

    mesh = make_mesh(8, tp=2)
    q, k, v = _qkv(d=40)  # lane-padded head dim, both layouts valid
    sh = NamedSharding(mesh, P("dp", "tp"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: flash_attention(
        a, b, c, interpret=True, _fullrow=fullrow))(qs, ks, vs)
    ref, _ = attention_with_probs(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert seen and all(f == fullrow for f in seen), seen
    attn_mod._flash_cp.cache_clear()  # drop entries built on the recorder


def test_flash_qseq_sharding_flows_through():
    mesh = make_mesh(8, tp=2)
    q, k, v = _qkv(b=2, h=2)
    # q-seq rows are independent given full K/V: Sq may shard too
    qs = jax.device_put(q, NamedSharding(mesh, P(None, None, "dp")))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    vs = jax.device_put(v, NamedSharding(mesh, P()))
    out = jax.jit(lambda a, b, c: flash_attention(a, b, c, interpret=True))(
        qs, ks, vs
    )
    ref, _ = attention_with_probs(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_capture_kernel_partitions_under_mesh():
    mesh = make_mesh(8, tp=2)
    q, k, v = _qkv()
    sh = NamedSharding(mesh, P("dp", "tp"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    out, pavg = jax.jit(
        lambda a, b, c: flash_attention_avg_probs(a, b, c, interpret=True)
    )(qs, ks, vs)
    ref_o, ref_p = attention_with_probs(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pavg),
                               np.asarray(jnp.mean(ref_p, axis=1)),
                               rtol=1e-5, atol=1e-6)


def test_flash_inside_jitted_program_with_sharded_params():
    """The kernel inside a larger jitted program (projection → attention →
    projection) with tp-sharded weights — the shape it has inside the UNet,
    where GSPMD propagates head sharding from the QKV projections."""
    mesh = make_mesh(8, tp=2)
    rng = np.random.RandomState(1)
    B, S, H, D = 4, 256, 4, 32
    x = jnp.asarray(rng.randn(B, S, H * D), jnp.float32)
    w = jnp.asarray(rng.randn(H * D, H * D).astype(np.float32) * 0.05)

    def prog(x, w, interpret):
        def split(y):
            return y.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        q, k, v = split(x @ w), split(x @ (w * 0.7)), split(x @ (w * 1.3))
        o = flash_attention(q, k, v, interpret=interpret)
        return o.transpose(0, 2, 1, 3).reshape(B, S, H * D) @ w

    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    out = jax.jit(lambda a, b: prog(a, b, True))(xs, ws)

    def ref_prog(x, w):
        def split(y):
            return y.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        q, k, v = split(x @ w), split(x @ (w * 0.7)), split(x @ (w * 1.3))
        o, _ = attention_with_probs(q, k, v)
        return o.transpose(0, 2, 1, 3).reshape(B, S, H * D) @ w

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_prog(x, w)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_rich_pass_pallas_kernels_under_mesh(forced_flash):
    """Full rich pass (injection on → the kernels run in the QK-injection
    configuration too) with the Pallas path forced, under dp=4 × tp=2,
    against the XLA path single-device run."""
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sd import (
        RegionDiffusion,
        RichControlSpec,
    )

    def make(mesh=None):
        return RegionDiffusion.random_init(
            seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
            text_cfg=cfg.TINY_TEXT, dtype=jnp.float32, mesh=mesh,
        )

    h = cfg.TINY_UNET.sample_size
    px = h * 2 ** (len(cfg.TINY_VAE.block_out_channels) - 1)
    rng = np.random.RandomState(0)
    soft = rng.rand(2, h, h).astype(np.float32)
    soft /= soft.sum(0, keepdims=True)
    masks = [soft[0][None], soft[1][None]]
    latents = jnp.asarray(rng.randn(1, h, h, 4), jnp.float32)
    spec = RichControlSpec(guidance_scale=6.0, inject_selfattn=0.5,
                           inject_background=0.4)

    unet_mod.force_flash(False)
    ref_pipe = make()
    ref_pipe.masks = masks
    embeds = ref_pipe.get_text_embeds(["a red rose", "a garden"], [""])
    out_ref = np.asarray(ref_pipe.produce_latents(
        embeds, height=px, width=px, num_inference_steps=3, latents=latents,
        spec=spec,
    ))

    unet_mod.force_flash(True)
    mesh_pipe = make(mesh=make_mesh(8, tp=2))
    mesh_pipe.masks = masks
    embeds_m = mesh_pipe.get_text_embeds(["a red rose", "a garden"], [""])
    out_pallas = np.asarray(mesh_pipe.produce_latents(
        embeds_m, height=px, width=px, num_inference_steps=3,
        latents=latents, spec=spec,
    ))
    np.testing.assert_allclose(out_pallas, out_ref, rtol=1e-3, atol=1e-4)
