"""Mesh / sharding / training-step tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.parallel.mesh import (
    batch_spec,
    make_mesh,
    param_spec,
    shard_params,
)
from rich_text_to_image_tpu.training.train_step import make_train_step


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}
    mesh2 = make_mesh(8, tp=2)
    assert dict(mesh2.shape) == {"dp": 4, "tp": 2}
    mesh3 = make_mesh(1)
    assert dict(mesh3.shape) == {"dp": 1, "tp": 1}
    # multi-host: outermost dcn axis; batch crosses it, params never do
    mesh4 = make_mesh(8, tp=2, dcn=2)
    assert dict(mesh4.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    assert batch_spec(mesh4) == P(("dcn", "dp"))
    assert batch_spec(mesh) == P("dp")
    assert param_spec((64, 128), mesh4) == P(None, "tp")


def test_param_spec_rules():
    mesh = make_mesh(8)  # tp=4
    # wide output dim → sharded on tp
    assert param_spec((64, 128), mesh) == P(None, "tp")
    # small / indivisible dims → replicated
    assert param_spec((8,), mesh) == P()
    assert param_spec((16, 30), mesh) == P()


@pytest.mark.slow
def test_train_step_sharded_runs_and_reduces_loss():
    mesh = make_mesh(8)
    init_fn, train_step = make_train_step(cfg.TINY_UNET, learning_rate=1e-3,
                                          dtype=jnp.float32)
    state = init_fn(jax.random.PRNGKey(0), latent_hw=(8, 8))
    pspec = shard_params(state.params, mesh)
    state = state._replace(params=jax.device_put(state.params, pspec))

    bsh = NamedSharding(mesh, batch_spec(mesh))
    B = 4
    latents = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, 8, 8, 4)), bsh)
    ehs = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (B, 77, 32)), bsh)

    step = jax.jit(train_step)
    losses = []
    for i in range(3):
        state, loss = step(state, latents, ehs, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # optimizing the same batch must reduce loss
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_sharded_unet_forward_matches_single_device():
    """DP-sharded batched forward == replicated forward (collectives sound)."""
    from rich_text_to_image_tpu.models.init_utils import fast_init
    from rich_text_to_image_tpu.models.unet import UNet2DCondition

    mesh = make_mesh(8, tp=1)  # dp=8
    model = UNet2DCondition(cfg.TINY_UNET, dtype=jnp.float32)
    params = fast_init(
        model, 0, jnp.zeros((1, 8, 8, 4)), jnp.int32(0),
        jnp.zeros((1, 77, 32)),
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(4), (8, 77, 32))

    eps_ref, _ = jax.jit(
        lambda p, x, e: model.apply(p, x, jnp.int32(500), e)
    )(params, x, ehs)

    bsh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    xs = jax.device_put(x, bsh)
    es = jax.device_put(ehs, bsh)
    ps = jax.device_put(params, jax.tree.map(lambda _: rep, params))
    eps_sh, _ = jax.jit(
        lambda p, x, e: model.apply(p, x, jnp.int32(500), e)
    )(ps, xs, es)
    np.testing.assert_allclose(
        np.asarray(eps_sh), np.asarray(eps_ref), rtol=2e-4, atol=1e-5
    )


@pytest.mark.slow
def test_dcn_mesh_forward_matches_single_device():
    """(dcn, dp, tp) hybrid mesh == single device: the multi-host design
    (params replicated over dcn, batch sharded over ("dcn","dp"), tensor
    collectives confined to tp) must be output-exact. Simulated on the
    8-device CPU platform; on real pods the same specs ride a
    create_hybrid_device_mesh layout."""
    from rich_text_to_image_tpu.models.init_utils import fast_init
    from rich_text_to_image_tpu.models.unet import UNet2DCondition

    mesh = make_mesh(8, tp=2, dcn=2)  # dcn=2, dp=2, tp=2
    model = UNet2DCondition(cfg.TINY_UNET, dtype=jnp.float32)
    params = fast_init(
        model, 0, jnp.zeros((1, 8, 8, 4)), jnp.int32(0),
        jnp.zeros((1, 77, 32)),
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(6), (8, 77, 32))

    eps_ref, _ = jax.jit(
        lambda p, x, e: model.apply(p, x, jnp.int32(500), e)
    )(params, x, ehs)

    bsh = NamedSharding(mesh, batch_spec(mesh))
    xs = jax.device_put(x, bsh)
    es = jax.device_put(ehs, bsh)
    ps = jax.device_put(params, shard_params(params, mesh))
    eps_sh, _ = jax.jit(
        lambda p, x, e: model.apply(p, x, jnp.int32(500), e)
    )(ps, xs, es)
    np.testing.assert_allclose(
        np.asarray(eps_sh), np.asarray(eps_ref), rtol=2e-4, atol=1e-5
    )
