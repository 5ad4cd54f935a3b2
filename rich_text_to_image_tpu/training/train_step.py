"""Diffusion fine-tuning step (epsilon-prediction MSE) under a device mesh.

A capability the reference lacks entirely (inference-only, SURVEY §2); added
so the framework supports fine-tuning SD-class UNets on TPU pods: DP over
the batch axis, TP over weight output channels (parallel/mesh.py rules), all
collectives inserted by GSPMD over ICI.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.config import UNetConfig
from ..models.unet import UNet2DCondition
from ..schedulers.common import make_alphas_cumprod


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_train_step(
    unet_cfg: UNetConfig,
    learning_rate: float = 1e-5,
    dtype=jnp.bfloat16,
):
    """Returns (init_fn, train_step_fn) for DSM training of the UNet.

    train_step(state, latents [B,h,w,4], ehs [B,77,D], rng) → (state, loss).
    Shard ``latents``/``ehs`` over dp and params via parallel.mesh rules;
    the step is pjit-compatible as-is (pure function of pytrees).
    """
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    tx = optax.adamw(learning_rate, weight_decay=1e-2)
    alphas = jnp.asarray(make_alphas_cumprod(), dtype=jnp.float32)

    def init_fn(rng, latent_hw=(64, 64)):
        params = unet.init(
            rng,
            jnp.zeros((1, *latent_hw, unet_cfg.in_channels)),
            jnp.int32(0),
            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
        )
        return TrainState(params, tx.init(params), jnp.int32(0))

    def loss_fn(params, latents, ehs, rng):
        B = latents.shape[0]
        rt, rn = jax.random.split(rng)
        t = jax.random.randint(rt, (B,), 0, 1000)
        noise = jax.random.normal(rn, latents.shape, dtype=latents.dtype)
        a = alphas[t][:, None, None, None]
        x_t = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
        eps, _ = unet.apply(params, x_t, t, ehs)
        return jnp.mean((eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)

    def train_step(state: TrainState, latents, ehs, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, latents, ehs, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, train_step
