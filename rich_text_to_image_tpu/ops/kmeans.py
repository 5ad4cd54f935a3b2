"""K-means with k-means++ init, vmapped over restarts — TPU-native.

Replaces sklearn ``KMeans(n_init=100)`` inside spectral clustering
(reference: utils/attention_utils.py:262-264). All restarts run as one
vmapped program (100 inits × Lloyd iterations as ``lax.scan`` — no host
round-trips), best inertia wins. Labels are permutation-equivalent to
sklearn's, which is the contract the token mapper needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kmeans_pp_init(key, x, k):
    """k-means++ seeding (d² sampling)."""
    n = x.shape[0]
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    d2_0 = jnp.sum((x - x[first]) ** 2, axis=1)

    def body(carry, i):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        # sample proportional to d²
        probs = d2 / jnp.maximum(d2.sum(), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        c = x[idx]
        centers = centers.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((x - c) ** 2, axis=1))
        return (centers, d2, key), None

    (centers, _, _), _ = jax.lax.scan(
        body, (centers0, d2_0, key), jnp.arange(1, k)
    )
    return centers


def _lloyd(x, centers, iters: int):
    def step(centers, _):
        d2 = (
            jnp.sum(x**2, 1, keepdims=True)
            - 2 * x @ centers.T
            + jnp.sum(centers**2, 1)[None]
        )
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, centers.shape[0], dtype=x.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ x
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers
        )
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    d2 = (
        jnp.sum(x**2, 1, keepdims=True)
        - 2 * x @ centers.T
        + jnp.sum(centers**2, 1)[None]
    )
    labels = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return labels, inertia


@functools.partial(jax.jit, static_argnames=("k", "n_init", "iters"))
def kmeans(key, x, k: int, n_init: int = 100, iters: int = 50):
    """Best-of-``n_init`` k-means. x: [N, D] f32 → labels [N] int32."""
    x = x.astype(jnp.float32)
    keys = jax.random.split(key, n_init)

    def one(key):
        centers = _kmeans_pp_init(key, x, k)
        return _lloyd(x, centers, iters)

    labels, inertias = jax.vmap(one)(keys)
    best = jnp.argmin(inertias)
    return labels[best]
