"""Spectral clustering of self-attention affinity — JAX-native.

Replaces the reference's sklearn ``SpectralClustering(num_segments,
affinity='precomputed', n_init=100, assign_labels='kmeans')``
(utils/attention_utils.py:262-264), the single CPU hotspot of the plain
pass. Pipeline (sklearn-equivalent):

  1. symmetrize W ← (W + Wᵀ)/2 (the attention affinity is asymmetric;
     sklearn's ARPACK path implicitly treats it as symmetric),
  2. normalized affinity M = D^{-1/2} W D^{-1/2},
  3. top-k eigenvectors of M (== smallest of the normalized Laplacian),
     via one dense ``eigh`` — a 1024² symmetric eigenproblem, tiny on TPU,
  4. diffusion-map recovery u = v / sqrt(d) (sklearn's norm_laplacian
     back-scaling), NO row normalization (sklearn quirk),
  5. k-means (k-means++ ×n_init, vmapped) on the [N, k] embedding.

Labels are permutation-equivalent to sklearn's, which is all the
token-mapper consumes (cluster → span assignment is recomputed from the
cross-attention scores either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .kmeans import kmeans


@functools.partial(jax.jit, static_argnames=("num_segments", "n_init", "iters"))
def _spectral_cluster_impl(
    key,
    affinity: jnp.ndarray,  # [N, N], nonnegative
    num_segments: int,
    n_init: int = 100,
    iters: int = 50,
) -> jnp.ndarray:
    W = affinity.astype(jnp.float32)
    W = 0.5 * (W + W.T)
    d = jnp.maximum(W.sum(axis=1), 1e-12)
    inv_sqrt_d = jax.lax.rsqrt(d)
    M = W * inv_sqrt_d[:, None] * inv_sqrt_d[None, :]
    # eigh returns ascending eigenvalues; take the top-k eigenvectors
    _, vecs = jnp.linalg.eigh(M)
    emb = vecs[:, -num_segments:]
    emb = emb * inv_sqrt_d[:, None]  # sklearn diffusion-map recovery
    return kmeans(key, emb, num_segments, n_init=n_init, iters=iters)


def spectral_cluster(key, affinity, num_segments: int, n_init: int = 100,
                     iters: int = 50, device: str = "cpu"):
    """Spectral clustering; runs on the host CPU backend by default.

    It executes once per sample on a 1024² matrix — sub-second anywhere —
    but a TPU ``eigh`` lowering is enormous to compile (minutes through a
    remote-compile relay), so the accelerator buys nothing here. Pass
    device=None to stay on the default backend.
    """
    if device is None:
        return _spectral_cluster_impl(key, affinity, num_segments,
                                      n_init=n_init, iters=iters)
    with jax.default_device(jax.local_devices(backend=device)[0]):
        return _spectral_cluster_impl(
            jax.device_put(key), jnp.asarray(affinity), num_segments,
            n_init=n_init, iters=iters,
        )
