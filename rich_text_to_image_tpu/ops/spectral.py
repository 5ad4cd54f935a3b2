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


def _topk_eigvecs_subspace(key, M: jnp.ndarray, k: int, iters: int = 100):
    """Top-k eigenvectors of symmetric M by subspace iteration.

    M's spectrum here lives in [-1, 1] (normalized affinity), and only the
    *subspace* feeds k-means, so Rayleigh-Ritz on an oversampled basis
    after `iters` power steps is ample. O(iters · N²·(k+p)) — far cheaper
    than dense eigh at N=1024, and (unlike eigh) lowers to a small
    matmul+QR program that compiles in seconds on TPU.
    """
    n = M.shape[0]
    # oversampled basis, clamped to n: reduced QR of an [n, p>n] basis
    # returns [n, n] and breaks the fori_loop carry (tiny-model benchmarks
    # run the protocol's k=9 on 16-node affinities)
    p = min(k + max(4, k), n)
    V = jax.random.normal(key, (n, p), M.dtype)
    # Shift to make the operator PSD: M + I has the same eigenvectors and
    # keeps power iteration from cancelling the algebraically-largest ones.
    def body(_, V):
        V = M @ V + V
        q, _ = jnp.linalg.qr(V)
        return q
    V = jax.lax.fori_loop(0, iters, body, V)
    T = V.T @ (M @ V)
    _, U = jnp.linalg.eigh(0.5 * (T + T.T))
    return (V @ U)[:, -k:]


@functools.partial(
    jax.jit, static_argnames=("num_segments", "n_init", "iters", "method")
)
def _spectral_cluster_impl(
    key,
    affinity: jnp.ndarray,  # [N, N], nonnegative
    num_segments: int,
    n_init: int = 100,
    iters: int = 50,
    method: str = "eigh",
) -> jnp.ndarray:
    W = affinity.astype(jnp.float32)
    W = 0.5 * (W + W.T)
    d = jnp.maximum(W.sum(axis=1), 1e-12)
    inv_sqrt_d = jax.lax.rsqrt(d)
    M = W * inv_sqrt_d[:, None] * inv_sqrt_d[None, :]
    if method == "subspace":
        k_eig, k_km = jax.random.split(key)
        vecs = _topk_eigvecs_subspace(k_eig, M, num_segments)
        key = k_km
    else:
        # eigh returns ascending eigenvalues; take the top-k eigenvectors
        _, vecs = jnp.linalg.eigh(M)
        vecs = vecs[:, -num_segments:]
    emb = vecs * inv_sqrt_d[:, None]  # sklearn diffusion-map recovery
    return kmeans(key, emb, num_segments, n_init=n_init, iters=iters)


def spectral_cluster(key, affinity, num_segments: int, n_init: int = 100,
                     iters: int = 50, device: str = "cpu",
                     method: str = "eigh"):
    """Spectral clustering.

    device="cpu" (default): host CPU backend — a dense TPU ``eigh``
    lowering is enormous to compile (minutes through a remote-compile
    relay), so with method="eigh" the accelerator buys nothing. Pass
    device=None to stay on the default backend.

    method="subspace": Rayleigh-Ritz subspace iteration instead of dense
    eigh — same labels (tested vs sklearn), ~5× less FLOPs at N=1024, and
    small enough to compile fast on TPU; pair with device=None on a TPU
    backend to move the whole segmentation off the host.
    """
    if device is None:
        return _spectral_cluster_impl(key, affinity, num_segments,
                                      n_init=n_init, iters=iters,
                                      method=method)
    with jax.default_device(jax.local_devices(backend=device)[0]):
        return _spectral_cluster_impl(
            jax.device_put(key), jnp.asarray(affinity), num_segments,
            n_init=n_init, iters=iters, method=method,
        )
