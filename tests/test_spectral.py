"""Spectral clustering / k-means tests vs the sklearn oracle.

Equivalence criterion: permutation-equivalent labels (adjusted Rand ≈ 1) on
block-structured affinities like the self-attention maps the token mapper
feeds in — the contract stated in SURVEY §7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rich_text_to_image_tpu.ops.kmeans import kmeans
from rich_text_to_image_tpu.ops.spectral import spectral_cluster


def _block_affinity(rng, sizes, noise=0.05):
    n = sum(sizes)
    A = rng.rand(n, n) * noise
    start = 0
    for s in sizes:
        A[start : start + s, start : start + s] += 1.0
        start += s
    # asymmetric perturbation, like attention maps
    A += rng.rand(n, n) * 0.01
    return A.astype(np.float32)


def _rand_index(a, b):
    a, b = np.asarray(a), np.asarray(b)
    same_a = a[:, None] == a[None, :]
    same_b = b[:, None] == b[None, :]
    return (same_a == same_b).mean()


def test_kmeans_separates_blobs():
    rng = np.random.RandomState(0)
    x = np.concatenate([
        rng.randn(50, 2) * 0.1 + [0, 0],
        rng.randn(50, 2) * 0.1 + [5, 5],
        rng.randn(50, 2) * 0.1 + [0, 5],
    ]).astype(np.float32)
    labels = np.asarray(kmeans(jax.random.PRNGKey(0), jnp.asarray(x), 3, n_init=10))
    want = np.repeat([0, 1, 2], 50)
    assert _rand_index(labels, want) == 1.0


@pytest.mark.slow
@pytest.mark.parametrize("method", ["eigh", "subspace"])
def test_spectral_matches_sklearn_blocks(method):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.cluster import SpectralClustering

    rng = np.random.RandomState(1)
    A = _block_affinity(rng, [40, 30, 30, 28])
    sc = SpectralClustering(
        4, affinity="precomputed", n_init=10, assign_labels="kmeans",
        random_state=0,
    )
    want = sc.fit_predict(A)
    got = np.asarray(
        spectral_cluster(jax.random.PRNGKey(0), jnp.asarray(A), 4, n_init=10,
                         method=method)
    )
    ri = _rand_index(got, want)
    assert ri > 0.98, f"rand index {ri}"


@pytest.mark.parametrize("method", ["eigh", "subspace"])
def test_spectral_attentionlike_affinity(method):
    """Affinity built like the real one: row-stochastic self-attention."""
    sklearn = pytest.importorskip("sklearn")
    from sklearn.cluster import SpectralClustering

    rng = np.random.RandomState(2)
    A = _block_affinity(rng, [100, 80, 76])
    A = A / A.sum(-1, keepdims=True)  # attention rows sum to 1
    A = A * 32  # step-summed scale (reference never divides by steps)
    want = SpectralClustering(
        3, affinity="precomputed", n_init=10, assign_labels="kmeans",
        random_state=0,
    ).fit_predict(A)
    got = np.asarray(
        spectral_cluster(jax.random.PRNGKey(1), jnp.asarray(A), 3, n_init=10,
                         method=method)
    )
    ri = _rand_index(got, want)
    assert ri > 0.98, f"rand index {ri}"


@pytest.mark.slow
def test_spectral_subspace_equals_eigh_on_big_affinity():
    """1024²-scale affinity (the real segmentation size): the subspace
    solver must reproduce the dense-eigh labels up to permutation."""
    rng = np.random.RandomState(5)
    A = _block_affinity(rng, [300, 260, 240, 224])
    A = A / A.sum(-1, keepdims=True) * 32
    l_eigh = np.asarray(spectral_cluster(
        jax.random.PRNGKey(3), jnp.asarray(A), 4, n_init=10, method="eigh"))
    l_sub = np.asarray(spectral_cluster(
        jax.random.PRNGKey(3), jnp.asarray(A), 4, n_init=10,
        method="subspace"))
    ri = _rand_index(l_eigh, l_sub)
    assert ri > 0.99, f"rand index {ri}"


def test_spectral_scale_invariance():
    rng = np.random.RandomState(3)
    A = _block_affinity(rng, [50, 50])
    l1 = np.asarray(spectral_cluster(jax.random.PRNGKey(2), jnp.asarray(A), 2, n_init=5))
    l2 = np.asarray(
        spectral_cluster(jax.random.PRNGKey(2), jnp.asarray(A * 41.0), 2, n_init=5)
    )
    assert _rand_index(l1, l2) == 1.0


def test_spectral_deterministic():
    rng = np.random.RandomState(4)
    A = _block_affinity(rng, [30, 30, 30])
    l1 = np.asarray(spectral_cluster(jax.random.PRNGKey(7), jnp.asarray(A), 3, n_init=5))
    l2 = np.asarray(spectral_cluster(jax.random.PRNGKey(7), jnp.asarray(A), 3, n_init=5))
    np.testing.assert_array_equal(l1, l2)


def test_subspace_k_near_n_tiny_affinity():
    """Protocol k (num_segments=9) on a tiny 16-node affinity (FIXTURE-model
    benchmarks: latent 8 → seg res 4): the oversampled basis must clamp to
    n or reduced QR shrinks the fori_loop carry (regression, round 4)."""
    rng = np.random.RandomState(0)
    A = _block_affinity(rng, [6, 5, 5])
    got = np.asarray(
        spectral_cluster(jax.random.PRNGKey(0), jnp.asarray(A), 9, n_init=5,
                         method="subspace"))
    assert got.shape == (16,)
    assert len(np.unique(got)) <= 9
