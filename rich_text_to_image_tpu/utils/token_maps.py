"""Token-map segmentation: attention maps → per-span soft masks.

Functional re-design of the reference ``get_token_maps``
(utils/attention_utils.py:233-341). Two structural changes, both
math-preserving:

  * Inputs are *aggregated* maps, not per-layer dicts. The reference hooks
    accumulate per-layer step-sums and get_token_maps averages over layers
    after resizing to 32². Resizing is linear, so group sums by resolution
    commute with it: the plain pass carries one [1024,1024] self-attention
    sum (all 32²-res registry layers) and one cross-attention sum per
    resolution group — tiny scan carries instead of per-layer dicts of CPU
    copies (region_diffusion.py:417,426).
  * Spectral clustering is the JAX-native ops.spectral pipeline (labels
    permutation-equivalent to sklearn's; the cluster→span assignment below
    is recomputed from cross-attention scores either way).

Scale invariances (documented in ops/spectral.py and via the min-max
normalization below) make the missing 1/steps factors irrelevant, exactly
as in the reference.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Mapping, Sequence

import jax
import numpy as np

from ..ops.resize import resize_bicubic
from ..ops.spectral import spectral_cluster

SEG_RESOLUTION = 32  # the reference's hardcoded segmentation grid


def host_cpu():
    """Context manager pinning small host-side math to the CPU backend.

    Token-map post-processing is sub-millisecond work on tiny arrays; on a
    remote-compile TPU backend each distinct shape would cost a slow
    compile round-trip for nothing.
    """
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:  # no cpu backend registered (unusual)
        return contextlib.nullcontext()


@dataclasses.dataclass
class AttnAggregates:
    """Aggregated attention maps from the plain pass.

    self_sum: [S32, S32] — sum over (32²-res registry layers × steps>10) of
        cond-row head-averaged self-attention probs.
    self_count: number of (layer, step) contributions in self_sum.
    cross_sums: {resolution: [S_r, 77]} — per-resolution-group sums over
        (registry layers × steps>10) of cond-row head-averaged cross probs.
    cross_layer_count: total number of cross layers contributing (the
        reference divides by the layer count after concatenation).
    """

    self_sum: np.ndarray  # np or a device (jnp) array — kept wherever the
    # plain scan produced it so the TPU segmentation solver reads it with
    # no host round-trip (the host fetch happens lazily only where numpy
    # math actually consumes it, e.g. the save_attn dump)
    self_count: int
    cross_sums: Mapping[int, np.ndarray]
    cross_layer_count: int
    # memo: (seed, num_segments, n_init) → cluster labels. The reference
    # flow segments the SAME affinity twice per sample (color spans, then
    # region spans — sample.py:77,90) with identical seeds; sklearn would
    # redo the clustering, we reuse it.
    cluster_cache: dict = dataclasses.field(
        default_factory=dict, compare=False, repr=False
    )


def get_token_maps(
    agg: AttnAggregates,
    obj_tokens: Sequence[np.ndarray],  # per-span 1-based token-id arrays
    latent_hw: tuple[int, int],
    seed: int = 0,
    segment_threshold: float = 0.3,
    num_segments: int = 5,
    n_init: int = 100,
    return_segments: bool = False,
    save_dir: str | None = None,
    tokens_vis: Sequence[str] | None = None,
    save_attn: bool = False,
):
    """Per-span soft masks [1, h, w] (+ background last), summing to 1.

    Mirrors utils/attention_utils.py:233-341; returns a list of numpy
    masks shaped [1, h, w] (channel-repeat happens at the use site).

    With ``save_dir`` set, reproduces the reference's always-on visual
    debugging: a segmentation figure (attention_utils.py:266-270) and a
    token-map heat grid of the pre-resize + resized maps
    (attention_utils.py:334-335) are written there per call; ``save_attn``
    additionally dumps the raw aggregated self/cross maps under
    ``save_dir/maps/`` (attention_utils.py:257-260,292-295 — .npy instead
    of .pth).
    """
    # ---- segmentation from self-attention affinity (no eager host fetch:
    # on a TPU backend the subspace solver consumes the device array as-is)
    affinity = agg.self_sum
    res = int(round(np.sqrt(affinity.shape[0])))  # 32 for standard sizes
    assert affinity.shape == (res * res, res * res), affinity.shape
    cache_key = (seed, num_segments, n_init)
    clusters = agg.cluster_cache.get(cache_key)
    if clusters is None:
        key = jax.random.PRNGKey(seed)
        # On a TPU backend the Rayleigh-Ritz subspace solver runs on-chip
        # (~0.2s warm vs ~0.6s host eigh, and seconds vs minutes to
        # compile — scripts/bench_spectral.py); elsewhere dense eigh on
        # the host CPU is exact and fast enough.
        if jax.default_backend() == "tpu":
            device, method = None, "subspace"
        else:
            device, method = "cpu", "eigh"
        clusters = np.asarray(
            spectral_cluster(key, affinity, num_segments, n_init=n_init,
                             device=device, method=method)
        ).reshape(res, res)
        agg.cluster_cache[cache_key] = clusters

    with host_cpu():
        # ---- cross-attention maps → 32², averaged over layers
        cross = np.zeros((res, res, 77), dtype=np.float32)
        for r, m in agg.cross_sums.items():
            m = np.asarray(m, dtype=np.float32).reshape(r, r, 77)
            if r != res:
                m = np.asarray(
                    resize_bicubic(m.transpose(2, 0, 1), (res, res),
                                   antialias=True)
                ).transpose(1, 2, 0)
            cross += m
        cross /= max(agg.cross_layer_count, 1)

    # ---- per-span min-max normalization (attention_utils.py:296-304)
    normalized_span_maps = []
    for token_ids in obj_tokens:
        span = cross[:, :, np.asarray(token_ids)]
        lo = span.min(axis=(0, 1), keepdims=True)
        hi = span.max(axis=(0, 1), keepdims=True)
        normalized_span_maps.append((span - np.abs(lo)) / (hi - lo + 1e-12))

    # ---- cluster → span assignment (attention_utils.py:308-322)
    foreground = [np.zeros((res, res), np.float32) for _ in obj_tokens]
    background = np.zeros((res, res), np.float32)
    for c in range(num_segments):
        cmask = (clusters == c).astype(np.float32)
        csum = max(cmask.sum(), 1e-12)
        is_fg = False
        for span_map, fg in zip(normalized_span_maps, foreground):
            scores = (cmask[:, :, None] * span_map).sum(axis=(0, 1)) / csum
            if scores.max() > segment_threshold:
                fg += cmask
                is_fg = True
        if not is_fg:
            background += cmask
    foreground.append(background)

    # ---- resize to latent res, clamp, normalize to sum 1
    h, w = latent_hw
    stacked = np.stack(foreground)  # [n+1, res, res]
    with host_cpu():
        resized = np.asarray(resize_bicubic(stacked, (h, w), antialias=True))
    resized = np.clip(resized, 0.0, 1.0)
    resized = resized / (resized.sum(axis=0, keepdims=True) + 1e-8)
    masks = [resized[i][None] for i in range(resized.shape[0])]

    if save_dir is not None:
        from .viz import plot_attention_maps, save_segmentation

        save_segmentation(clusters, save_dir, num_segments, seed)
        plot_attention_maps(
            [[m[None] for m in foreground], masks], obj_tokens,
            save_dir, seed, tokens_vis=tokens_vis,
        )
    if save_attn and save_dir is not None:
        import os

        maps_dir = os.path.join(save_dir, "maps")
        os.makedirs(maps_dir, exist_ok=True)
        np.save(os.path.join(maps_dir, "selfattn_maps.npy"),
                np.asarray(affinity, dtype=np.float32))
        np.save(os.path.join(maps_dir, "crossattn_maps.npy"), cross)

    if return_segments:
        return masks, clusters
    return masks
