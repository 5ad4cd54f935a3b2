"""Shared pipeline machinery: mesh placement + jitted VAE decode.

Both rich-text pipelines (SD-1.5 and SDXL) place themselves on a device
mesh the same way and decode latents through the same jitted program;
this mixin is the single home for that logic (it was previously
duplicated verbatim in both classes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def encoder_key_gates(num_steps: int, stride: int,
                      schedule: str = "early") -> np.ndarray:
    """Key-step gates for the encoder-reuse turbo (arXiv 2312.09608 §4).

    ``uniform`` recomputes the UNet down path every ``stride``-th step.
    ``early`` (default) places the SAME number of key steps on a power
    curve denser at the start of sampling — encoder features change
    fastest at high noise, so uniform spacing wastes its budget late;
    the paper prescribes non-uniform key steps for this reason. Step 0 is
    always a key step (the scan-carried cache must be written before it
    is read). Cost is identical to uniform at equal ``stride``.
    """
    S = int(num_steps)
    stride = max(int(stride), 1)
    gates = np.zeros(S, bool)
    if stride == 1:
        gates[:] = True
        return gates
    n = len(range(0, S, stride))
    if schedule == "uniform":
        gates[::stride] = True
        return gates
    if schedule != "early":
        raise ValueError(f"unknown encoder-reuse schedule: {schedule!r}")
    idx = set(np.floor(S * (np.arange(n) / n) ** 1.5).astype(int).tolist())
    # keep the key-step count equal to uniform's: the power curve may
    # collide early indices — fill from the front (still denser-early)
    for i in range(S):
        if len(idx) >= n:
            break
        idx.add(i)
    gates[sorted(idx)] = True
    return gates


@jax.jit
def _fp_sums(arrays):
    out = []
    for a in arrays:
        a32 = a.astype(jnp.float32)
        out.append(jnp.sum(a32))
        out.append(jnp.sum(a32 * a32))
    return jnp.stack(out)


def ref_fingerprint(*arrays) -> tuple:
    """Cheap content fingerprint (sum, sum-of-squares per array) used to
    validate refer-precompute caches across the capture → rich-pass
    boundary: seed/initial-latent and prompt embeddings are not otherwise
    recorded in the cache, so a caller of the public ``sample(ref_cache=...)``
    API reusing a cache captured under a different seed or prompt would get
    a silently wrong refer trajectory. One fused launch + one host fetch."""
    vals = jax.device_get(_fp_sums(tuple(jnp.asarray(a) for a in arrays)))
    return tuple(float(v) for v in np.asarray(vals))


def ref_cache_matches(cache: dict, want_steps, num_steps: int,
                      guidance_scale: float, latent_hw, fp) -> bool:
    """Full validity guard for a refer-precompute cache: injection-step
    indices, trajectory length, guidance scale, latent resolution, and the
    content fingerprint (initial latent + uncond/base embedding rows) must
    all match this rich run. On any mismatch the caller falls back to the
    reference-shaped in-batch flow instead of silently injecting a wrong
    trajectory."""
    if tuple(cache.get("steps", ())) != tuple(want_steps):
        return False
    if cache["traj"].shape[0] != num_steps + 1:
        return False
    if cache.get("g") is None or float(cache["g"]) != float(guidance_scale):
        return False
    if tuple(cache.get("hw", ())) != tuple(latent_hw):
        return False
    old = cache.get("fp")
    if old is None or len(old) != len(fp):
        return False
    return bool(np.allclose(np.asarray(old), np.asarray(fp),
                            rtol=1e-4, atol=1e-6))


class MeshDecodeMixin:
    """Requires: unet_params, vae, vae_params, vae_cfg, _jit_cache, mesh."""

    # HBM budget for refer-precompute (Q,K)/resnet slot buffers; captures
    # that would exceed it are skipped (the rich pass falls back to the
    # in-batch merged flow instead of OOMing)
    ref_precompute_max_bytes = 6e9

    def _ref_qk_bytes_per_slot(self, latent_hw) -> int:
        """HBM bytes one refer-capture slot costs (all attn1 (Q,K) rows +
        the inject-resnet feature), from abstract shapes only. Requires the
        pipeline to implement ``_ref_capture_aux_shapes(latent_hw)``."""
        cache = getattr(self, "_ref_bytes_cache", None)
        if cache is None:
            cache = self._ref_bytes_cache = {}
        if latent_hw in cache:
            return cache[latent_hw]
        aux = self._ref_capture_aux_shapes(latent_hw)
        n = sum(
            int(np.prod(s.shape)) * s.dtype.itemsize
            for s in jax.tree.leaves(
                {"qk": aux["self_qk"], "res": aux["resnet_hidden"]})
        )
        cache[latent_hw] = n
        return n

    def use_mesh(self, mesh, tp_axis: str = "tp"):
        """Place the pipeline on a device mesh.

        Params shard by parallel.mesh rules (wide weight dims on tp); the
        batched UNet rows (CFG rows, region fan-out, text_to_images /
        benchmark-item batches) shard over dp via sharding constraints
        inside the jitted scans — SURVEY §7.6's region-DP, introduced
        (the reference is single-GPU). Clears the jit cache so programs
        re-specialize under the mesh.
        """
        from ..parallel.mesh import shard_params

        self.mesh = mesh
        self.unet_params = jax.device_put(
            self.unet_params, shard_params(self.unet_params, mesh, tp_axis)
        )
        self._jit_cache.clear()
        return self

    def _constrain_batch(self, x):
        """Shard a batched UNet input over (dcn,)dp when a mesh is active."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding

        from ..parallel.mesh import batch_spec

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, batch_spec(self.mesh))
        )

    def _decode_imgs(self, params, latents):
        # tensorfloat32 = bf16x3 MXU passes for the fp32 convs: measured
        # numerically identical at uint8 image scale (max |Δ| 0.014/255 vs
        # full fp32, scripts/bench_vae_decode.py) and ~1.3× faster at
        # 1024². The reference's fp32-VAE policy is an fp16-OVERFLOW
        # workaround (region_diffusion_sdxl.py:916-917); bf16x3 keeps
        # fp32 range and ~fp32 precision, so this is not the opt-in
        # --bf16_vae trade.
        with jax.default_matmul_precision("tensorfloat32"):
            imgs = self.vae.apply(
                params,
                latents.astype(jnp.float32) / self.vae_cfg.scaling_factor,
                method=self.vae.decode,
            )
        return jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)

    @functools.cached_property
    def _decode(self):
        # params are jit ARGUMENTS (closure constants would be baked into
        # the HLO — hundreds of MB through a remote-compile relay)
        run = jax.jit(self._decode_imgs)
        return functools.partial(run, self.vae_params)

    @functools.cached_property
    def _decode_u8(self):
        """Decode straight to uint8 ON DEVICE.

        The [B, H, W, 3] fp32 image is 12.6 MB at 1024² and the host fetch
        rides a bandwidth-limited relay in this environment — converting to
        uint8 device-side cuts the transfer 4× (the callers' next step was
        ``(imgs * 255).round().astype(np.uint8)`` anyway). Kept separate
        from ``_decode``: the VAE tiling/slicing paths blend overlapping
        tile margins in fp32 and must not receive quantized tiles.
        """
        @jax.jit
        def run(params, latents):
            imgs = self._decode_imgs(params, latents)
            return (imgs * 255).round().astype(jnp.uint8)

        return functools.partial(run, self.vae_params)
