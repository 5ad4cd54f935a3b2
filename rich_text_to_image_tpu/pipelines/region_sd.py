"""RegionDiffusion — the SD-1.5 rich-text pipeline, TPU-native.

Re-designs models/region_diffusion.py (reference) as three jit-compiled
programs:

  * ``plain pass`` — one ``lax.scan`` over PNDM steps of the CFG-batched
    UNet, with token-map attention capture folded into the scan carry as
    per-resolution *aggregates* (see utils/token_maps.py) instead of the
    reference's per-step hook→CPU copies (region_diffusion.py:397-443).
  * ``rich pass`` — one scan where the reference's sequential
    ``2+N`` UNet calls per step (region_diffusion.py:106-128) become one
    batched forward [uncond, span_1..R, base] (two when self-attention
    injection runs a reference trajectory), noise compositing under the
    token masks, optional (Q,K) self-attention + resnet feature injection,
    background latent injection, and gradient color guidance via
    ``jax.grad`` through a checkpointed VAE decode
    (region_diffusion.py:151-168).
  * text/vae utility programs (encode prompts, decode latents).

API mirrors the reference class: ``produce_attn_maps`` / ``prompt_to_img`` /
``masks`` / ``tokenizer``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import config as cfgs
from ..models.clip import CLIPTextModel
from ..models.tokenizer import CLIPTokenizer
from ..models.unet import (
    EMPTY_CAPTURE,
    INJECT_RESNET_NAME,
    CaptureSpec,
    UNet2DCondition,
    UNetControls,
)
from ..models.vae import AutoencoderKL
from ..ops.attention import make_token_weight_vectors
from ..schedulers import PNDMScheduler
from ..utils.registries import (
    CrossAttentionLayers,
    SelfAttentionLayers,
    attn_layer_resolutions,
)
from ..utils.token_maps import SEG_RESOLUTION, AttnAggregates
from .base import (MeshDecodeMixin, encoder_key_gates,
                   ref_cache_matches, ref_fingerprint)


@dataclasses.dataclass
class RichControlSpec:
    """Host-side rich-pass knobs (converted to per-step gate arrays)."""

    guidance_scale: float = 7.5
    inject_selfattn: float = 0.0
    inject_background: float = 0.0
    use_guidance: bool = False
    guidance_start_step: int = 999
    color_guidance_weight: float = 1.0
    # Encoder-reuse turbo ("Faster Diffusion", arXiv 2312.09608; PAPERS.md):
    # 1 = off (exact reference math). N>1 = recompute the UNet down path
    # only on key steps (every Nth), reuse the cached (x, skips) between —
    # opt-in approximation the reference has no counterpart for.
    encoder_reuse: int = 1
    # Key-step placement for encoder_reuse>1: "early" (default, denser at
    # high noise — the paper's non-uniform prescription) or "uniform"
    encoder_schedule: str = "early"
    # Opt-in: run the color-guidance VAE decode + gradient in bfloat16
    # (fp32 range). The guidance only consumes a *gradient direction*
    # scaled by color_guidance_weight, and the fp32 decode dominates the
    # guided step (~58% of the color-bench item on v5e) — bf16 cuts it
    # ~3×. Default keeps the reference's fp32 math.
    bf16_guidance: bool = False
    # Opt-in: compute the color-guidance gradient at reduced resolution —
    # average-pool the x0 latent by this factor before the VAE decode and
    # pool the pixel masks to match. The masked-mean RGB (the only thing
    # the loss reads, region_diffusion.py:151-168) is nearly scale-
    # invariant, while the decode fwd+bwd cost drops ~d². 1 = exact
    # reference math (default). Composes with bf16_guidance.
    guidance_downsample: int = 1


class RegionDiffusion(MeshDecodeMixin):
    """SD-1.5 rich-text-to-image pipeline."""

    def __init__(
        self,
        unet_params,
        vae_params,
        text_params,
        tokenizer: CLIPTokenizer,
        unet_cfg: cfgs.UNetConfig = cfgs.SD15_UNET,
        vae_cfg: cfgs.VAEConfig = cfgs.SD15_VAE,
        text_cfg: cfgs.CLIPTextConfig = cfgs.SD15_TEXT,
        dtype=jnp.bfloat16,
        agg_start_step: int = 10,  # reference: accumulate when n_maps > 10
        mesh=None,
        scheduler=None,
    ):
        self.unet = UNet2DCondition(unet_cfg, dtype=dtype)
        self.vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
        self.text_encoder = CLIPTextModel(text_cfg, dtype=jnp.float32)
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.unet_cfg = unet_cfg
        self.vae_cfg = vae_cfg
        self.scheduler = scheduler if scheduler is not None else PNDMScheduler()
        self.dtype = dtype
        self.agg_start_step = agg_start_step
        self.vae_scale_factor = 2 ** (len(vae_cfg.block_out_channels) - 1)
        self.masks: list[np.ndarray] = []  # [R+1] of [1,h,w] (parity attr)
        self._jit_cache: dict[Any, Any] = {}
        self.mesh = mesh
        if mesh is not None:
            self.use_mesh(mesh)

    # use_mesh / _constrain_batch / _decode come from MeshDecodeMixin

    # ------------------------------------------------------------ factories
    @classmethod
    def from_pretrained(cls, checkpoint_dir: str, dtype=jnp.bfloat16):
        """Load from a local SD-1.5 checkpoint directory (HF layout)."""
        import os

        from ..models.convert import (
            convert_clip_text,
            convert_unet,
            convert_vae,
            load_safetensors_dir,
        )

        tokenizer = CLIPTokenizer.from_pretrained(
            os.path.join(checkpoint_dir, "tokenizer")
        )
        unet = UNet2DCondition(cfgs.SD15_UNET, dtype=dtype)
        vae = AutoencoderKL(cfgs.SD15_VAE)
        text = CLIPTextModel(cfgs.SD15_TEXT)
        shapes = _init_shapes_sd(unet, vae, text)
        unet_sd = load_safetensors_dir(os.path.join(checkpoint_dir, "unet"))
        vae_sd = load_safetensors_dir(os.path.join(checkpoint_dir, "vae"))
        text_sd = load_safetensors_dir(os.path.join(checkpoint_dir, "text_encoder"))
        return cls(
            {"params": convert_unet(unet_sd, cfgs.SD15_UNET, shapes[0]["params"],
                                    dtype=dtype)},
            {"params": convert_vae(vae_sd, cfgs.SD15_VAE, shapes[1]["params"])},
            {"params": convert_clip_text(text_sd, cfgs.SD15_TEXT,
                                         shapes[2]["params"])},
            tokenizer,
            dtype=dtype,
        )

    @classmethod
    def random_init(
        cls,
        seed: int = 0,
        unet_cfg: cfgs.UNetConfig = cfgs.SD15_UNET,
        vae_cfg: cfgs.VAEConfig = cfgs.SD15_VAE,
        text_cfg: cfgs.CLIPTextConfig = cfgs.SD15_TEXT,
        tokenizer: CLIPTokenizer | None = None,
        dtype=jnp.bfloat16,
        **kw,
    ):
        """Random-weight pipeline (tests, benchmarks, weight-free smoke)."""
        tokenizer = tokenizer or CLIPTokenizer.byte_level()
        if tokenizer.encoder and len(tokenizer.encoder) > text_cfg.vocab_size:
            text_cfg = dataclasses.replace(
                text_cfg, vocab_size=len(tokenizer.encoder)
            )
        from ..models.init_utils import fast_init

        unet = UNet2DCondition(unet_cfg, dtype=dtype)
        vae = AutoencoderKL(vae_cfg)
        text = CLIPTextModel(text_cfg)
        latent = unet_cfg.sample_size
        up = fast_init(
            unet, seed,
            jnp.zeros((1, latent, latent, unet_cfg.in_channels)),
            jnp.int32(0),
            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
            dtype=dtype,
        )
        px = latent * 2 ** (len(vae_cfg.block_out_channels) - 1)
        vp = fast_init(vae, seed + 1, jnp.zeros((1, px, px, 3)))
        tp = fast_init(text, seed + 2, jnp.zeros((1, 77), jnp.int32))
        return cls(up, vp, tp, tokenizer, unet_cfg, vae_cfg, text_cfg,
                   dtype=dtype, **kw)

    # ----------------------------------------------------------------- text
    def get_text_embeds(self, prompts, negative_prompts="") -> jnp.ndarray:
        """[uncond, prompt_1..N] embeddings, reference layout
        (region_diffusion.py:49-70)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(negative_prompts, str):
            negative_prompts = [negative_prompts]
        ids = self.tokenizer(list(negative_prompts) + list(prompts))
        embeds = self._text_apply(jnp.asarray(ids))
        return embeds

    @functools.cached_property
    def _text_apply(self):
        # params are jit ARGUMENTS (closure constants would be baked into
        # the HLO — hundreds of MB through a remote-compile relay)
        @jax.jit
        def run(params, ids):
            out = self.text_encoder.apply(params, ids)
            return out["last_hidden_state"]

        return functools.partial(run, self.text_params)

    # ------------------------------------------------------------ VAE utils
    def decode_latents(self, latents) -> np.ndarray:
        """latents [B,h,w,4] → uint8 images [B,H,W,3] (u8 cast on device —
        4× less host-fetch traffic than fetching fp32 images)."""
        return np.asarray(self._decode_u8(latents))

    def encode_imgs(self, imgs, seed: int = 0) -> jnp.ndarray:
        x = jnp.asarray(imgs, dtype=jnp.float32) * 2 - 1
        return self.vae.apply(
            self.vae_params, x, jax.random.PRNGKey(seed), method=self.vae.encode
        )

    # ------------------------------------------------------- capture layout
    def _capture_layout(self, latent_hw):
        res_map = attn_layer_resolutions(self.unet_cfg, latent_hw)
        seg_res = min(SEG_RESOLUTION, latent_hw[0] // 2)
        self_layers = tuple(
            n for n in SelfAttentionLayers if res_map.get(n) == seg_res
        )
        cross_by_res: dict[int, tuple[str, ...]] = {}
        for n in CrossAttentionLayers:
            r = res_map.get(n)
            if r is not None:
                cross_by_res.setdefault(r, ())
                cross_by_res[r] += (n,)
        return seg_res, self_layers, cross_by_res

    def _ref_capture_aux_shapes(self, latent_hw):
        """Abstract aux shapes of one refer-capture UNet row (all attn1
        (Q,K) + the inject-resnet feature) — feeds the shared
        ``_ref_qk_bytes_per_slot`` HBM guard (pipelines/base.py)."""
        h, w = latent_hw
        spec = CaptureSpec(qk=True, resnet=frozenset({INJECT_RESNET_NAME}))
        pstruct = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            self.unet_params)
        dt = self.unet.dtype
        x = jax.ShapeDtypeStruct((1, h, w, self.unet_cfg.in_channels), dt)
        e = jax.ShapeDtypeStruct(
            (1, 77, self.unet_cfg.cross_attention_dim), dt)
        return jax.eval_shape(
            lambda p, x, e: self.unet.apply(
                p, x, jnp.int32(0), e, capture=spec)[1],
            pstruct, x, e,
        )

    # ------------------------------------------------------------ plain pass
    def produce_attn_maps(
        self,
        prompts,
        negative_prompts="",
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        latents: Optional[jnp.ndarray] = None,
        seed: int = 0,
        ref_capture_steps: Optional[tuple] = None,
    ):
        """Plain CFG pass; returns (images uint8, AttnAggregates).

        ``ref_capture_steps``: also capture the refer cache (latent
        trajectory + cond-row (Q,K)/resnet at the listed step indices),
        stashed as ``self.ref_cache`` — see RegionDiffusionXL.sample.

        Reference: region_diffusion.py:180-225 with tokenmap hooks active.
        Single prompt only — the capture scan aggregates cond-row maps of
        ONE prompt (batching prompts would mix their attention maps; use
        ``text_to_images`` for capture-free multi-prompt throughput).
        """
        if not isinstance(prompts, str):
            prompts = list(prompts)  # materialize once: a generator would
            if len(prompts) != 1:    # pass the guard but arrive exhausted
                raise ValueError(
                    "produce_attn_maps takes exactly one prompt (the capture "
                    "aggregates are per-prompt); got "
                    f"{len(prompts)}. Use text_to_images for batches."
                )
        embeds = self.get_text_embeds(prompts, negative_prompts)
        h, w = height // self.vae_scale_factor, width // self.vae_scale_factor
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (1, h, w, self.unet_cfg.in_channels)
            )
        plan = self.scheduler.plan(num_inference_steps)
        latents = latents * getattr(plan, "init_noise_sigma", 1.0)
        seg_res, self_layers, cross_by_res = self._capture_layout((h, w))
        ref_slots = (tuple(int(s) for s in ref_capture_steps)
                     if ref_capture_steps is not None else None)
        if ref_slots and (
            self._ref_qk_bytes_per_slot((h, w)) * len(ref_slots)
            > self.ref_precompute_max_bytes
        ):
            # (Q,K) slots would not fit HBM alongside params — skip the
            # capture entirely; the rich pass falls back to the in-batch
            # merged flow (same guard as RegionDiffusionXL)
            ref_slots = None
        # release the previous run's cache BEFORE the scan allocates a fresh
        # one — holding both OOMs HBM on back-to-back produce_attn_maps calls
        self.ref_cache = None
        fn = self._plain_fn((h, w), plan.num_steps, seg_res, self_layers,
                            tuple(sorted(cross_by_res.items())),
                            ref_slots=ref_slots)
        out = fn(
            self.unet_params, latents, embeds, _plan_arrays(plan),
            jnp.float32(guidance_scale),
        )
        if ref_slots is not None:
            lat, self_sum, cross_sums, cache = out
            cache["steps"] = ref_slots
            # validity metadata: a later rich call only trusts this cache
            # if its guidance scale, resolution, initial latent and
            # uncond/base prompt rows all match (ref_cache_matches)
            cache["g"] = float(guidance_scale)
            cache["hw"] = (h, w)
            cache["fp"] = ref_fingerprint(latents, embeds[0], embeds[-1])
            self.ref_cache = cache
        else:
            lat, self_sum, cross_sums = out
            self.ref_cache = None
        agg = AttnAggregates(
            self_sum=self_sum,  # stays on device; token_maps fetches lazily
            self_count=len(self_layers),
            # one batched device_get: per-item np.asarray would pay the
            # relay's fixed round-trip latency once per resolution
            cross_sums=dict(zip((r for r, _ in sorted(cross_by_res.items())),
                                jax.device_get(tuple(cross_sums)))),
            cross_layer_count=sum(len(v) for v in cross_by_res.values()),
        )
        self.attn_aggregates = agg  # parity-ish attribute (selfattn_maps etc.)
        return self.decode_latents(lat), agg

    def _plain_fn(self, latent_hw, num_steps, seg_res, self_layers,
                  cross_items, ref_slots=None):
        """Plain CFG scan; with ``ref_slots`` it additionally captures the
        refer cache (latent trajectory + cond-row (Q,K)/resnet at the listed
        step indices) — see RegionDiffusionXL._plain_fn: the refer
        trajectory the reference re-denoises inside its rich loop
        (region_diffusion.py:99-148) is mathematically THIS pass."""
        key = ("plain", latent_hw, num_steps, self_layers, cross_items,
               ref_slots)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        capture = CaptureSpec(
            self_probs=frozenset(self_layers),
            cross_probs=frozenset(n for _, ns in cross_items for n in ns),
        )
        agg_start = self.agg_start_step
        unet = self.unet
        constrain = self._constrain_batch
        with_ref = ref_slots is not None
        n_slots = len(ref_slots) if with_ref else 0
        ref_extra = dict(qk=True, resnet=frozenset({INJECT_RESNET_NAME}))
        if n_slots:
            # non-ref steps write to a TRASH slot (index n_slots): the
            # buffer update stays unconditional in the scan body so XLA
            # aliases it in place (see RegionDiffusionXL._plain_fn)
            slot_np = np.full(num_steps, n_slots, np.int32)
            is_ref_np = np.zeros(num_steps, bool)
            for j, s in enumerate(ref_slots):
                slot_np[s] = j
                is_ref_np[s] = True

        @jax.jit
        def run(params, latents, embeds, plan, g):
            s2 = seg_res * seg_res
            self_sum0 = jnp.zeros((s2, s2), jnp.float32)
            cross0 = tuple(
                jnp.zeros((r * r, 77), jnp.float32) for r, _ in cross_items
            )
            st0 = sched.init_state(latents.shape)

            cross_capture = CaptureSpec(
                cross_probs=frozenset(n for _, ns in cross_items for n in ns)
            )

            lat_flat = lambda l: l.reshape(
                1, l.shape[1], l.shape[2] * l.shape[3])
            if n_slots:
                # (Q,K) stored MERGED-HEAD [slots+1, S, C]; trajectory
                # [S+1, h, w*C] — TPU (8,128) tiling-friendly layouts (see
                # RegionDiffusionXL._plain_fn)
                shapes = jax.eval_shape(
                    lambda p, l, e: unet.apply(
                        p, jnp.concatenate([l, l], 0), jnp.int32(0), e,
                        capture=CaptureSpec(**ref_extra))[1],
                    params, latents, embeds,
                )
                qk0 = {
                    n: tuple(
                        jnp.zeros(
                            (n_slots + 1, s.shape[2],
                             s.shape[1] * s.shape[3]), s.dtype)
                        for s in qk)
                    for n, qk in shapes["self_qk"].items()
                }
                res0 = {
                    n: jnp.zeros((n_slots + 1,) + s.shape[1:], s.dtype)
                    for n, s in shapes["resnet_hidden"].items()
                }
                slot_arr = jnp.asarray(slot_np)
                is_ref = jnp.asarray(is_ref_np)
                qk_zero = {
                    n: tuple(jnp.zeros(b.shape[1:], b.dtype) for b in bufs)
                    for n, bufs in qk0.items()
                }
                res_zero = {
                    n: jnp.zeros(b.shape[1:], b.dtype)
                    for n, b in res0.items()
                }
            else:
                qk0, res0 = {}, {}
            traj0 = jnp.zeros(
                ((num_steps + 1) if with_ref else 0,
                 latents.shape[1], latents.shape[2] * latents.shape[3]),
                latents.dtype)

            def body(carry, i):
                lat, st, self_sum, cross, qk_bufs, res_bufs, traj = carry
                t = plan.timesteps[i]
                x = constrain(sched.scale_model_input(
                    plan, i, jnp.concatenate([lat, lat], axis=0)))
                if with_ref:
                    traj = jax.lax.dynamic_update_slice(
                        traj, lat_flat(lat), (i, 0, 0))

                # --- aggregate capture (cond row = 1)
                # SD quirk parity: self maps overwrite each step (the
                # reference's crossattn_maps-membership bug makes
                # selfattn_maps hold only the last step's maps,
                # region_diffusion.py:422-426) — so only the LAST step needs
                # the self-probs capture; cross probs accumulate from
                # agg_start; earlier steps run capture-free. lax.switch
                # executes one branch per step (the reference runs its hooks
                # on every step and discards the results). ref-capture steps
                # additionally emit (Q,K)+resnet into their slot.
                def _mk(mode, cap_ref):
                    base_spec = {
                        0: None, 1: cross_capture, 2: capture,
                    }[mode]
                    if cap_ref:
                        spec = CaptureSpec(**{
                            **({"self_probs": base_spec.self_probs,
                                "cross_probs": base_spec.cross_probs}
                               if base_spec is not None else {}),
                            **ref_extra,
                        })
                    else:
                        spec = base_spec

                    def br(_):
                        if spec is None:
                            eps, aux = unet.apply(params, x, t, embeds)
                        else:
                            eps, aux = unet.apply(params, x, t, embeds,
                                                  capture=spec)
                        if mode == 2:
                            new_self = sum(
                                aux["self_probs"][n][1].astype(jnp.float32)
                                for n in self_layers
                            ) if self_layers else self_sum
                            w = (i >= agg_start).astype(jnp.float32)
                            d_cross = tuple(
                                w * sum(
                                    aux["cross_probs"][n][1].astype(
                                        jnp.float32)
                                    for n in ns)
                                for _, ns in cross_items
                            )
                        elif mode == 1:
                            new_self = self_sum
                            d_cross = tuple(
                                sum(aux["cross_probs"][n][1].astype(
                                    jnp.float32) for n in ns)
                                for _, ns in cross_items
                            )
                        else:
                            new_self = self_sum
                            d_cross = tuple(
                                jnp.zeros_like(c) for c in cross0)
                        if cap_ref:
                            qk_now = {
                                n: tuple(
                                    v[1].transpose(1, 0, 2).reshape(
                                        v.shape[2], -1)
                                    for v in aux["self_qk"][n])
                                for n in qk_zero
                            }
                            res_now = {
                                n: aux["resnet_hidden"][n][1]
                                for n in res_zero
                            }
                        elif n_slots:
                            qk_now, res_now = qk_zero, res_zero
                        else:
                            qk_now, res_now = {}, {}
                        return eps, new_self, d_cross, qk_now, res_now

                    return br

                idx = jnp.where(
                    i == num_steps - 1, 2,
                    jnp.where(i >= agg_start, 1, 0),
                )
                if n_slots:
                    idx = idx + 3 * is_ref[i].astype(idx.dtype)
                    branches = [_mk(m, False) for m in range(3)] + [
                        _mk(m, True) for m in range(3)]
                else:
                    branches = [_mk(m, False) for m in range(3)]
                eps, new_self, d_cross, qk_now, res_now = jax.lax.switch(
                    idx, branches, None)
                if n_slots:
                    # unconditional in-place slot write (trash slot absorbs
                    # non-ref steps)
                    slot = slot_arr[i]
                    qk_bufs = {
                        n: tuple(
                            jax.lax.dynamic_update_slice(
                                buf, val[None].astype(buf.dtype),
                                (slot, 0, 0))
                            for buf, val in zip(qk_bufs[n], qk_now[n]))
                        for n in qk_bufs
                    }
                    res_bufs = {
                        n: jax.lax.dynamic_update_slice(
                            res_bufs[n],
                            res_now[n][None].astype(res_bufs[n].dtype),
                            (slot,) + (0,) * (res_bufs[n].ndim - 1))
                        for n in res_bufs
                    }
                new_cross = tuple(c + d for c, d in zip(cross, d_cross))
                eps = eps.astype(jnp.float32)
                e = eps[0:1] + g * (eps[1:2] - eps[0:1])
                lat, st = sched.step(plan, i, st, e, lat)
                return (lat, st, new_self, new_cross, qk_bufs, res_bufs,
                        traj), None

            (lat, _, self_sum, cross, qk_bufs, res_bufs, traj), _ = (
                jax.lax.scan(
                    body,
                    (latents, st0, self_sum0, cross0, qk0, res0, traj0),
                    jnp.arange(num_steps),
                )
            )
            if not with_ref:
                return lat, self_sum, cross
            traj = jax.lax.dynamic_update_slice(
                traj, lat_flat(lat), (num_steps, 0, 0))
            return lat, self_sum, cross, dict(
                traj=traj, qk=qk_bufs, resnet=res_bufs)

        self._jit_cache[key] = run
        return run

    # ------------------------------------------------- batched plain txt2img
    def text_to_images(
        self,
        prompts: Sequence[str],
        negative_prompt: str = "",
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        seed: int = 0,
        encoder_reuse: int = 1,
        encoder_schedule: str = "early",
    ) -> np.ndarray:
        """Throughput mode: N prompts in one CFG-batched scan (no capture).

        The reference has no batched path (batch hard-coded to 1,
        region_diffusion_sdxl.py:698-701); this is the TPU-native
        images/min surface — batch the MXU, shard over dp if a mesh is
        active. ``encoder_reuse`` applies the same turbo as the rich pass
        (arXiv 2312.09608).
        """
        prompts = list(prompts)
        N = len(prompts)
        embeds = self.get_text_embeds(prompts, [negative_prompt])  # [N+1,...]
        uncond = jnp.tile(embeds[0:1], (N, 1, 1))
        cond = embeds[1:]
        f = self.vae_scale_factor
        h, w = height // f, width // f
        latents = jax.random.normal(
            jax.random.PRNGKey(seed), (N, h, w, self.unet_cfg.in_channels)
        )
        plan = self.scheduler.plan(num_inference_steps)
        latents = latents * getattr(plan, "init_noise_sigma", 1.0)
        stride = max(int(encoder_reuse), 1)
        enc_gates = encoder_key_gates(plan.num_steps, stride,
                                      encoder_schedule)
        fn = self._batch_fn((h, w), plan.num_steps, N, stride > 1)
        lat = fn(
            self.unet_params, latents,
            jnp.concatenate([uncond, cond], axis=0),
            _plan_arrays(plan), jnp.float32(guidance_scale),
            jnp.asarray(enc_gates),
        )
        return self.decode_latents(lat)

    def _batch_fn(self, latent_hw, num_steps, N, enc_reuse=False):
        key = ("batch", latent_hw, num_steps, N, enc_reuse)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        constrain = self._constrain_batch

        @jax.jit
        def run(params, latents, embeds, plan, g, enc_gates):
            st0 = sched.init_state(latents.shape)

            def body(carry, i):
                lat, st, enc_carry = carry
                t = plan.timesteps[i]
                x = constrain(sched.scale_model_input(
                    plan, i, jnp.concatenate([lat, lat], axis=0)))
                emb = unet.apply(params, t, 2 * N, None,
                                 method=unet.embed_time)

                def enc_now(_):
                    return unet.apply(params, x, emb, embeds, None,
                                      EMPTY_CAPTURE, method=unet.encode)

                if enc_reuse:
                    enc = jax.lax.cond(enc_gates[i], enc_now,
                                       lambda c: c, enc_carry[0])
                    enc_new = (enc,)
                else:
                    enc = enc_now(None)
                    enc_new = ()
                eps, _ = unet.apply(params, enc, emb, embeds, None,
                                    EMPTY_CAPTURE, method=unet.decode)
                eps = eps.astype(jnp.float32)
                e = eps[:N] + g * (eps[N:] - eps[:N])
                lat, st = sched.step(plan, i, st, e, lat)
                return (lat, st, enc_new), None

            if enc_reuse:
                def f(p, lat1, ee):
                    x0 = jnp.concatenate([lat1, lat1], axis=0)
                    emb = unet.apply(p, jnp.int32(0), 2 * N, None,
                                     method=unet.embed_time)
                    return unet.apply(p, x0, emb, ee, None, EMPTY_CAPTURE,
                                      method=unet.encode)

                shapes = jax.eval_shape(f, params, latents, embeds)
                enc0 = (jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                ),)
            else:
                enc0 = ()
            (lat, _, _), _ = jax.lax.scan(
                body, (latents, st0, enc0), jnp.arange(num_steps)
            )
            return lat

        self._jit_cache[key] = run
        return run

    # ------------------------------------------------------------- rich pass
    def prompt_to_img(
        self,
        prompts: Sequence[str],
        negative_prompts="",
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        latents: Optional[jnp.ndarray] = None,
        text_format_dict: Optional[dict] = None,
        use_guidance: bool = False,
        inject_selfattn: float = 0.0,
        inject_background: float = 0.0,
        seed: int = 0,
        encoder_reuse: int = 1,
        encoder_schedule: str = "early",
        bf16_guidance: bool = False,
        guidance_downsample: int = 1,
        ref_cache: Optional[dict] = None,
    ) -> np.ndarray:
        """Rich region-based sampling (reference region_diffusion.py:248-273).

        ``prompts``: region prompts, base prompt last. ``self.masks`` must
        hold len(prompts) masks (spans + background) from get_token_maps.
        ``ref_cache``: a refer cache from produce_attn_maps(
        ref_capture_steps=...) with the SAME seed/prompt/steps — lets the
        scan drop the in-batch refer rows (see RegionDiffusionXL.sample).
        """
        text_format_dict = dict(text_format_dict or {})
        embeds = self.get_text_embeds(list(prompts), negative_prompts)
        spec = RichControlSpec(
            guidance_scale=guidance_scale,
            inject_selfattn=inject_selfattn,
            inject_background=inject_background,
            use_guidance=use_guidance,
            guidance_start_step=text_format_dict.get("guidance_start_step", 999),
            color_guidance_weight=text_format_dict.get(
                "color_guidance_weight", 1.0
            ),
            encoder_reuse=int(encoder_reuse),
            encoder_schedule=encoder_schedule,
            bf16_guidance=bool(bf16_guidance),
            guidance_downsample=int(guidance_downsample),
        )
        lat = self.produce_latents(
            embeds,
            height=height,
            width=width,
            num_inference_steps=num_inference_steps,
            latents=latents,
            spec=spec,
            text_format_dict=text_format_dict,
            seed=seed,
            ref_cache=ref_cache,
        )
        return self.decode_latents(lat)

    def produce_latents(
        self,
        text_embeddings: jnp.ndarray,  # [R+2, 77, D]: uncond, spans..., base
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        latents: Optional[jnp.ndarray] = None,
        spec: RichControlSpec = RichControlSpec(),
        text_format_dict: Optional[dict] = None,
        seed: int = 0,
        ref_cache: Optional[dict] = None,
    ) -> jnp.ndarray:
        text_format_dict = dict(text_format_dict or {})
        h, w = height // self.vae_scale_factor, width // self.vae_scale_factor
        n_styles = text_embeddings.shape[0] - 1
        assert n_styles == len(self.masks), (n_styles, len(self.masks))
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (1, h, w, self.unet_cfg.in_channels)
            )

        plan = self.scheduler.plan(num_inference_steps)
        latents = latents * getattr(plan, "init_noise_sigma", 1.0)
        S = plan.num_steps
        # per-step host gates (all static arrays; see region_diffusion.py:104-105)
        inject_gates = plan.timesteps.astype(np.float64) > (
            (1 - spec.inject_selfattn) * 1000
        )
        bg_step = int(spec.inject_background * S)
        bg_gates = (np.arange(S) == bg_step) & (spec.inject_background > 0)
        guidance_gates = (
            plan.timesteps.astype(np.int64) < spec.guidance_start_step
        ) & spec.use_guidance
        alpha_raw = self.scheduler.alphas_cumprod[plan.timesteps].astype(
            np.float32
        )
        run_reference = spec.inject_selfattn > 0 or spec.inject_background > 0

        # token reweighting rows: base row only (reference registers the
        # fontsize hooks around the base-prompt forward, :108-111)
        tw, ts = make_token_weight_vectors(
            text_format_dict.get("word_pos"), text_format_dict.get("font_size")
        )
        B = n_styles + 1
        if tw is not None:
            tw_rows = jnp.ones((B, 77), jnp.float32).at[B - 1].set(tw)
            ts_rows = jnp.ones((B, 77), jnp.float32).at[B - 1].set(ts)
        else:
            tw_rows = ts_rows = None

        masks = jnp.asarray(
            np.stack([np.asarray(m).reshape(h, w) for m in self.masks])
        )[..., None]  # [R+1, h, w, 1]

        use_grad = bool(spec.use_guidance)
        if use_grad:
            color_masks_px = jnp.asarray(
                np.stack(
                    [np.asarray(m).reshape(height, width)
                     for m in text_format_dict["color_obj_atten"]]
                )
            )  # [n_colors, H, W]
            target_rgb = jnp.asarray(
                np.stack([np.asarray(c).reshape(3)
                          for c in text_format_dict["target_RGB"]])
            )  # [n_colors, 3]
            color_all = jnp.asarray(
                np.asarray(text_format_dict["color_obj_atten_all"]).reshape(
                    h, w
                )
            )[None, :, :, None]
        else:
            color_masks_px = jnp.zeros((1, height, width))
            target_rgb = jnp.zeros((1, 3))
            color_all = jnp.zeros((1, h, w, 1))

        # encoder-reuse key steps (step 0 is always a key step, so the
        # scan-carry cache init is never consumed before being written)
        stride = max(int(spec.encoder_reuse), 1)
        enc_gates = encoder_key_gates(S, stride, spec.encoder_schedule)

        gds = max(int(spec.guidance_downsample), 1) if use_grad else 1
        if h % gds or w % gds or height % gds or width % gds:
            gds = 1  # non-divisible shapes: fall back to the exact path

        if ref_cache is not None and run_reference:
            # precomputed refer trajectory (see RegionDiffusionXL): trusted
            # only if captured at exactly this run's injection steps AND
            # under the same guidance scale, resolution, initial latent and
            # uncond/base prompt rows (content fingerprint) — otherwise
            # fall back to the reference-shaped in-batch flow below
            want = tuple(np.nonzero(inject_gates)[0].tolist())
            fp = ref_fingerprint(latents, text_embeddings[0],
                                 text_embeddings[-1])
            if ref_cache_matches(ref_cache, want, S,
                                 spec.guidance_scale, (h, w), fp):
                fn = self._rich_fn_refpre(
                    (h, w), S, n_styles, use_grad, tw is not None,
                    stride > 1, use_grad and spec.bf16_guidance, gds,
                    has_qk=len(want) > 0, bg_idx=min(bg_step + 1, S),
                    use_bg=bool(spec.inject_background > 0),
                )
                slot_np = np.zeros(S, np.int32)
                for j, s in enumerate(want):
                    slot_np[s] = j
                return fn(
                    self.unet_params, self.vae_params, latents,
                    text_embeddings, masks, _plan_arrays(plan),
                    dict(
                        g=jnp.float32(spec.guidance_scale),
                        inject_gates=jnp.asarray(inject_gates),
                        bg_gates=jnp.asarray(bg_gates),
                        guidance_gates=jnp.asarray(guidance_gates),
                        alpha_raw=jnp.asarray(alpha_raw),
                        tw_rows=tw_rows,
                        ts_rows=ts_rows,
                        color_masks_px=color_masks_px,
                        target_rgb=target_rgb,
                        color_all=color_all,
                        color_w=jnp.float32(spec.color_guidance_weight),
                        enc_gates=jnp.asarray(enc_gates),
                        slot_of_step=jnp.asarray(slot_np),
                    ),
                    dict(traj=ref_cache["traj"], qk=ref_cache["qk"],
                         resnet=ref_cache["resnet"]),
                )

        fn = self._rich_fn((h, w), S, n_styles, run_reference, use_grad,
                           tw is not None, stride > 1,
                           use_grad and spec.bf16_guidance, gds)
        lat = fn(
            self.unet_params,
            self.vae_params,
            latents,
            text_embeddings,
            masks,
            _plan_arrays(plan),
            dict(
                g=jnp.float32(spec.guidance_scale),
                inject_gates=jnp.asarray(inject_gates),
                bg_gates=jnp.asarray(bg_gates),
                guidance_gates=jnp.asarray(guidance_gates),
                alpha_raw=jnp.asarray(alpha_raw),
                tw_rows=tw_rows,
                ts_rows=ts_rows,
                color_masks_px=color_masks_px,
                target_rgb=target_rgb,
                color_all=color_all,
                color_w=jnp.float32(spec.color_guidance_weight),
                enc_gates=jnp.asarray(enc_gates),
            ),
        )
        return lat

    def _rich_fn(self, latent_hw, num_steps, n_styles, run_reference,
                 use_grad, use_tw, enc_reuse=False, bf16_guidance=False,
                 guidance_ds=1):
        key = ("rich", latent_hw, num_steps, n_styles, run_reference,
               use_grad, use_tw, enc_reuse, bf16_guidance, guidance_ds)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        vae = (AutoencoderKL(self.vae_cfg, dtype=jnp.bfloat16)
               if bf16_guidance else self.vae)
        vae_cfg = self.vae_cfg
        constrain = self._constrain_batch
        R = n_styles - 1  # span regions (masks[:-1])

        capture_ref = CaptureSpec(
            qk=True, resnet=frozenset({"up_blocks.1.resnets.1"})
        ) if run_reference else CaptureSpec()

        @jax.jit
        def run(params, vae_params, latents, embeds, masks, plan, ctl):
            n_lat = 2 if run_reference else 1
            st0 = sched.init_state((n_lat, *latents.shape[1:]))

            decode = jax.checkpoint(
                lambda vp, z: vae.apply(vp, z, method=vae.decode)
            )

            def unet_fwd(x, t, e, controls, capture, enc_cache):
                """embed_time → (encode | scan-carried cache) → decode.

                With encoder reuse on, ``enc_cache`` is (gate, cached-enc):
                on key steps the down path recomputes (lax.cond — XLA runs
                only the taken branch), otherwise the cached (x, skips)
                pytree feeds the decoder, which always runs with the
                *current* time embedding (arXiv 2312.09608 §4).
                """
                emb = unet.apply(params, t, x.shape[0], None,
                                 method=unet.embed_time)

                def enc_now(_):
                    return unet.apply(params, x, emb, e, controls, capture,
                                      method=unet.encode)

                if enc_cache is None:
                    enc = enc_now(None)
                else:
                    gate_enc, cached = enc_cache
                    enc = jax.lax.cond(gate_enc, enc_now, lambda c: c, cached)
                eps, aux = unet.apply(params, enc, emb, e, controls, capture,
                                      method=unet.decode)
                return eps, aux, enc

            def _zero_enc(batch, e, capture):
                """Zeros with encode()'s output structure (cache init; step 0
                is always a key step so these are never consumed)."""

                def f(p, lat1, ee):
                    x = jnp.concatenate([lat1] * batch, axis=0)
                    emb = unet.apply(p, jnp.int32(0), batch, None,
                                     method=unet.embed_time)
                    return unet.apply(p, x, emb, ee, None, capture,
                                      method=unet.encode)

                shapes = jax.eval_shape(f, params, latents, e)
                return jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )

            def body(carry, i):
                lat_all, st, enc_carry = carry
                lat = lat_all[0:1]
                t = plan.timesteps[i]
                gate = ctl["inject_gates"][i]
                enc_gate = ctl["enc_gates"][i]
                lat_in = sched.scale_model_input(plan, i, lat)

                if run_reference and not enc_reuse:
                    # ONE [uncond, base, ref_u, ref_c, spans...] forward: the
                    # span rows take the ref-cond row's (Q,K) at every attn1
                    # + its inject-resnet feature IN-BATCH
                    # (UNetControls.inject_src) — mathematically the
                    # reference's capture-then-inject forward pair
                    # (region_diffusion.py:313-395) with no per-layer (Q,K)
                    # HBM roundtrip and one launch of R+4 rows instead of
                    # 4 + R.
                    lat_ref = lat_all[1:2]
                    ref_in = sched.scale_model_input(plan, i, lat_ref)
                    xm = constrain(jnp.concatenate(
                        [lat_in, lat_in, ref_in, ref_in]
                        + [lat_in] * R, axis=0))
                    em = jnp.concatenate(
                        [embeds[0:1], embeds[-1:], embeds[0:1], embeds[-1:],
                         embeds[1:1 + R]], 0)
                    twm = tsm = None
                    if use_tw:
                        twm = jnp.ones((R + 4, 77), jnp.float32).at[1].set(
                            ctl["tw_rows"][-1])
                        tsm = jnp.ones((R + 4, 77), jnp.float32).at[1].set(
                            ctl["ts_rows"][-1])
                    epsm, _, _ = unet_fwd(
                        xm, t, em,
                        UNetControls(
                            token_weights=twm, token_signs=tsm,
                            inject_gate=gate,
                            inject_src=3, inject_dst=(4, 4 + R),
                        ),
                        EMPTY_CAPTURE, None,
                    )
                    epsm = epsm.astype(jnp.float32)
                    enc_new = ()
                    eps_uncond = epsm[0:1]
                    eps_base = epsm[1:2]
                    eps_spans = epsm[4:]
                    eps_ref = epsm[2:3] + ctl["g"] * (epsm[3:4] - epsm[2:3])
                elif run_reference:
                    # encoder-reuse keeps the two-launch flow (the enc caches
                    # are per-launch pytrees)
                    lat_ref = lat_all[1:2]
                    ref_in = sched.scale_model_input(plan, i, lat_ref)
                    xa = jnp.concatenate([lat_in, lat_in, ref_in, ref_in], 0)
                    ea = jnp.stack(
                        [embeds[0], embeds[-1], embeds[0], embeds[-1]], 0
                    )
                    twa = tsa = None
                    if use_tw:
                        twa = jnp.ones((4, 77), jnp.float32)
                        twa = twa.at[1].set(ctl["tw_rows"][-1])
                        tsa = jnp.ones((4, 77), jnp.float32)
                        tsa = tsa.at[1].set(ctl["ts_rows"][-1])
                    eps_a, aux, enc_a = unet_fwd(
                        xa, t, ea,
                        UNetControls(token_weights=twa, token_signs=tsa),
                        capture_ref,
                        (enc_gate, enc_carry[0]),
                    )
                    eps_a = eps_a.astype(jnp.float32)
                    inj_qk = {
                        n: (q[3:4], k[3:4]) for n, (q, k) in aux["self_qk"].items()
                    }
                    inj_res = {
                        n: f[3:4] for n, f in aux["resnet_hidden"].items()
                    }
                    controls_b = UNetControls(
                        inject_gate=gate, inject_qk=inj_qk,
                        inject_resnet=inj_res,
                    )
                    xb = constrain(jnp.tile(lat_in, (R, 1, 1, 1)))
                    eb = embeds[1 : 1 + R]
                    eps_b, _, enc_b = unet_fwd(
                        xb, t, eb, controls_b, EMPTY_CAPTURE,
                        (enc_gate, enc_carry[1]),
                    )
                    eps_b = eps_b.astype(jnp.float32)
                    enc_new = (enc_a, enc_b)
                    eps_uncond = eps_a[0:1]
                    eps_base = eps_a[1:2]
                    eps_spans = eps_b
                    eps_ref = eps_a[2:3] + ctl["g"] * (eps_a[3:4] - eps_a[2:3])
                else:
                    x = constrain(jnp.concatenate([lat_in] * (R + 2), axis=0))
                    controls = UNetControls(
                        token_weights=ctl["tw_rows"], token_signs=ctl["ts_rows"]
                    ) if use_tw else None
                    eps_all, _, enc_x = unet_fwd(
                        x, t, embeds, controls, EMPTY_CAPTURE,
                        (enc_gate, enc_carry[0]) if enc_reuse else None,
                    )
                    enc_new = (enc_x,) if enc_reuse else ()
                    eps_all = eps_all.astype(jnp.float32)
                    eps_uncond = eps_all[0:1]
                    eps_spans = eps_all[1 : 1 + R]
                    eps_base = eps_all[R + 1 : R + 2]

                # ---- composite under masks (region_diffusion.py:119-128)
                mask_sum = masks.sum(0, keepdims=False)  # [h,w,1] ≈ 1
                noise_uncond = eps_uncond * mask_sum[None]
                noise_text = eps_base * masks[-1][None]
                if R > 0:
                    noise_text = noise_text + (eps_spans * masks[:-1]).sum(
                        0, keepdims=True
                    )
                noise = noise_uncond + ctl["g"] * (noise_text - noise_uncond)

                # ---- scheduler step (both trajectories stacked)
                if run_reference:
                    eps_pair = jnp.concatenate([noise, eps_ref], axis=0)
                    lat_pair, st_new = sched.step(
                        plan, i, st, eps_pair, lat_all
                    )
                    lat, lat_ref = lat_pair[0:1], lat_pair[1:2]
                else:
                    lat, st_new = sched.step(plan, i, st, noise, lat_all)
                    lat_ref = None

                # ---- gradient color guidance (region_diffusion.py:151-168)
                if use_grad:
                    def color_loss(l):
                        a = ctl["alpha_raw"][i]
                        x0 = (l - noise * jnp.sqrt(1 - a)) / jnp.sqrt(a)
                        if guidance_ds > 1:
                            d = guidance_ds
                            _, hh, ww, c = x0.shape
                            x0 = x0.reshape(
                                1, hh // d, d, ww // d, d, c
                            ).mean((2, 4))
                        imgs = decode(
                            vae_params,
                            x0.astype(jnp.float32) / vae_cfg.scaling_factor,
                        )
                        imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
                        # imgs [1,H,W,3]; masks [n,H,W]
                        m = ctl["color_masks_px"]
                        if guidance_ds > 1:
                            d = guidance_ds
                            n, hp, wp = m.shape
                            m = m.reshape(
                                n, hp // d, d, wp // d, d
                            ).mean((2, 4))
                        num = jnp.einsum("bhwc,nhw->nc", imgs, m)
                        den = m.sum(axis=(1, 2))[:, None] + 1e-12
                        avg_rgb = num / den
                        per = jnp.mean(
                            (avg_rgb - ctl["target_rgb"]) ** 2, axis=1
                        ) * 100.0
                        return per.sum()

                    def guided(l):
                        grad = jax.grad(color_loss)(l)
                        return l - grad * ctl["color_w"] * ctl["color_all"]

                    lat = jax.lax.cond(
                        ctl["guidance_gates"][i], guided, lambda l: l, lat
                    )

                # ---- background injection (region_diffusion.py:171-173)
                if run_reference:
                    bg = ctl["bg_gates"][i]
                    lat = jnp.where(
                        bg,
                        lat_ref * masks[-1][None] + lat * (1 - masks[-1][None]),
                        lat,
                    )
                    lat_all_new = jnp.concatenate([lat, lat_ref], axis=0)
                else:
                    lat_all_new = lat
                return (lat_all_new, st_new, enc_new), None

            lat0 = (
                jnp.concatenate([latents, latents], axis=0)
                if run_reference
                else latents
            )
            if not enc_reuse:
                enc0 = ()
            elif run_reference:
                ea0 = jnp.stack([embeds[0], embeds[-1], embeds[0], embeds[-1]])
                enc0 = (_zero_enc(4, ea0, capture_ref),
                        _zero_enc(R, embeds[1 : 1 + R], EMPTY_CAPTURE))
            else:
                enc0 = (_zero_enc(R + 2, embeds, EMPTY_CAPTURE),)
            (lat_fin, _, _), _ = jax.lax.scan(
                body, (lat0, st0, enc0), jnp.arange(num_steps)
            )
            return lat_fin[0:1]

        self._jit_cache[key] = run
        return run

    def _rich_fn_refpre(self, latent_hw, num_steps, n_styles, use_grad,
                        use_tw, enc_reuse, bf16_guidance, guidance_ds,
                        has_qk, bg_idx, use_bg):
        """Rich scan against a PRECOMPUTED refer trajectory — SD variant of
        RegionDiffusionXL._rich_fn_refpre (see its docstring; reference
        recompute: region_diffusion.py:99-148). One [uncond, spans..., base]
        launch of R+2 rows at every step: injection reads the plain pass's
        stored per-step (Q, K)/resnet via ``ctl['slot_of_step']``;
        background injection reads ``cache['traj'][bg_idx]``."""
        key = ("richpre", latent_hw, num_steps, n_styles, use_grad, use_tw,
               enc_reuse, bf16_guidance, guidance_ds, has_qk, bg_idx, use_bg)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        vae = (AutoencoderKL(self.vae_cfg, dtype=jnp.bfloat16)
               if bf16_guidance else self.vae)
        vae_cfg = self.vae_cfg
        constrain = self._constrain_batch
        R = n_styles - 1

        @jax.jit
        def run(params, vae_params, latents, embeds, masks, plan, ctl,
                cache):
            st0 = sched.init_state(latents.shape)
            decode = jax.checkpoint(
                lambda vp, z: vae.apply(vp, z, method=vae.decode)
            )

            def unet_fwd(x, t, e, controls, enc_cache):
                emb = unet.apply(params, t, x.shape[0], None,
                                 method=unet.embed_time)

                def enc_now(_):
                    return unet.apply(params, x, emb, e, controls,
                                      EMPTY_CAPTURE, method=unet.encode)

                if enc_cache is None:
                    enc = enc_now(None)
                else:
                    gate_enc, cached = enc_cache
                    enc = jax.lax.cond(gate_enc, enc_now, lambda c: c, cached)
                eps, _ = unet.apply(params, enc, emb, e, controls,
                                    EMPTY_CAPTURE, method=unet.decode)
                return eps, enc

            def _zero_enc():
                def f(p, lat1, ee):
                    x = jnp.concatenate([lat1] * (R + 2), axis=0)
                    emb = unet.apply(p, jnp.int32(0), R + 2, None,
                                     method=unet.embed_time)
                    return unet.apply(p, x, emb, ee, None, EMPTY_CAPTURE,
                                      method=unet.encode)

                shapes = jax.eval_shape(f, params, latents, embeds)
                return jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )

            def body(carry, i):
                lat, st, enc_carry = carry
                t = plan.timesteps[i]
                gate = ctl["inject_gates"][i]
                lat_in = sched.scale_model_input(plan, i, lat)
                x = constrain(jnp.concatenate([lat_in] * (R + 2), axis=0))

                kw = {}
                if has_qk:
                    slot = ctl["slot_of_step"][i]
                    kw = dict(
                        inject_gate=gate,
                        inject_qk={
                            n: tuple(
                                jax.lax.dynamic_index_in_dim(
                                    b, slot, 0, keepdims=True)
                                for b in bufs)
                            for n, bufs in cache["qk"].items()
                        },
                        inject_resnet={
                            n: jax.lax.dynamic_index_in_dim(
                                b, slot, 0, keepdims=True)
                            for n, b in cache["resnet"].items()
                        },
                        inject_dst=(1, 1 + R),
                    )
                controls = UNetControls(
                    token_weights=ctl["tw_rows"] if use_tw else None,
                    token_signs=ctl["ts_rows"] if use_tw else None,
                    **kw,
                ) if (use_tw or has_qk) else None

                eps_all, enc_x = unet_fwd(
                    x, t, embeds, controls,
                    (ctl["enc_gates"][i], enc_carry[0]) if enc_reuse
                    else None,
                )
                enc_new = (enc_x,) if enc_reuse else ()
                eps_all = eps_all.astype(jnp.float32)
                eps_uncond = eps_all[0:1]
                eps_spans = eps_all[1:1 + R]
                eps_base = eps_all[R + 1:R + 2]

                # composite under masks (region_diffusion.py:119-128)
                mask_sum = masks.sum(0, keepdims=False)
                noise_uncond = eps_uncond * mask_sum[None]
                noise_text = eps_base * masks[-1][None]
                if R > 0:
                    noise_text = noise_text + (eps_spans * masks[:-1]).sum(
                        0, keepdims=True
                    )
                noise = noise_uncond + ctl["g"] * (noise_text - noise_uncond)
                lat, st = sched.step(plan, i, st, noise, lat)

                # gradient color guidance (region_diffusion.py:151-168)
                if use_grad:
                    def color_loss(l):
                        a = ctl["alpha_raw"][i]
                        x0 = (l - noise * jnp.sqrt(1 - a)) / jnp.sqrt(a)
                        if guidance_ds > 1:
                            d = guidance_ds
                            _, hh, ww, c = x0.shape
                            x0 = x0.reshape(
                                1, hh // d, d, ww // d, d, c
                            ).mean((2, 4))
                        imgs = decode(
                            vae_params,
                            x0.astype(jnp.float32) / vae_cfg.scaling_factor,
                        )
                        imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
                        m = ctl["color_masks_px"]
                        if guidance_ds > 1:
                            d = guidance_ds
                            n, hp, wp = m.shape
                            m = m.reshape(
                                n, hp // d, d, wp // d, d
                            ).mean((2, 4))
                        num = jnp.einsum("bhwc,nhw->nc", imgs, m)
                        den = m.sum(axis=(1, 2))[:, None] + 1e-12
                        per = jnp.mean(
                            (num / den - ctl["target_rgb"]) ** 2, axis=1
                        ) * 100.0
                        return per.sum()

                    def guided(l):
                        grad = jax.grad(color_loss)(l)
                        return l - grad * ctl["color_w"] * ctl["color_all"]

                    lat = jax.lax.cond(
                        ctl["guidance_gates"][i], guided, lambda l: l, lat
                    )

                # background injection (region_diffusion.py:171-173); the
                # trajectory is stored [h, w*C], reshape back
                if use_bg:
                    lat_bg = cache["traj"][bg_idx].reshape(lat.shape)
                    lat = jnp.where(
                        ctl["bg_gates"][i],
                        lat_bg * masks[-1][None] + lat * (1 - masks[-1][None]),
                        lat,
                    )
                return (lat, st, enc_new), None

            enc0 = (_zero_enc(),) if enc_reuse else ()
            (lat, _, _), _ = jax.lax.scan(
                body, (latents, st0, enc0), jnp.arange(num_steps)
            )
            return lat

        self._jit_cache[key] = run
        return run

    # ----------------------------------------------- batched color benchmark
    def color_bench_batch(
        self,
        region_prompts: Sequence[str],  # K region prompts ("<color> <obj>")
        base_prompt: str,
        target_rgbs: np.ndarray,  # [K, 3] float in [0,1]
        region_mask_px: np.ndarray,  # [H, W] pixel-space guidance mask
        height: int,
        width: int,
        num_inference_steps: int,
        guidance_scale: float,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,  # [1,h,w,4] shared init
        inject_selfattn: float = 0.2,
        inject_background: float = 0.3,
        color_guidance_weight: float = 1.0,
        guidance_start_step: int = 999,
        bf16_guidance: bool = False,
        guidance_downsample: int = 1,
    ) -> np.ndarray:
        """K color-benchmark items in ONE scan (TPU-native batch-DP).

        The reference benchmark loops colors sequentially
        (benchmark_color.py:241-276), paying `2 + R + 2` UNet rows per item
        per step. Within one (seed, prompt) the reference trajectory is
        *identical across colors* (it never sees the region prompt), so
        this path batches the per-item rows [uncond_k | base_k | region_k]
        into one UNet call and computes the two reference rows once —
        3 + 2/K rows per item instead of 5, and the item axis is the
        natural dp-sharding axis under a mesh. Results match the
        sequential path (differential-tested).

        ``self.masks`` must hold [region_mask, background_mask] shared by
        all K items. Returns uint8 images [K, H, W, 3].
        """
        K = len(region_prompts)
        assert len(self.masks) == 2, "color bench uses [region, background]"
        h, w = height // self.vae_scale_factor, width // self.vae_scale_factor
        embeds = self.get_text_embeds(
            list(region_prompts) + [base_prompt], [""]
        )  # [1 + K + 1, 77, D]: uncond, regions..., base
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (1, h, w, self.unet_cfg.in_channels)
            )
        plan = self.scheduler.plan(num_inference_steps)
        lat0 = jnp.tile(latents * getattr(plan, "init_noise_sigma", 1.0),
                        (K, 1, 1, 1))
        ref0 = latents * getattr(plan, "init_noise_sigma", 1.0)
        S = plan.num_steps
        inject_gates = plan.timesteps.astype(np.float64) > (
            (1 - inject_selfattn) * 1000
        )
        bg_step = int(inject_background * S)
        bg_gates = (np.arange(S) == bg_step) & (inject_background > 0)
        # Past the refer trajectory's last USE (final injection-gate step /
        # the background-injection step) its two rows + (Q,K)+resnet capture
        # are dead compute — same ref-skip as RegionDiffusionXL._sample_rich:
        # drop them and merge the per-item rows into ONE [uncond|base|region]
        # forward. Output-exact (the frozen ref/st_ref are never read again).
        inject_steps = np.nonzero(inject_gates)[0]
        last_inject = int(inject_steps[-1]) if len(inject_steps) else -1
        last_bg = bg_step if inject_background > 0 else -1
        last_use = max(last_inject, last_bg)
        ref_step_gates = np.arange(S) <= last_use
        ref_skip = bool(not ref_step_gates.all())
        guidance_gates = plan.timesteps.astype(np.int64) < guidance_start_step
        alpha_raw = self.scheduler.alphas_cumprod[plan.timesteps].astype(
            np.float32
        )
        masks = jnp.asarray(
            np.stack([np.asarray(m).reshape(h, w) for m in self.masks])
        )[..., None]  # [2, h, w, 1]

        gds = max(int(guidance_downsample), 1)
        if h % gds or w % gds or height % gds or width % gds:
            gds = 1  # non-divisible shapes: fall back to the exact path
        fn = self._colorbatch_fn((h, w), S, K, bf16_guidance,
                                 ref_skip=ref_skip, guidance_ds=gds)
        lat = fn(
            self.unet_params, self.vae_params, lat0, ref0, embeds, masks,
            _plan_arrays(plan),
            dict(
                g=jnp.float32(guidance_scale),
                inject_gates=jnp.asarray(inject_gates),
                ref_step_gates=jnp.asarray(ref_step_gates),
                bg_gates=jnp.asarray(bg_gates),
                guidance_gates=jnp.asarray(guidance_gates),
                alpha_raw=jnp.asarray(alpha_raw),
                color_mask_px=jnp.asarray(
                    np.asarray(region_mask_px).reshape(height, width)
                ),
                target_rgb=jnp.asarray(np.asarray(target_rgbs).reshape(K, 3)),
                color_all=jnp.asarray(
                    np.asarray(self.masks[0]).reshape(h, w)
                )[None, :, :, None],
                color_w=jnp.float32(color_guidance_weight),
            ),
        )
        return self.decode_latents(lat)

    def _colorbatch_fn(self, latent_hw, num_steps, K, bf16_guidance=False,
                       ref_skip=False, guidance_ds=1):
        key = ("colorbatch", latent_hw, num_steps, K, bf16_guidance, ref_skip,
               guidance_ds)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        vae = (AutoencoderKL(self.vae_cfg, dtype=jnp.bfloat16)
               if bf16_guidance else self.vae)
        vae_cfg = self.vae_cfg
        constrain = self._constrain_batch

        @jax.jit
        def run(params, vae_params, lat0, ref0, embeds, masks, plan, ctl):
            st0 = sched.init_state(lat0.shape)
            st_ref0 = sched.init_state(ref0.shape)
            decode = jax.checkpoint(
                lambda vp, z: vae.apply(vp, z, method=vae.decode)
            )
            uncond_e, base_e = embeds[0], embeds[-1]
            region_e = embeds[1:-1]  # [K, 77, D]

            def body(carry, i):
                lat, ref, st, st_ref = carry
                t = plan.timesteps[i]
                gate = ctl["inject_gates"][i]
                lat_in = sched.scale_model_input(plan, i, lat)  # [K,...]
                ref_in = sched.scale_model_input(plan, i, ref)  # [1,...]

                def _with_ref(_):
                    # ONE [ref_u, ref_c, uncond_k | base_k | region_k]
                    # forward: the K region rows take the ref-cond row's
                    # (Q,K)/inject-resnet feature IN-BATCH
                    # (UNetControls.inject_src) — the reference's
                    # capture-then-inject pair with no HBM roundtrip;
                    # uncond/base rows sit outside inject_dst and run clean
                    xm = constrain(jnp.concatenate(
                        [ref_in, ref_in, lat_in, lat_in, lat_in], 0))
                    em = jnp.concatenate([
                        uncond_e[None], base_e[None],
                        jnp.tile(uncond_e[None], (K, 1, 1)),
                        jnp.tile(base_e[None], (K, 1, 1)),
                        region_e,
                    ], 0)
                    epsm, _ = unet.apply(
                        params, xm, t, em,
                        controls=UNetControls(
                            inject_gate=gate,
                            inject_src=1, inject_dst=(2 + 2 * K, 2 + 3 * K),
                        ),
                    )
                    epsm = epsm.astype(jnp.float32)
                    eps_ref = (epsm[0:1]
                               + ctl["g"] * (epsm[1:2] - epsm[0:1]))
                    return (epsm[2:2 + K], epsm[2 + K:2 + 2 * K],
                            epsm[2 + 2 * K:], eps_ref)

                def _no_ref(_):
                    # ref-skip steps: one merged [uncond_k|base_k|region_k]
                    # forward, capture/controls-free (3 launches of 2+2K+K
                    # rows → 1 launch of 3K)
                    xm = constrain(
                        jnp.concatenate([lat_in, lat_in, lat_in], 0))
                    em = jnp.concatenate([
                        jnp.tile(uncond_e[None], (K, 1, 1)),
                        jnp.tile(base_e[None], (K, 1, 1)),
                        region_e,
                    ], 0)
                    epsm, _ = unet.apply(params, xm, t, em)
                    epsm = epsm.astype(jnp.float32)
                    return (epsm[:K], epsm[K:2 * K], epsm[2 * K:],
                            jnp.zeros((1,) + lat_in.shape[1:], jnp.float32))

                if ref_skip:
                    eps_uncond, eps_base, eps_reg, eps_ref = jax.lax.cond(
                        ctl["ref_step_gates"][i], _with_ref, _no_ref, None
                    )
                else:
                    eps_uncond, eps_base, eps_reg, eps_ref = _with_ref(None)

                # composite under [region, background] masks
                mask_sum = masks.sum(0)  # [h,w,1]
                noise_uncond = eps_uncond * mask_sum[None]
                noise_text = (eps_base * masks[1][None]
                              + eps_reg * masks[0][None])
                noise = noise_uncond + ctl["g"] * (noise_text - noise_uncond)

                lat, st = sched.step(plan, i, st, noise, lat)
                if ref_skip:
                    # freeze ref + st_ref on skip steps (ref is never read
                    # again; keeps multistep-scheduler history in sync)
                    def _adv(a):
                        r, s = sched.step(plan, i, a[0], eps_ref, a[1])
                        return r, s

                    ref, st_ref = jax.lax.cond(
                        ctl["ref_step_gates"][i], _adv,
                        lambda a: (a[1], a[0]),
                        (st_ref, ref),
                    )
                else:
                    ref, st_ref = sched.step(plan, i, st_ref, eps_ref, ref)

                # color guidance: the loss decomposes per item, and the
                # VAE forward+backward at batch K blows HBM (measured: K=4
                # OOMs, K=2 schedules poorly) — lax.map serializes the
                # decode at batch 1 (the sequential path's peak memory)
                # while the UNet rows above stay batched
                def color_grad_one(args):
                    l1, n1, t1 = args  # [h,w,4], [h,w,4], [3]

                    def loss1(x):
                        a = ctl["alpha_raw"][i]
                        x0 = (x[None] - n1[None] * jnp.sqrt(1 - a)) / jnp.sqrt(a)
                        if guidance_ds > 1:
                            d = guidance_ds
                            _, hh, ww, c = x0.shape
                            x0 = x0.reshape(
                                1, hh // d, d, ww // d, d, c
                            ).mean((2, 4))
                        imgs = decode(
                            vae_params,
                            x0.astype(jnp.float32) / vae_cfg.scaling_factor,
                        )
                        imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
                        m = ctl["color_mask_px"]  # [H, W]
                        if guidance_ds > 1:
                            d = guidance_ds
                            hp, wp = m.shape
                            m = m.reshape(hp // d, d, wp // d, d).mean((1, 3))
                        avg_rgb = jnp.einsum("bhwc,hw->c", imgs, m) / (
                            m.sum() + 1e-12
                        )
                        return jnp.mean((avg_rgb - t1) ** 2) * 100.0

                    return jax.grad(loss1)(l1)

                def guided(l):
                    grads = jax.lax.map(
                        color_grad_one, (l, noise, ctl["target_rgb"])
                    )
                    return l - grads * ctl["color_w"] * ctl["color_all"]

                lat = jax.lax.cond(
                    ctl["guidance_gates"][i], guided, lambda l: l, lat
                )
                # background injection
                bg = ctl["bg_gates"][i]
                lat = jnp.where(
                    bg, ref * masks[1][None] + lat * (1 - masks[1][None]), lat
                )
                return (lat, ref, st, st_ref), None

            (lat, _, _, _), _ = jax.lax.scan(
                body, (lat0, ref0, st0, st_ref0), jnp.arange(num_steps)
            )
            return lat

        self._jit_cache[key] = run
        return run

    # ----------------------------------------------- batched style benchmark
    def style_bench_batch(
        self,
        item_prompts: Sequence[Sequence[str]],  # K × (R+1): spans..., base
        height: int,
        width: int,
        num_inference_steps: int,
        guidance_scale: float,
        seed: int = 0,
        latents: Optional[jnp.ndarray] = None,  # [1,h,w,4] shared init
    ) -> np.ndarray:
        """K style-benchmark items in ONE scan (TPU-native batch-DP).

        The reference loops style pairs sequentially
        (benchmark_style.py:112-142); within one (seed, scene) the masks
        and initial latent are shared and the rich pass uses no
        injection/guidance, so K items batch into one UNet call of
        K·(R+2) rows — the item axis dp-shards under a mesh. Per-item
        results match the sequential prompt_to_img (differential-tested).

        Returns uint8 images [K, H, W, 3].
        """
        K = len(item_prompts)
        R = len(self.masks) - 1
        assert all(len(p) == R + 1 for p in item_prompts)
        h, w = height // self.vae_scale_factor, width // self.vae_scale_factor
        flat = [p for item in item_prompts for p in item]
        embeds = self.get_text_embeds(flat, [""])  # [1 + K*(R+1), 77, D]
        item_e = embeds[1:].reshape(K, R + 1, *embeds.shape[1:])
        uncond = jnp.tile(embeds[0][None, None], (K, 1, 1, 1))
        item_e = jnp.concatenate([uncond, item_e], axis=1)  # [K, R+2, ...]
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (1, h, w, self.unet_cfg.in_channels)
            )
        plan = self.scheduler.plan(num_inference_steps)
        lat0 = jnp.tile(latents * getattr(plan, "init_noise_sigma", 1.0),
                        (K, 1, 1, 1))
        masks = jnp.asarray(
            np.stack([np.asarray(m).reshape(h, w) for m in self.masks])
        )[..., None]  # [R+1, h, w, 1]

        fn = self._stylebatch_fn((h, w), plan.num_steps, R + 1, K)
        lat = fn(self.unet_params, lat0, item_e, masks, _plan_arrays(plan),
                 jnp.float32(guidance_scale))
        return self.decode_latents(lat)

    def _stylebatch_fn(self, latent_hw, num_steps, n_styles, K):
        key = ("stylebatch", latent_hw, num_steps, n_styles, K)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        constrain = self._constrain_batch
        R = n_styles - 1
        B = n_styles + 1  # rows per item: uncond, spans..., base

        @jax.jit
        def run(params, lat0, item_e, masks, plan, g):
            st0 = sched.init_state(lat0.shape)
            e_flat = item_e.reshape(K * B, *item_e.shape[2:])

            def body(carry, i):
                lat, st = carry
                t = plan.timesteps[i]
                lat_in = sched.scale_model_input(plan, i, lat)  # [K,...]
                x = constrain(
                    jnp.repeat(lat_in, B, axis=0)
                )  # [K*B,...] items-major
                eps, _ = unet.apply(params, x, t, e_flat)
                eps = eps.astype(jnp.float32).reshape(K, B, *lat.shape[1:])
                mask_sum = masks.sum(0)  # [h,w,1]
                noise_uncond = eps[:, 0] * mask_sum[None]
                noise_text = eps[:, -1] * masks[-1][None]
                if R > 0:
                    noise_text = noise_text + jnp.einsum(
                        "krhwc,rhwc->khwc", eps[:, 1:1 + R], masks[:-1]
                    )
                noise = noise_uncond + g * (noise_text - noise_uncond)
                lat, st = sched.step(plan, i, st, noise, lat)
                return (lat, st), None

            (lat, _), _ = jax.lax.scan(
                body, (lat0, st0), jnp.arange(num_steps)
            )
            return lat

        self._jit_cache[key] = run
        return run

    # --------------------------------------------------------------- helper
    def predict_x0(self, x_t, eps_t, t: int):
        a = float(self.scheduler.alphas_cumprod[int(t)])
        return (x_t - eps_t * np.sqrt(1 - a)) / np.sqrt(a)


def _plan_arrays(plan):
    """Device-ify every array field of a scheduler plan dataclass."""
    updates = {
        f.name: jnp.asarray(getattr(plan, f.name))
        for f in dataclasses.fields(plan)
        if isinstance(getattr(plan, f.name), (np.ndarray, jnp.ndarray))
    }
    return dataclasses.replace(plan, **updates)


def _init_shapes_sd(unet, vae, text):
    """Shape-only init trees for the converter (no FLOPs)."""
    u = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, unet.cfg.sample_size, unet.cfg.sample_size,
                       unet.cfg.in_channels)),
            jnp.int32(0),
            jnp.zeros((1, 77, unet.cfg.cross_attention_dim)),
        )
    )
    px = unet.cfg.sample_size * 8
    v = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, px, px, 3)))
    )
    t = jax.eval_shape(
        lambda: text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    )
    return u, v, t
