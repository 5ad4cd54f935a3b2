"""RegionDiffusionXL — the SDXL/AnimeXL rich-text pipeline, TPU-native.

Re-designs models/region_diffusion_sdxl.py (reference): dual CLIP text
encoders (penultimate hidden states concatenated, projected pooled output —
:351-356), text_time micro-conditioning (:539-553), EulerDiscrete scheduler
with ``scale_model_input`` per forward (:784), fp32 VAE decode (:916-917),
and the same rich region loop as SD but with SDXL's gating quirks:

  * self-attention capture *accumulates* over steps>10 for **all** attn1
    layers (no registry filter — :986-992), unlike SD's last-step overwrite;
  * the reference-trajectory scheduler step is gated on
    ``inject_selfattn > 0 or i < inject_background*len`` (:832 — the refer
    latents stop evolving after the background window when only background
    injection is on);
  * background composite at ``i == int(inject_background*len)`` (:870).

The reference's "efficient" variant (C7: CPU offload, bf16 decode) is
unnecessary on TPU HBM — bf16 UNet + fp32 VAE is the policy here.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

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
from ..schedulers import EulerDiscreteScheduler
from ..utils.registries import CrossAttentionLayers_XL, attn_layer_resolutions
from ..utils.token_maps import SEG_RESOLUTION, AttnAggregates
from .base import (MeshDecodeMixin, encoder_key_gates,
                   ref_cache_matches, ref_fingerprint)
from .region_sd import RichControlSpec, _plan_arrays


class RegionDiffusionXL(MeshDecodeMixin):
    """SDXL rich-text-to-image pipeline (also AnimeXL checkpoints)."""

    def __init__(
        self,
        unet_params,
        vae_params,
        text_params,
        text2_params,
        tokenizer: CLIPTokenizer,
        tokenizer_2: CLIPTokenizer,
        unet_cfg: cfgs.UNetConfig = cfgs.SDXL_UNET,
        vae_cfg: cfgs.VAEConfig = cfgs.SDXL_VAE,
        text_cfg: cfgs.CLIPTextConfig = cfgs.SDXL_TEXT,
        text2_cfg: cfgs.CLIPTextConfig = cfgs.SDXL_TEXT_2,
        dtype=jnp.bfloat16,
        force_zeros_for_empty_prompt: bool = True,
        agg_start_step: int = 10,
        mesh=None,
        scheduler=None,
        vae_dtype=jnp.float32,
    ):
        # vae_dtype: the reference decodes fp32 for SDXL (its fp16 VAE
        # overflows, region_diffusion_sdxl.py:916-917); on TPU bf16 keeps
        # fp32 RANGE, so bf16 decode is the "efficient"-variant trade
        # (region_diffusion_sdxl_efficient.py bf16 decode) — opt-in,
        # ~4× faster matmuls at 8-bit-pixel-invisible precision cost.
        self.unet = UNet2DCondition(unet_cfg, dtype=dtype)
        self.vae = AutoencoderKL(vae_cfg, dtype=vae_dtype)
        self.text_encoder = CLIPTextModel(text_cfg, dtype=jnp.float32)
        self.text_encoder_2 = CLIPTextModel(text2_cfg, dtype=jnp.float32)
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.text_params = text_params
        self.text2_params = text2_params
        self.tokenizer = tokenizer
        self.tokenizer_2 = tokenizer_2
        self.unet_cfg = unet_cfg
        self.vae_cfg = vae_cfg
        self.scheduler = (scheduler if scheduler is not None
                          else EulerDiscreteScheduler())
        self.dtype = dtype
        self.force_zeros_for_empty_prompt = force_zeros_for_empty_prompt
        self.agg_start_step = agg_start_step
        self.vae_scale_factor = 2 ** (len(vae_cfg.block_out_channels) - 1)
        self.default_sample_size = unet_cfg.sample_size
        self.masks: list[np.ndarray] = []
        self._jit_cache: dict[Any, Any] = {}
        self.mesh = mesh
        if mesh is not None:
            self.use_mesh(mesh)

    # use_mesh / _constrain_batch / _decode come from MeshDecodeMixin

    # ------------------------------------------------------------ factories
    @classmethod
    def from_pretrained(cls, checkpoint_dir: str, dtype=jnp.bfloat16, **kw):
        import os

        from ..models.convert import (
            convert_clip_text,
            convert_unet,
            convert_vae,
            load_safetensors_dir,
        )

        tok = CLIPTokenizer.from_pretrained(os.path.join(checkpoint_dir, "tokenizer"))
        tok2 = CLIPTokenizer.from_pretrained(
            os.path.join(checkpoint_dir, "tokenizer_2"), pad_token="!"
        )
        unet = UNet2DCondition(cfgs.SDXL_UNET, dtype=dtype)
        vae = AutoencoderKL(cfgs.SDXL_VAE)
        text = CLIPTextModel(cfgs.SDXL_TEXT)
        text2 = CLIPTextModel(cfgs.SDXL_TEXT_2)

        def shapes(m, *a):
            return jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), *a))

        s = cfgs.SDXL_UNET.sample_size
        u_t = shapes(
            unet,
            jnp.zeros((1, s, s, 4)),
            jnp.int32(0),
            jnp.zeros((1, 77, 2048)),
            {"text_embeds": jnp.zeros((1, 1280)),
             "time_ids": jnp.zeros((1, 6))},
        )
        v_t = shapes(vae, jnp.zeros((1, s * 8, s * 8, 3)))
        t_t = shapes(text, jnp.zeros((1, 77), jnp.int32))
        t2_t = shapes(text2, jnp.zeros((1, 77), jnp.int32))
        return cls(
            {"params": convert_unet(
                load_safetensors_dir(os.path.join(checkpoint_dir, "unet")),
                cfgs.SDXL_UNET, u_t["params"], dtype=dtype)},
            {"params": convert_vae(
                load_safetensors_dir(os.path.join(checkpoint_dir, "vae")),
                cfgs.SDXL_VAE, v_t["params"])},
            {"params": convert_clip_text(
                load_safetensors_dir(os.path.join(checkpoint_dir, "text_encoder")),
                cfgs.SDXL_TEXT, t_t["params"])},
            {"params": convert_clip_text(
                load_safetensors_dir(
                    os.path.join(checkpoint_dir, "text_encoder_2")),
                cfgs.SDXL_TEXT_2, t2_t["params"])},
            tok, tok2, dtype=dtype, **kw,
        )

    @classmethod
    def random_init(
        cls,
        seed: int = 0,
        unet_cfg: cfgs.UNetConfig = cfgs.SDXL_UNET,
        vae_cfg: cfgs.VAEConfig = cfgs.SDXL_VAE,
        text_cfg: cfgs.CLIPTextConfig = cfgs.SDXL_TEXT,
        text2_cfg: cfgs.CLIPTextConfig = cfgs.SDXL_TEXT_2,
        tokenizer: CLIPTokenizer | None = None,
        dtype=jnp.bfloat16,
        **kw,
    ):
        tokenizer = tokenizer or CLIPTokenizer.byte_level()
        tokenizer_2 = kw.pop("tokenizer_2", None) or tokenizer
        vocab = max(len(tokenizer.encoder), len(tokenizer_2.encoder))
        if vocab > text_cfg.vocab_size:
            text_cfg = dataclasses.replace(text_cfg, vocab_size=vocab)
        if vocab > text2_cfg.vocab_size:
            text2_cfg = dataclasses.replace(text2_cfg, vocab_size=vocab)
        from ..models.init_utils import fast_init

        unet = UNet2DCondition(unet_cfg, dtype=dtype)
        vae = AutoencoderKL(vae_cfg)
        text = CLIPTextModel(text_cfg)
        text2 = CLIPTextModel(text2_cfg)
        s = unet_cfg.sample_size
        pooled_dim = text2_cfg.projection_dim or text2_cfg.hidden_size
        up = fast_init(
            unet, seed, jnp.zeros((1, s, s, unet_cfg.in_channels)),
            jnp.int32(0),
            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
            {"text_embeds": jnp.zeros((1, pooled_dim)),
             "time_ids": jnp.zeros((1, 6))},
            dtype=dtype,
        )
        px = s * 2 ** (len(vae_cfg.block_out_channels) - 1)
        vp = fast_init(vae, seed + 1, jnp.zeros((1, px, px, 3)))
        tp = fast_init(text, seed + 2, jnp.zeros((1, 77), jnp.int32))
        tp2 = fast_init(text2, seed + 3, jnp.zeros((1, 77), jnp.int32))
        return cls(up, vp, tp, tp2, tokenizer, tokenizer_2,
                   unet_cfg, vae_cfg, text_cfg, text2_cfg, dtype=dtype, **kw)

    # ----------------------------------------------------------------- text
    @functools.cached_property
    def _text_apply(self):
        eos1 = self.tokenizer.eos_token_id
        eos2 = self.tokenizer_2.eos_token_id

        # params are jit ARGUMENTS (closure constants would be baked into
        # the HLO — hundreds of MB through a remote-compile relay)
        @jax.jit
        def run(p1, p2, ids, ids2):
            o1 = self.text_encoder.apply(p1, ids, eos_token_id=eos1)
            o2 = self.text_encoder_2.apply(p2, ids2, eos_token_id=eos2)
            embeds = jnp.concatenate(
                [o1["penultimate"], o2["penultimate"]], axis=-1
            )
            pooled = o2.get("projected", o2["pooled"])
            return embeds, pooled

        return functools.partial(run, self.text_params, self.text2_params)

    def encode_prompt(self, prompts, negative_prompt=""):
        """[uncond, prompts...] embeds [N+1,77,2048] + pooled [N+1,P].

        force_zeros_for_empty_prompt: empty negative → zero embeddings
        (reference region_diffusion_sdxl.py:369-377).
        """
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(negative_prompt, (list, tuple)):
            negative_prompt = negative_prompt[0] if negative_prompt else ""
        ids = jnp.asarray(self.tokenizer(list(prompts)))
        ids2 = jnp.asarray(self.tokenizer_2(list(prompts)))
        embeds, pooled = self._text_apply(ids, ids2)
        if negative_prompt == "" and self.force_zeros_for_empty_prompt:
            neg_e = jnp.zeros_like(embeds[:1])
            neg_p = jnp.zeros_like(pooled[:1])
        else:
            nids = jnp.asarray(self.tokenizer([negative_prompt]))
            nids2 = jnp.asarray(self.tokenizer_2([negative_prompt]))
            neg_e, neg_p = self._text_apply(nids, nids2)
        return (
            jnp.concatenate([neg_e, embeds], axis=0),
            jnp.concatenate([neg_p, pooled], axis=0),
        )

    def _get_add_time_ids(self, original_size, crops_coords_top_left, target_size):
        return np.asarray(
            [list(original_size) + list(crops_coords_top_left) + list(target_size)],
            dtype=np.float32,
        )

    # ------------------------------------------------------------ VAE utils
    def decode_latents(self, latents) -> np.ndarray:
        if getattr(self, "_vae_tiling", False):
            from ..models.vae_tiling import tiled_decode

            # diffusers tile_latent_min_size = sample_size // 8 with the
            # SDXL vae's sample_size=1024 → 128-latent tiles
            imgs = tiled_decode(
                self._decode, np.asarray(latents),
                tile_latent=1024 // self.vae_scale_factor,
                scale=self.vae_scale_factor,
            )
        elif getattr(self, "_vae_slicing", False):
            from ..models.vae_tiling import sliced_decode

            imgs = sliced_decode(self._decode, np.asarray(latents))
        else:
            return np.asarray(self._watermarked(self._decode_u8(latents)))
        u8 = (imgs * 255).round().astype(np.uint8)
        return np.asarray(self._watermarked(u8))

    def _watermarked(self, images_u8):
        """Every decoded SDXL image carries the invisible watermark, like
        the reference (region_diffusion_sdxl.py:127,:943 —
        StableDiffusionXLWatermarker on the decoded batch). Images narrower
        than 256 px pass through (the reference encoder's own gate).
        Any falsy ``self.watermark`` (None/False) opts out (the reference
        has no opt-out; exposed for eval pipelines comparing raw pixels)."""
        if not getattr(self, "watermark", True):
            return images_u8
        from ..utils.watermark import apply_watermark

        return apply_watermark(images_u8)

    # Reference API parity (region_diffusion_sdxl.py:150-183). The other
    # "efficient"-variant memory tricks (accelerate CPU offload, meta
    # devices, :185-235) are CUDA workarounds with no TPU counterpart.
    def enable_vae_tiling(self):
        self._vae_tiling = True

    def disable_vae_tiling(self):
        self._vae_tiling = False

    def enable_vae_slicing(self):
        self._vae_slicing = True

    def disable_vae_slicing(self):
        self._vae_slicing = False

    # ------------------------------------------------------- capture layout
    def _capture_layout(self, latent_hw):
        res_map = attn_layer_resolutions(self.unet_cfg, latent_hw)
        seg_res = min(SEG_RESOLUTION, latent_hw[0] // 2)
        # SDXL: ALL attn1 layers at the segmentation resolution (no registry
        # filter, region_diffusion_sdxl.py:986-992)
        self_layers = tuple(
            n for n, r in sorted(res_map.items())
            if n.endswith(".attn1") and r == seg_res
        )
        cross_by_res: dict[int, tuple[str, ...]] = {}
        for n in CrossAttentionLayers_XL:
            r = res_map.get(n)
            if r is not None:
                cross_by_res.setdefault(r, ())
                cross_by_res[r] += (n,)
        return seg_res, self_layers, cross_by_res

    # --------------------------------------------------------------- sample
    def sample(
        self,
        prompt,
        negative_prompt="",
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        run_rich_text: bool = False,
        use_guidance: bool = False,
        inject_selfattn: float = 0.0,
        inject_background: float = 0.0,
        text_format_dict: Optional[dict] = None,
        latents: Optional[jnp.ndarray] = None,
        seed: int = 0,
        original_size: Optional[tuple] = None,
        crops_coords_top_left: tuple = (0, 0),
        target_size: Optional[tuple] = None,
        encoder_reuse: int = 1,
        encoder_schedule: str = "early",
        bf16_guidance: bool = False,
        guidance_downsample: int = 1,
        ref_capture_steps: Optional[tuple] = None,
        ref_cache: Optional[dict] = None,
    ):
        """Reference single-entry sample() (region_diffusion_sdxl.py:555):
        plain branch when run_rich_text=False, rich branch otherwise.

        ``ref_capture_steps`` (plain branch): also capture the refer cache —
        the latent trajectory plus cond-row (Q,K)/resnet features at the
        listed step indices — stashed as ``self.ref_cache``.  A later rich
        call with the SAME seed/prompt/steps can pass it as ``ref_cache`` to
        drop the in-batch refer rows (the reference recomputes that
        trajectory inside its rich loop, region_diffusion_sdxl.py:805-828;
        it is identical to the plain pass, so this is output-exact)."""
        if not isinstance(prompt, str):
            prompt = list(prompt)  # materialize once: encode_prompt and the
            # single-prompt guard below both consume it
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        embeds, pooled = self.encode_prompt(prompt, negative_prompt)
        add_time_ids = jnp.asarray(
            self._get_add_time_ids(original_size, crops_coords_top_left,
                                   target_size)
        )
        h, w = height // self.vae_scale_factor, width // self.vae_scale_factor
        plan = self.scheduler.plan(num_inference_steps)
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (1, h, w, self.unet_cfg.in_channels)
            )
        latents = latents * getattr(plan, "init_noise_sigma", 1.0)

        if not run_rich_text:
            if not isinstance(prompt, str):
                prompt = list(prompt)  # materialize once: a generator would
                if len(prompt) != 1:   # pass the guard but arrive exhausted
                    raise ValueError(
                        "plain-branch sample() takes exactly one prompt (the "
                        f"capture aggregates are per-prompt); got "
                        f"{len(prompt)}"
                    )
            seg_res, self_layers, cross_by_res = self._capture_layout((h, w))
            ref_slots = (tuple(int(s) for s in ref_capture_steps)
                         if ref_capture_steps is not None else None)
            if ref_slots and (
                self._ref_qk_bytes_per_slot((h, w)) * len(ref_slots)
                > self.ref_precompute_max_bytes
            ):
                # (Q,K) slots would not fit HBM alongside params — skip the
                # capture entirely; the rich pass falls back to the in-batch
                # merged flow
                ref_slots = None
            # release the previous run's cache BEFORE the scan allocates a
            # fresh one — holding both (~0.42 GB/slot at 1024²) OOMs HBM on
            # back-to-back run_sample calls
            self.ref_cache = None
            fn = self._plain_fn((h, w), plan.num_steps, seg_res, self_layers,
                                tuple(sorted(cross_by_res.items())),
                                ref_slots=ref_slots)
            out = fn(
                self.unet_params, latents, embeds[:2], pooled[:2],
                add_time_ids, _plan_arrays(plan),
                jnp.float32(guidance_scale),
            )
            if ref_slots is not None:
                lat, self_sum, cross, cache = out
                cache["steps"] = ref_slots
                # validity metadata: a later rich call only trusts this
                # cache if its guidance scale, resolution, initial latent
                # and uncond/base prompt rows all match (ref_cache_matches)
                cache["g"] = float(guidance_scale)
                cache["hw"] = (h, w)
                cache["fp"] = ref_fingerprint(
                    latents, embeds[0], embeds[1], pooled[0], pooled[1],
                    add_time_ids)
                self.ref_cache = cache
            else:
                lat, self_sum, cross = out
                self.ref_cache = None
            self.attn_aggregates = AttnAggregates(
                self_sum=self_sum,  # stays on device; fetched lazily
                self_count=len(self_layers),
                # one batched device_get: per-item np.asarray would pay the
                # relay's fixed round-trip latency once per resolution
                cross_sums=dict(zip(
                    (r for r, _ in sorted(cross_by_res.items())),
                    jax.device_get(tuple(cross)))),
                cross_layer_count=sum(len(v) for v in cross_by_res.values()),
            )
            return self.decode_latents(lat)

        return self._sample_rich(
            embeds, pooled, add_time_ids, (h, w), plan,
            RichControlSpec(
                guidance_scale=guidance_scale,
                inject_selfattn=inject_selfattn,
                inject_background=inject_background,
                use_guidance=use_guidance,
                guidance_start_step=(text_format_dict or {}).get(
                    "guidance_start_step", 999),
                color_guidance_weight=(text_format_dict or {}).get(
                    "color_guidance_weight", 1.0),
                encoder_reuse=int(encoder_reuse),
                encoder_schedule=encoder_schedule,
                bf16_guidance=bool(bf16_guidance),
                guidance_downsample=int(guidance_downsample),
            ),
            dict(text_format_dict or {}), latents, (height, width),
            ref_cache=ref_cache,
        )

    # wrapper so the SD-style CLI flow works identically
    def produce_attn_maps(self, prompts, negative_prompts="", height=1024,
                          width=1024, num_inference_steps=50,
                          guidance_scale=5.0, latents=None, seed=0,
                          ref_capture_steps=None):
        img = self.sample(
            prompts, negative_prompts, height=height, width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, run_rich_text=False,
            latents=latents, seed=seed,
            ref_capture_steps=ref_capture_steps,
        )
        return img, self.attn_aggregates

    def prompt_to_img(self, prompts, negative_prompts="", height=1024,
                      width=1024, num_inference_steps=50, guidance_scale=5.0,
                      latents=None, text_format_dict=None, use_guidance=False,
                      inject_selfattn=0.0, inject_background=0.0, seed=0,
                      encoder_reuse=1, encoder_schedule="early",
                      bf16_guidance=False, guidance_downsample=1,
                      ref_cache=None):
        return self.sample(
            prompts, negative_prompts, height=height, width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, run_rich_text=True,
            use_guidance=use_guidance, inject_selfattn=inject_selfattn,
            inject_background=inject_background,
            text_format_dict=text_format_dict, latents=latents, seed=seed,
            encoder_reuse=encoder_reuse, encoder_schedule=encoder_schedule,
            bf16_guidance=bf16_guidance,
            guidance_downsample=guidance_downsample,
            ref_cache=ref_cache,
        )

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
        add_in = self.unet_params["params"]["add_embedding"][
            "linear_1"]["kernel"].shape[0]
        pool_dim = add_in - 6 * self.unet_cfg.addition_time_embed_dim
        added = {
            "text_embeds": jax.ShapeDtypeStruct((1, pool_dim), dt),
            "time_ids": jax.ShapeDtypeStruct((1, 6), jnp.float32),
        }
        return jax.eval_shape(
            lambda p, x, e, a: self.unet.apply(
                p, x, jnp.int32(0), e, added_cond=a, capture=spec)[1],
            pstruct, x, e, added,
        )

    # ------------------------------------------------------------ plain fn
    def _plain_fn(self, latent_hw, num_steps, seg_res, self_layers,
                  cross_items, ref_slots=None):
        """Plain CFG scan; with ``ref_slots`` (a tuple of step indices, may
        be empty) it additionally captures the refer cache the rich pass
        needs: the latent trajectory [S+1] plus, at each listed step, the
        cond row's (Q, K) at every attn1 and its inject-resnet feature.

        The refer trajectory the reference re-denoises inside its rich loop
        (region_diffusion_sdxl.py:805-828) is mathematically THIS pass —
        same base prompt, negative prompt, initial latent, scheduler and
        CFG — so capturing here lets the rich scan drop both refer rows
        (R+4 → R+2 rows during injection steps) at the cost of one stored
        (Q, K) set per injection step."""
        key = ("plain", latent_hw, num_steps, self_layers, cross_items,
               ref_slots)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        capture = CaptureSpec(
            self_probs=frozenset(self_layers),
            cross_probs=frozenset(n for _, ns in cross_items for n in ns),
        )
        agg_start = self.agg_start_step
        constrain = self._constrain_batch
        with_ref = ref_slots is not None
        n_slots = len(ref_slots) if with_ref else 0
        capture_ref = CaptureSpec(
            qk=True, resnet=frozenset({INJECT_RESNET_NAME}))
        capture_both = dataclasses.replace(
            capture, qk=True, resnet=frozenset({INJECT_RESNET_NAME}))
        if n_slots:
            # non-ref steps write their (zero) capture to a TRASH slot
            # (index n_slots): the buffer update stays UNCONDITIONAL in the
            # scan body, which XLA aliases in place — routing the buffers
            # through lax.switch branches instead materialized whole-buffer
            # copies per step (observed 4.3 GB over HBM at 1024²)
            slot_np = np.full(num_steps, n_slots, np.int32)
            is_ref_np = np.zeros(num_steps, bool)
            for j, s in enumerate(ref_slots):
                slot_np[s] = j
                is_ref_np[s] = True

        @jax.jit
        def run(params, latents, embeds, pooled, time_ids, plan, g):
            s2 = seg_res * seg_res
            self0 = jnp.zeros((s2, s2), jnp.float32)
            cross0 = tuple(
                jnp.zeros((r * r, 77), jnp.float32) for r, _ in cross_items
            )
            st0 = sched.init_state(latents.shape)
            added = {
                "text_embeds": pooled,
                "time_ids": jnp.tile(time_ids, (2, 1)),
            }

            lat_flat = lambda l: l.reshape(
                1, l.shape[1], l.shape[2] * l.shape[3])
            if n_slots:
                # buffer layouts chosen for TPU (8,128) tiling: (Q,K) stored
                # MERGED-HEAD as [slots+1, S, C] (storing [H, S, hd=64]
                # would pad hd → 128, doubling HBM); +1 = the trash slot
                shapes = jax.eval_shape(
                    lambda p, l, e: unet.apply(
                        p, jnp.concatenate([l, l], 0), jnp.int32(0), e,
                        added_cond=added, capture=capture_ref)[1],
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
            # trajectory stored [S+1, h, w*C] (a trailing dim of C=4 would
            # tile-pad 4 → 128, a 32× expansion)
            traj0 = jnp.zeros(
                ((num_steps + 1) if with_ref else 0,
                 latents.shape[1], latents.shape[2] * latents.shape[3]),
                latents.dtype)

            def body(carry, i):
                lat, st, self_sum, cross, qk_bufs, res_bufs, traj = carry
                t = plan.timesteps[i]
                x = jnp.concatenate([lat, lat], axis=0)
                x = constrain(sched.scale_model_input(plan, i, x))
                if with_ref:
                    traj = jax.lax.dynamic_update_slice(
                        traj, lat_flat(lat), (i, 0, 0))

                # steps before agg_start would compute captures weighted by
                # zero (the reference runs its hooks and discards) — those
                # steps run a capture-free forward instead; ref-capture
                # steps additionally emit the cond row's (Q,K)+resnet
                def _mk(cap_agg, cap_ref):
                    spec = (capture_both if (cap_agg and cap_ref)
                            else capture if cap_agg
                            else capture_ref if cap_ref else None)

                    def br(_):
                        if spec is None:
                            eps, aux = unet.apply(params, x, t, embeds,
                                                  added_cond=added)
                        else:
                            eps, aux = unet.apply(params, x, t, embeds,
                                                  added_cond=added,
                                                  capture=spec)
                        d_self = sum(
                            aux["self_probs"][n][1].astype(jnp.float32)
                            for n in self_layers
                        ) if (cap_agg and self_layers) else jnp.zeros_like(
                            self0)
                        d_cross = tuple(
                            sum(aux["cross_probs"][n][1].astype(jnp.float32)
                                for n in ns)
                            for _, ns in cross_items
                        ) if cap_agg else tuple(
                            jnp.zeros_like(c) for c in cross0)
                        if cap_ref:
                            # cond row → merged-head [S, C]
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
                        return eps, d_self, d_cross, qk_now, res_now

                    return br

                is_agg = (i >= agg_start) if agg_start > 0 else (i >= 0)
                if n_slots:
                    idx = is_agg.astype(jnp.int32) + 2 * is_ref[i].astype(
                        jnp.int32)
                    eps, d_self, d_cross, qk_now, res_now = jax.lax.switch(
                        idx,
                        [_mk(False, False), _mk(True, False),
                         _mk(False, True), _mk(True, True)],
                        None,
                    )
                    # UNCONDITIONAL in-place slot write (trash slot absorbs
                    # non-ref steps) — keeps the big buffers aliasable
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
                elif agg_start > 0:
                    eps, d_self, d_cross, _, _ = jax.lax.cond(
                        is_agg, _mk(True, False), _mk(False, False), None,
                    )
                else:
                    eps, d_self, d_cross, _, _ = _mk(True, False)(None)
                # SDXL accumulates self maps over steps (no overwrite quirk)
                self_sum = self_sum + d_self
                cross = tuple(c + d for c, d in zip(cross, d_cross))
                eps = eps.astype(jnp.float32)
                e = eps[0:1] + g * (eps[1:2] - eps[0:1])
                lat, st = sched.step(plan, i, st, e, lat)
                return (lat, st, self_sum, cross, qk_bufs, res_bufs,
                        traj), None

            (lat, _, self_sum, cross, qk_bufs, res_bufs, traj), _ = (
                jax.lax.scan(
                    body,
                    (latents, st0, self0, cross0, qk0, res0, traj0),
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

    # ------------------------------------------------------------- rich fn
    def _sample_rich(self, embeds, pooled, time_ids, latent_hw, plan, spec,
                     text_format_dict, latents, pixel_hw,
                     return_latents: bool = False, ref_cache=None):
        h, w = latent_hw
        height, width = pixel_hw
        n_styles = embeds.shape[0] - 1
        assert n_styles == len(self.masks), (n_styles, len(self.masks))
        S = plan.num_steps

        inject_gates = plan.timesteps.astype(np.float64) > (
            (1 - spec.inject_selfattn) * 1000
        )
        # refer trajectory steps while inject_selfattn>0 or i < bg*len (:832)
        ref_step_gates = np.asarray(
            [spec.inject_selfattn > 0 or i < spec.inject_background * S
             for i in range(S)]
        )
        bg_step = int(spec.inject_background * S)
        # Past the refer trajectory's last USE — the final injection-gated
        # step and the background-injection step — its rows/steps are dead
        # compute the reference still performs; tighten the gate (freezing
        # lat_ref/st_ref after an unread point is output-exact) and, when
        # any step is dead, compile the rich scan with the B=4→B=2 row-drop
        # cond (ref_skip). Measured: rich 6-row pass is 68% of SDXL e2e.
        if spec.inject_selfattn > 0 or spec.inject_background > 0:
            inject_steps = np.nonzero(inject_gates)[0]
            last_inject = int(inject_steps[-1]) if len(inject_steps) else -1
            last_bg = bg_step if spec.inject_background > 0 else -1
            last_use = max(last_inject, last_bg)
            ref_step_gates = ref_step_gates & (np.arange(S) <= last_use)
        bg_gates = (np.arange(S) == bg_step) & (spec.inject_background > 0)
        guidance_gates = (
            plan.timesteps.astype(np.int64) < spec.guidance_start_step
        ) & spec.use_guidance
        alpha_raw = self.scheduler.alphas_cumprod[
            plan.timesteps.astype(np.int64)
        ].astype(np.float32)
        run_reference = spec.inject_selfattn > 0 or spec.inject_background > 0

        tw, ts = make_token_weight_vectors(
            text_format_dict.get("word_pos"), text_format_dict.get("font_size")
        )
        use_tw = tw is not None
        B = n_styles + 1
        if use_tw:
            tw_rows = jnp.ones((B, 77), jnp.float32).at[B - 1].set(tw)
            ts_rows = jnp.ones((B, 77), jnp.float32).at[B - 1].set(ts)
        else:
            tw_rows = ts_rows = None

        masks = jnp.asarray(
            np.stack([np.asarray(m).reshape(h, w) for m in self.masks])
        )[..., None]

        use_grad = bool(spec.use_guidance)
        if use_grad:
            color_masks_px = jnp.asarray(np.stack(
                [np.asarray(m).reshape(height, width)
                 for m in text_format_dict["color_obj_atten"]]))
            target_rgb = jnp.asarray(np.stack(
                [np.asarray(c).reshape(3)
                 for c in text_format_dict["target_RGB"]]))
            color_all = jnp.asarray(
                np.asarray(text_format_dict["color_obj_atten_all"]).reshape(h, w)
            )[None, :, :, None]
        else:
            color_masks_px = jnp.zeros((1, height, width))
            target_rgb = jnp.zeros((1, 3))
            color_all = jnp.zeros((1, h, w, 1))

        stride = max(int(spec.encoder_reuse), 1)
        enc_gates = encoder_key_gates(S, stride, spec.encoder_schedule)
        ref_skip = bool(
            run_reference and stride == 1 and not ref_step_gates.all()
        )

        gds = max(int(spec.guidance_downsample), 1) if use_grad else 1
        if h % gds or w % gds or height % gds or width % gds:
            gds = 1  # non-divisible shapes: fall back to the exact path

        if ref_cache is not None and run_reference:
            # precomputed refer trajectory: trusted only if the cache was
            # captured at exactly this run's injection steps/step count AND
            # under the same guidance scale, resolution, initial latent and
            # uncond/base prompt rows (content fingerprint) — otherwise
            # fall back to the reference-shaped in-batch flow below
            want = tuple(np.nonzero(inject_gates)[0].tolist())
            fp = ref_fingerprint(latents, embeds[0], embeds[-1],
                                 pooled[0], pooled[-1], time_ids)
            if ref_cache_matches(ref_cache, want, S,
                                 spec.guidance_scale, (h, w), fp):
                fn = self._rich_fn_refpre(
                    (h, w), S, n_styles, use_grad, use_tw, stride > 1,
                    use_grad and spec.bf16_guidance, gds,
                    has_qk=len(want) > 0, bg_idx=min(bg_step + 1, S),
                    use_bg=bool(spec.inject_background > 0),
                )
                slot_np = np.zeros(S, np.int32)
                for j, s in enumerate(want):
                    slot_np[s] = j
                lat = fn(
                    self.unet_params, self.vae_params, latents, embeds,
                    pooled, time_ids, masks, _plan_arrays(plan),
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
                if return_latents:
                    return lat
                return self.decode_latents(lat)

        fn = self._rich_fn((h, w), S, n_styles, run_reference, use_grad,
                           use_tw, stride > 1,
                           use_grad and spec.bf16_guidance,
                           ref_skip=ref_skip, guidance_ds=gds)
        lat = fn(
            self.unet_params, self.vae_params, latents, embeds, pooled,
            time_ids, masks, _plan_arrays(plan),
            dict(
                g=jnp.float32(spec.guidance_scale),
                inject_gates=jnp.asarray(inject_gates),
                ref_step_gates=jnp.asarray(ref_step_gates),
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
        if return_latents:  # oracle tests compare pre-decode latents
            return lat
        return self.decode_latents(lat)

    def _rich_fn(self, latent_hw, num_steps, n_styles, run_reference,
                 use_grad, use_tw, enc_reuse=False, bf16_guidance=False,
                 ref_skip=False, guidance_ds=1):
        key = ("rich", latent_hw, num_steps, n_styles, run_reference,
               use_grad, use_tw, enc_reuse, bf16_guidance, ref_skip,
               guidance_ds)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        # bf16 guidance decode: fp32-range, ~3× cheaper gradient; the
        # reference's fp16 SDXL VAE overflow concern does not apply.
        # remat_blocks: the fp32 VJP through the decoder at 1024² exceeds
        # 16 GB HBM without per-block rematerialization (vae.py)
        vae = AutoencoderKL(
            self.vae_cfg,
            dtype=jnp.bfloat16 if bf16_guidance else jnp.float32,
            remat_blocks=True,
        )
        vae_cfg = self.vae_cfg
        constrain = self._constrain_batch
        R = n_styles - 1

        capture_ref = CaptureSpec(
            qk=True, resnet=frozenset({"up_blocks.1.resnets.1"})
        ) if run_reference else CaptureSpec()

        @jax.jit
        def run(params, vae_params, latents, embeds, pooled, time_ids, masks,
                plan, ctl):
            st0 = sched.init_state(latents.shape)
            st_ref0 = sched.init_state(latents.shape)
            decode = jax.checkpoint(
                lambda vp, z: vae.apply(vp, z, method=vae.decode)
            )

            def unet_fwd(x, t, e, added, controls, capture, enc_cache):
                """embed_time → (encode | scan-carried cache) → decode.
                See RegionDiffusion._rich_fn.unet_fwd (arXiv 2312.09608)."""
                emb = unet.apply(params, t, x.shape[0], added,
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
                def f(p, lat1, ee, pool1, tid):
                    x = jnp.concatenate([lat1] * batch, axis=0)
                    added = {
                        "text_embeds": jnp.concatenate([pool1[0:1]] * batch, 0),
                        "time_ids": jnp.tile(tid, (batch, 1)),
                    }
                    emb = unet.apply(p, jnp.int32(0), batch, added,
                                     method=unet.embed_time)
                    return unet.apply(p, x, emb, ee, None, capture,
                                      method=unet.encode)

                shapes = jax.eval_shape(f, params, latents, e, pooled,
                                        time_ids)
                return jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )

            def body(carry, i):
                lat, lat_ref, st, st_ref, enc_carry = carry
                t = plan.timesteps[i]
                gate = ctl["inject_gates"][i]
                enc_gate = ctl["enc_gates"][i]
                x_in = sched.scale_model_input(plan, i, lat)

                if run_reference:
                    x_ref_in = sched.scale_model_input(plan, i, lat_ref)
                    xa = jnp.concatenate([x_in, x_in, x_ref_in, x_ref_in], 0)
                    ea = jnp.stack(
                        [embeds[0], embeds[-1], embeds[0], embeds[-1]], 0
                    )
                    pa = jnp.stack(
                        [pooled[0], pooled[-1], pooled[0], pooled[-1]], 0
                    )
                    twa = tsa = None
                    if use_tw:
                        twa = jnp.ones((4, 77), jnp.float32).at[1].set(
                            ctl["tw_rows"][-1])
                        tsa = jnp.ones((4, 77), jnp.float32).at[1].set(
                            ctl["ts_rows"][-1])

                    def _spans(inj_qk, inj_res, enc_cache):
                        xb = constrain(jnp.tile(x_in, (R, 1, 1, 1)))
                        return unet_fwd(
                            xb, t, embeds[1:1 + R],
                            {"text_embeds": pooled[1:1 + R],
                             "time_ids": jnp.tile(time_ids, (R, 1))},
                            UNetControls(
                                inject_gate=gate, inject_qk=inj_qk,
                                inject_resnet=inj_res,
                            ),
                            EMPTY_CAPTURE, enc_cache,
                        )

                    def _quad(enc_cache):
                        eps_a, aux, enc_a = unet_fwd(
                            xa, t, ea,
                            {"text_embeds": pa,
                             "time_ids": jnp.tile(time_ids, (4, 1))},
                            UNetControls(token_weights=twa, token_signs=tsa),
                            capture_ref, enc_cache,
                        )
                        inj_qk = {n: (q[3:4], k[3:4])
                                  for n, (q, k) in aux["self_qk"].items()}
                        inj_res = {n: f[3:4]
                                   for n, f in aux["resnet_hidden"].items()}
                        return eps_a.astype(jnp.float32), inj_qk, inj_res, enc_a

                    def _merged_with_ref(_):
                        # ONE [uncond, base, ref_u, ref_c, spans...] forward:
                        # the span rows take the ref-cond row's (Q, K) at
                        # every attn1 + its inject-resnet feature IN-BATCH
                        # (UNetControls.inject_src) — mathematically the
                        # reference's capture-then-inject forward pair
                        # (region_diffusion_sdxl.py:1060-1140) with no
                        # per-layer (Q,K) HBM roundtrip and one launch of
                        # R+4 rows instead of 4 + R.
                        xm = constrain(jnp.concatenate(
                            [x_in, x_in, x_ref_in, x_ref_in]
                            + [x_in] * R, axis=0))
                        em = jnp.concatenate(
                            [embeds[0:1], embeds[-1:], embeds[0:1],
                             embeds[-1:], embeds[1:1 + R]], 0)
                        pm = jnp.concatenate(
                            [pooled[0:1], pooled[-1:], pooled[0:1],
                             pooled[-1:], pooled[1:1 + R]], 0)
                        twm = tsm = None
                        if use_tw:
                            twm = jnp.ones((R + 4, 77), jnp.float32).at[1].set(
                                ctl["tw_rows"][-1])
                            tsm = jnp.ones((R + 4, 77), jnp.float32).at[1].set(
                                ctl["ts_rows"][-1])
                        epsm, _, _ = unet_fwd(
                            xm, t, em,
                            {"text_embeds": pm,
                             "time_ids": jnp.tile(time_ids, (R + 4, 1))},
                            UNetControls(
                                token_weights=twm, token_signs=tsm,
                                inject_gate=gate,
                                inject_src=3, inject_dst=(4, 4 + R),
                            ),
                            EMPTY_CAPTURE, None,
                        )
                        epsm = epsm.astype(jnp.float32)
                        return (epsm[0:1], epsm[1:2], epsm[4:],
                                epsm[2:3]
                                + ctl["g"] * (epsm[3:4] - epsm[2:3]))

                    if ref_skip or not enc_reuse:
                        # Steps past the last refer-trajectory USE (final
                        # injection-gate step / background-injection step)
                        # compute garbage the reference then discards — the
                        # cond drops the two refer rows there and merges the
                        # remaining current-trajectory rows into ONE
                        # [uncond, base, spans...] forward, output-exact vs
                        # the reference loop. Requires enc_reuse off (the
                        # encoder cache shapes differ between branches).
                        def _no_ref(_):
                            xm = constrain(
                                jnp.concatenate([x_in] * (R + 2), axis=0))
                            em = jnp.concatenate(
                                [embeds[0:1], embeds[-1:],
                                 embeds[1:1 + R]], 0)
                            pm = jnp.concatenate(
                                [pooled[0:1], pooled[-1:],
                                 pooled[1:1 + R]], 0)
                            twm = tsm = None
                            if use_tw:
                                twm = jnp.ones(
                                    (R + 2, 77), jnp.float32
                                ).at[1].set(ctl["tw_rows"][-1])
                                tsm = jnp.ones(
                                    (R + 2, 77), jnp.float32
                                ).at[1].set(ctl["ts_rows"][-1])
                            epsm, _, _ = unet_fwd(
                                xm, t, em,
                                {"text_embeds": pm,
                                 "time_ids": jnp.tile(time_ids, (R + 2, 1))},
                                UNetControls(token_weights=twm,
                                             token_signs=tsm),
                                EMPTY_CAPTURE, None,
                            )
                            epsm = epsm.astype(jnp.float32)
                            return (epsm[0:1], epsm[1:2], epsm[2:],
                                    jnp.zeros_like(epsm[0:1]))

                        if ref_skip:
                            eps_uncond, eps_base, eps_spans, eps_ref = (
                                jax.lax.cond(ctl["ref_step_gates"][i],
                                             _merged_with_ref, _no_ref, None)
                            )
                        else:
                            eps_uncond, eps_base, eps_spans, eps_ref = (
                                _merged_with_ref(None)
                            )
                        enc_new = ()
                    else:
                        # encoder-reuse keeps the two-launch flow (the enc
                        # caches are per-launch pytrees)
                        eps_a, inj_qk, inj_res, enc_a = _quad(
                            (enc_gate, enc_carry[0]))
                        eps_b, _, enc_b = _spans(
                            inj_qk, inj_res, (enc_gate, enc_carry[1]))
                        eps_b = eps_b.astype(jnp.float32)
                        enc_new = (enc_a, enc_b)
                        eps_uncond, eps_base = eps_a[0:1], eps_a[1:2]
                        eps_spans = eps_b
                        eps_ref = (eps_a[2:3]
                                   + ctl["g"] * (eps_a[3:4] - eps_a[2:3]))
                else:
                    x = constrain(jnp.concatenate([x_in] * (R + 2), axis=0))
                    controls = UNetControls(
                        token_weights=ctl["tw_rows"],
                        token_signs=ctl["ts_rows"],
                    ) if use_tw else None
                    eps_all, _, enc_x = unet_fwd(
                        x, t, embeds,
                        {"text_embeds": pooled,
                         "time_ids": jnp.tile(time_ids, (R + 2, 1))},
                        controls, EMPTY_CAPTURE,
                        (enc_gate, enc_carry[0]) if enc_reuse else None,
                    )
                    enc_new = (enc_x,) if enc_reuse else ()
                    eps_all = eps_all.astype(jnp.float32)
                    eps_uncond = eps_all[0:1]
                    eps_spans = eps_all[1:1 + R]
                    eps_base = eps_all[R + 1:R + 2]

                mask_sum = masks.sum(0)
                noise_uncond = eps_uncond * mask_sum[None]
                noise_text = eps_base * masks[-1][None]
                if R > 0:
                    noise_text = noise_text + (eps_spans * masks[:-1]).sum(
                        0, keepdims=True
                    )
                noise = noise_uncond + ctl["g"] * (noise_text - noise_uncond)

                lat_new, st_new = sched.step(plan, i, st, noise, lat)
                if run_reference:
                    ref_stepped, st_ref_stepped = sched.step(
                        plan, i, st_ref, eps_ref, lat_ref
                    )
                    # the refer trajectory holds after its window (:832).
                    # Freeze the scheduler state together with the latent:
                    # for stateful multistep solvers (dpm/pndm) an advancing
                    # eps history over a held latent would desync the solver
                    # (stateless Euler — the reference's SDXL scheduler — is
                    # unaffected either way)
                    gate = ctl["ref_step_gates"][i]
                    lat_ref_new = jnp.where(gate, ref_stepped, lat_ref)
                    st_ref_new = jax.tree.map(
                        lambda new, old: jnp.where(gate, new, old),
                        st_ref_stepped, st_ref,
                    )
                else:
                    st_ref_new = st_ref
                    lat_ref_new = lat_ref
                lat = lat_new

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

                    lat = jax.lax.cond(
                        ctl["guidance_gates"][i],
                        lambda l: l - jax.grad(color_loss)(l)
                        * ctl["color_w"] * ctl["color_all"],
                        lambda l: l,
                        lat,
                    )

                if run_reference:
                    lat = jnp.where(
                        ctl["bg_gates"][i],
                        lat_ref_new * masks[-1][None]
                        + lat * (1 - masks[-1][None]),
                        lat,
                    )
                return (lat, lat_ref_new, st_new, st_ref_new, enc_new), None

            lat_ref0 = latents if run_reference else jnp.zeros_like(latents)
            if not enc_reuse:
                enc0 = ()
            elif run_reference:
                ea0 = jnp.stack([embeds[0], embeds[-1], embeds[0], embeds[-1]])
                enc0 = (_zero_enc(4, ea0, capture_ref),
                        _zero_enc(R, embeds[1:1 + R], EMPTY_CAPTURE))
            else:
                enc0 = (_zero_enc(R + 2, embeds, EMPTY_CAPTURE),)
            (lat, _, _, _, _), _ = jax.lax.scan(
                body, (latents, lat_ref0, st0, st_ref0, enc0),
                jnp.arange(num_steps)
            )
            return lat

        self._jit_cache[key] = run
        return run

    def _rich_fn_refpre(self, latent_hw, num_steps, n_styles, use_grad,
                        use_tw, enc_reuse, bf16_guidance, guidance_ds,
                        has_qk, bg_idx, use_bg):
        """Rich scan against a PRECOMPUTED refer trajectory (see _plain_fn).

        The reference re-denoises the base prompt inside its rich loop to
        source the injected (Q, K)/resnet features and the background-
        injection latent (region_diffusion_sdxl.py:805-832). Those are
        exactly the plain pass's values, so with the plain pass's cache this
        scan runs ONE [uncond, base, spans...] launch of R+2 rows at every
        step — no refer rows at any step (vs R+4 during refer steps in
        _rich_fn) and no refer scheduler state. Injection reads the stored
        per-step (Q, K) via ``ctl['slot_of_step']``; background injection
        reads ``cache['traj'][bg_idx]``. Unlike the in-batch flow, this
        path composes with encoder reuse (fixed launch shape every step).
        """
        key = ("richpre", latent_hw, num_steps, n_styles, use_grad, use_tw,
               enc_reuse, bf16_guidance, guidance_ds, has_qk, bg_idx, use_bg)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sched = self.scheduler
        unet = self.unet
        vae = AutoencoderKL(
            self.vae_cfg,
            dtype=jnp.bfloat16 if bf16_guidance else jnp.float32,
            remat_blocks=True,
        )
        vae_cfg = self.vae_cfg
        constrain = self._constrain_batch
        R = n_styles - 1

        @jax.jit
        def run(params, vae_params, latents, embeds, pooled, time_ids, masks,
                plan, ctl, cache):
            st0 = sched.init_state(latents.shape)
            decode = jax.checkpoint(
                lambda vp, z: vae.apply(vp, z, method=vae.decode)
            )

            def unet_fwd(x, t, e, added, controls, capture, enc_cache):
                emb = unet.apply(params, t, x.shape[0], added,
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

            em = jnp.concatenate(
                [embeds[0:1], embeds[-1:], embeds[1:1 + R]], 0)
            pm = jnp.concatenate(
                [pooled[0:1], pooled[-1:], pooled[1:1 + R]], 0)
            added = {
                "text_embeds": pm,
                "time_ids": jnp.tile(time_ids, (R + 2, 1)),
            }
            twm = tsm = None
            if use_tw:
                twm = jnp.ones((R + 2, 77), jnp.float32).at[1].set(
                    ctl["tw_rows"][-1])
                tsm = jnp.ones((R + 2, 77), jnp.float32).at[1].set(
                    ctl["ts_rows"][-1])

            def _zero_enc():
                def f(p, lat1, ee):
                    x = jnp.concatenate([lat1] * (R + 2), axis=0)
                    emb = unet.apply(p, jnp.int32(0), R + 2, added,
                                     method=unet.embed_time)
                    return unet.apply(p, x, emb, ee, None, EMPTY_CAPTURE,
                                      method=unet.encode)

                shapes = jax.eval_shape(f, params, latents, em)
                return jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes
                )

            def body(carry, i):
                lat, st, enc_carry = carry
                t = plan.timesteps[i]
                gate = ctl["inject_gates"][i]
                x_in = sched.scale_model_input(plan, i, lat)
                xm = constrain(jnp.concatenate([x_in] * (R + 2), axis=0))

                if has_qk:
                    slot = ctl["slot_of_step"][i]
                    inj_qk = {
                        n: tuple(
                            jax.lax.dynamic_index_in_dim(b, slot, 0,
                                                         keepdims=True)
                            for b in bufs)
                        for n, bufs in cache["qk"].items()
                    }
                    inj_res = {
                        n: jax.lax.dynamic_index_in_dim(b, slot, 0,
                                                        keepdims=True)
                        for n, b in cache["resnet"].items()
                    }
                    controls = UNetControls(
                        token_weights=twm, token_signs=tsm,
                        inject_gate=gate, inject_qk=inj_qk,
                        inject_resnet=inj_res, inject_dst=(2, 2 + R),
                    )
                else:
                    controls = UNetControls(token_weights=twm,
                                            token_signs=tsm)

                epsm, _, enc_x = unet_fwd(
                    xm, t, em, added, controls, EMPTY_CAPTURE,
                    (ctl["enc_gates"][i], enc_carry[0]) if enc_reuse
                    else None,
                )
                enc_new = (enc_x,) if enc_reuse else ()
                epsm = epsm.astype(jnp.float32)
                eps_uncond = epsm[0:1]
                eps_base = epsm[1:2]
                eps_spans = epsm[2:]

                mask_sum = masks.sum(0)
                noise_uncond = eps_uncond * mask_sum[None]
                noise_text = eps_base * masks[-1][None]
                if R > 0:
                    noise_text = noise_text + (eps_spans * masks[:-1]).sum(
                        0, keepdims=True
                    )
                noise = noise_uncond + ctl["g"] * (noise_text - noise_uncond)
                lat, st = sched.step(plan, i, st, noise, lat)

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

                    lat = jax.lax.cond(
                        ctl["guidance_gates"][i],
                        lambda l: l - jax.grad(color_loss)(l)
                        * ctl["color_w"] * ctl["color_all"],
                        lambda l: l,
                        lat,
                    )

                if use_bg:
                    # the post-step refer latent at the background step is
                    # trajectory entry bg_idx (= bg_step + 1); stored
                    # [h, w*C] (tiling-friendly), reshape back
                    lat_bg = cache["traj"][bg_idx].reshape(lat.shape)
                    lat = jnp.where(
                        ctl["bg_gates"][i],
                        lat_bg * masks[-1][None]
                        + lat * (1 - masks[-1][None]),
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
