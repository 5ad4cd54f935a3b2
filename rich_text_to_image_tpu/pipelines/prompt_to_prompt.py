"""Prompt-to-prompt baseline (AttentionRefine), functional.

The reference benchmarks compare against Google's prompt-to-prompt via a
vendored monkey-patching implementation (utils/ptp_utils.py:285-400,
:465-674). Here the same AttentionRefine semantics run through the UNet's
functional controls — no patching:

per step, forward A runs [uncond_b, uncond_e, cond_b] capturing the base
row's self-attention (Q,K) and full cross-attention probs; forward B runs
[cond_e] with
  * self-attention (Q,K) injected while ``i < self_replace_steps · S``
    (AttentionRefine.forward self branch),
  * cross-attention probs blended per token: mapper-gathered base probs ×
    alphas within ``i < cross_replace_steps · S`` (replace_cross_attention).

Defaults mirror the benchmarks: cross_replace_steps=0.8,
self_replace_steps=0.4 (evaluation/benchmark_color.py:266-270).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import CaptureSpec, UNetControls
from ..utils.seq_aligner import get_refinement_mapper
from .region_sd import RegionDiffusion, _plan_arrays


class PromptToPromptPipeline:
    """Wraps a RegionDiffusion model's UNet/VAE/text/scheduler."""

    def __init__(self, model: RegionDiffusion):
        self.model = model
        self._jit_cache: dict = {}

    def generate(
        self,
        base_prompt: str,
        edited_prompt: str,
        cross_replace_steps: float = 0.8,
        self_replace_steps: float = 0.4,
        num_inference_steps: int = 41,
        guidance_scale: float = 8.5,
        height: int = 512,
        width: int = 512,
        latents: Optional[jnp.ndarray] = None,
        seed: int = 0,
        equalizer: Optional[np.ndarray] = None,
        blend_words: Optional[tuple] = None,
        blend_threshold: float = 0.3,
        controller: str = "refine",  # "refine" | "replace"
    ) -> np.ndarray:
        """Returns images [2, H, W, 3] (base, edited).

        ``equalizer``: optional (77,) post-softmax cross-attention scales for
        the edited prompt — AttentionReweight (ptp_utils.py:677-686)
        semantics: probs are scaled WITHOUT renormalization, which maps
        exactly onto the UNet's ``token_signs`` control with unit
        ``token_weights``.

        ``blend_words``: optional (words_base, words_edit) — LocalBlend
        (ptp_utils.py:465-493): after each scheduler step, the edited latent
        is blended toward the base latent outside the union mask built from
        the 16²-res cross-attention maps of the given words (max-pooled,
        max-normalized, thresholded).
        """
        m = self.model
        f = m.vae_scale_factor
        h, w = height // f, width // f
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (1, h, w, m.unet_cfg.in_channels)
            )
        embeds = m.get_text_embeds([base_prompt, edited_prompt], [""])
        # [uncond, base, edited]

        if controller == "replace":
            from ..utils.seq_aligner import get_replacement_mapper

            mapper = get_replacement_mapper(
                base_prompt, edited_prompt, m.tokenizer
            )
            alphas = np.ones(77, dtype=np.float32)
        else:
            base_ids = m.tokenizer(base_prompt)[0]
            edit_ids = m.tokenizer(edited_prompt)[0]
            mapper, alphas = get_refinement_mapper(base_ids, edit_ids)

        plan = m.scheduler.plan(num_inference_steps)
        S = plan.num_steps
        cross_mix = np.asarray(
            [alphas * (i < cross_replace_steps * S) for i in range(S)],
            dtype=np.float32,
        )
        self_gates = np.asarray(
            [i < self_replace_steps * S for i in range(S)]
        )

        if equalizer is None:
            eq = np.ones(77, dtype=np.float32)
        else:
            eq = np.asarray(equalizer, dtype=np.float32).reshape(77)

        if blend_words is not None:
            from ..utils.seq_aligner import get_word_inds

            alpha_b = np.zeros(77, np.float32)
            alpha_e = np.zeros(77, np.float32)
            wb, we = blend_words
            for word in ([wb] if isinstance(wb, str) else wb):
                alpha_b[get_word_inds(base_prompt, word, m.tokenizer)] = 1.0
            for word in ([we] if isinstance(we, str) else we):
                alpha_e[get_word_inds(edited_prompt, word, m.tokenizer)] = 1.0
        else:
            alpha_b = alpha_e = np.zeros(77, np.float32)

        fn = self._fn((h, w), S, blend_words is not None)
        lat = fn(
            m.unet_params, latents, embeds, _plan_arrays(plan),
            jnp.float32(guidance_scale),
            jnp.asarray(cross_mix), jnp.asarray(mapper),
            jnp.asarray(self_gates), jnp.asarray(eq),
            jnp.asarray(alpha_b), jnp.asarray(alpha_e),
            jnp.float32(blend_threshold),
        )
        return m.decode_latents(lat)

    def _fn(self, latent_hw, num_steps, local_blend: bool = False):
        key = (latent_hw, num_steps, local_blend)
        if key in self._jit_cache:
            return self._jit_cache[key]
        m = self.model
        sched = m.scheduler
        unet = m.unet
        capture = CaptureSpec(qk=True, cross_full=True)

        from ..utils.registries import attn_layer_resolutions

        res_map = attn_layer_resolutions(m.unet_cfg, latent_hw)
        blend_res = max(r for r in set(res_map.values())
                        if r <= 16) if res_map else 16
        blend_layers = tuple(
            sorted(n for n, r in res_map.items()
                   if n.endswith(".attn2") and r == blend_res)
        )

        def _blend_mask(probs_list, alpha, hw):
            """LocalBlend mask from 16²-res cross maps (ptp_utils.py:467-480)."""
            # probs_list entries [1,H,S,77] → mean over layers & heads
            maps = jnp.mean(
                jnp.stack([jnp.mean(p, axis=1) for p in probs_list]), axis=0
            )[0]  # [S,77]
            sel = (maps * alpha[None, :]).sum(-1)
            r = blend_res
            sel = sel.reshape(1, r, r, 1)
            pooled = jax.lax.reduce_window(
                sel, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                "SAME",
            )
            mask = jax.image.resize(pooled, (1, *hw, 1), method="nearest")
            return mask / (jnp.max(mask) + 1e-12)

        @jax.jit
        def run(params, latents, embeds, plan, g, cross_mix, mapper,
                self_gates, equalizer, alpha_b, alpha_e, blend_thresh):
            st0 = sched.init_state((2, *latents.shape[1:]))
            hw = latents.shape[1:3]

            def body(carry, i):
                lat, st = carry  # [2,h,w,4]: base, edited
                t = plan.timesteps[i]
                lat_b, lat_e = lat[0:1], lat[1:2]

                xa = jnp.concatenate([lat_b, lat_e, lat_b], axis=0)
                ea = jnp.stack([embeds[0], embeds[0], embeds[1]], axis=0)
                eps_a, aux = unet.apply(params, xa, t, ea, capture=capture)
                eps_a = eps_a.astype(jnp.float32)

                controls = UNetControls(
                    inject_gate=self_gates[i],
                    # AttentionReweight: post-softmax scale, no renorm
                    token_weights=jnp.ones(77, jnp.float32),
                    token_signs=equalizer,
                    # self replacement only at ≤16² token maps
                    # (ptp_utils replace_self_attention's shape gate)
                    inject_qk={n: (q[2:3], k[2:3])
                               for n, (q, k) in aux["self_qk"].items()
                               if q.shape[2] <= 256},
                    inject_cross={n: p[2:3]
                                  for n, p in aux["cross_probs_full"].items()},
                    cross_mapper=mapper,
                    cross_mix=cross_mix[i],
                )
                eps_e, aux_e = unet.apply(
                    params, lat_e, t, embeds[2:3], controls=controls,
                    capture=CaptureSpec(cross_full=True) if local_blend
                    else CaptureSpec(),
                )
                eps_e = eps_e.astype(jnp.float32)

                eps_base = eps_a[0:1] + g * (eps_a[2:3] - eps_a[0:1])
                eps_edit = eps_a[1:2] + g * (eps_e - eps_a[1:2])
                eps = jnp.concatenate([eps_base, eps_edit], axis=0)
                lat, st = sched.step(plan, i, st, eps, lat)

                if local_blend:
                    # LocalBlend step callback: keep the edit inside the
                    # word-attention mask, base content elsewhere
                    mb = _blend_mask(
                        [aux["cross_probs_full"][n][2:3]
                         for n in blend_layers], alpha_b, hw)
                    me = _blend_mask(
                        [aux_e["cross_probs_full"][n] for n in blend_layers],
                        alpha_e, hw)
                    mask = (
                        (mb > blend_thresh) | (me > blend_thresh)
                    ).astype(lat.dtype)
                    lat_b2, lat_e2 = lat[0:1], lat[1:2]
                    lat_e2 = lat_b2 + mask * (lat_e2 - lat_b2)
                    lat = jnp.concatenate([lat_b2, lat_e2], axis=0)
                return (lat, st), None

            lat0 = jnp.concatenate([latents, latents], axis=0)
            (lat, _), _ = jax.lax.scan(
                body, (lat0, st0), jnp.arange(num_steps)
            )
            return lat

        self._jit_cache[key] = run
        return run
