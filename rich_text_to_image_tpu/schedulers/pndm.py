"""PNDM scheduler (PLMS path, skip_prk_steps=True) as a scan-friendly stepper.

Matches diffusers 0.18.2 ``PNDMScheduler`` with the reference pipeline's
config (models/region_diffusion.py:35-36): scaled_linear betas 0.00085→0.012,
1000 train steps, ``skip_prk_steps=True``, ``steps_offset=1``,
``set_alpha_to_one=False``.

Torch-hostile aspects of the original — a Python list ``ets`` of unbounded
history, a mutable ``counter``, branch-on-counter — become:

  * a fixed (4, *latent) ring buffer carried through ``lax.scan``;
  * a host-precomputed per-step branch id ``min(i, 4)`` driving
    ``lax.switch``-free weighted sums (branch weights are baked into the
    plan as a (S, 4) coefficient table, so the device step is one
    tensordot over the ring buffer — no control flow at all);
  * host-precomputed ``alpha_prod_t`` / ``alpha_prod_t_prev`` scalars per
    step (the counter==1 timestep-substitution quirk is resolved at plan
    time).

Note the 42-step quirk: for ``num_inference_steps=N`` the PLMS timestep list
has N+1 entries (the second entry is duplicated), exactly like the original's
``plms_timesteps`` concatenation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import make_alphas_cumprod


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "timesteps",
        "alpha_prod_t",
        "alpha_prod_t_prev",
        "ets_coeffs",
        "mo_coeff",
        "append_ets",
        "use_cur_sample",
        "store_cur_sample",
    ),
    meta_fields=("num_steps",),
)
@dataclasses.dataclass(frozen=True)
class PNDMPlan:
    """Host-side per-step constants; arrays are indexed by scan step i.

    Registered as a pytree (num_steps static) so a plan passes straight
    through jit/scan boundaries.
    """

    timesteps: np.ndarray  # (S,) int32 — the t fed to the UNet
    alpha_prod_t: np.ndarray  # (S,) float32 — for _get_prev_sample (t_eff)
    alpha_prod_t_prev: np.ndarray  # (S,) float32
    ets_coeffs: np.ndarray  # (S, 4) float32 — weights over ets ring buffer
    mo_coeff: np.ndarray  # (S,) float32 — weight on the *current* model output
    append_ets: np.ndarray  # (S,) bool — whether this step pushes into ets
    use_cur_sample: np.ndarray  # (S,) bool — step 1 re-uses the stored sample
    store_cur_sample: np.ndarray  # (S,) bool — step 0 stores the sample
    num_steps: int


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PNDMState:
    """Scan carry. ``ets[k]`` is older for smaller k; ets[-1] is newest."""

    ets: jnp.ndarray  # (4, *latent_shape)
    cur_sample: jnp.ndarray  # (*latent_shape,)


class PNDMScheduler:
    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        skip_prk_steps: bool = True,
        steps_offset: int = 1,
        set_alpha_to_one: bool = False,
    ):
        if not skip_prk_steps:
            raise NotImplementedError(
                "only the PLMS path (skip_prk_steps=True) is implemented; the "
                "reference never uses the PRK warmup"
            )
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        self.alphas_cumprod = make_alphas_cumprod(
            num_train_timesteps, beta_start, beta_end, beta_schedule
        )
        self.final_alpha_cumprod = (
            1.0 if set_alpha_to_one else float(self.alphas_cumprod[0])
        )

    # ------------------------------------------------------------------ plan
    def plan(self, num_inference_steps: int) -> PNDMPlan:
        step_ratio = self.num_train_timesteps // num_inference_steps
        base = (np.arange(0, num_inference_steps) * step_ratio).round().astype(
            np.int64
        ) + self.steps_offset
        # plms_timesteps: drop the final t, duplicate the second-to-last,
        # re-append the last, then reverse (diffusers PNDM set_timesteps).
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        S = len(plms)  # == num_inference_steps + 1

        alpha_t = np.empty(S, dtype=np.float64)
        alpha_prev = np.empty(S, dtype=np.float64)
        ets_coeffs = np.zeros((S, 4), dtype=np.float64)
        mo_coeff = np.zeros(S, dtype=np.float64)
        append_ets = np.ones(S, dtype=bool)
        use_cur = np.zeros(S, dtype=bool)
        store_cur = np.zeros(S, dtype=bool)

        for i, t in enumerate(plms):
            t_eff = int(t)
            t_prev = t_eff - step_ratio
            if i == 1:
                # counter==1: redo the first interval with the averaged slope.
                t_prev = t_eff
                t_eff = t_eff + step_ratio
                append_ets[i] = False
                use_cur[i] = True
                # model_output = (mo + ets[-1]) / 2
                mo_coeff[i] = 0.5
                ets_coeffs[i, 3] = 0.5
            elif i == 0:
                store_cur[i] = True
                mo_coeff[i] = 1.0  # ets holds mo already, but using mo directly
                # (equivalent: ets[-1] == mo after append; use mo_coeff for clarity)
            elif i == 2:
                # (3 e[-1] - e[-2]) / 2 ; e[-1] is current mo (appended first)
                ets_coeffs[i, 3] = 3.0 / 2.0
                ets_coeffs[i, 2] = -1.0 / 2.0
            elif i == 3:
                ets_coeffs[i, 3] = 23.0 / 12.0
                ets_coeffs[i, 2] = -16.0 / 12.0
                ets_coeffs[i, 1] = 5.0 / 12.0
            else:
                ets_coeffs[i, 3] = 55.0 / 24.0
                ets_coeffs[i, 2] = -59.0 / 24.0
                ets_coeffs[i, 1] = 37.0 / 24.0
                ets_coeffs[i, 0] = -9.0 / 24.0
            alpha_t[i] = self.alphas_cumprod[t_eff]
            alpha_prev[i] = (
                self.alphas_cumprod[t_prev] if t_prev >= 0 else self.final_alpha_cumprod
            )

        return PNDMPlan(
            timesteps=plms.astype(np.int32),
            alpha_prod_t=alpha_t.astype(np.float32),
            alpha_prod_t_prev=alpha_prev.astype(np.float32),
            ets_coeffs=ets_coeffs.astype(np.float32),
            mo_coeff=mo_coeff.astype(np.float32),
            append_ets=append_ets,
            use_cur_sample=use_cur,
            store_cur_sample=store_cur,
            num_steps=S,
        )

    # ----------------------------------------------------------------- state
    def init_state(self, latent_shape, dtype=jnp.float32) -> PNDMState:
        return PNDMState(
            ets=jnp.zeros((4, *latent_shape), dtype=dtype),
            cur_sample=jnp.zeros(latent_shape, dtype=dtype),
        )

    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, plan, i, sample):  # parity with Euler's API
        del plan, i
        return sample

    # ------------------------------------------------------------------ step
    def step(self, plan: PNDMPlan, i, state: PNDMState, model_output, sample):
        """One PLMS update. ``i`` may be a traced scan index.

        Per-step scalars are gathered from plan arrays (device-resident after
        first trace); all branching is by jnp.where on gathered booleans.
        """
        ets_coeffs = jnp.asarray(plan.ets_coeffs)[i]  # (4,)
        mo_c = jnp.asarray(plan.mo_coeff)[i]
        append = jnp.asarray(plan.append_ets)[i]
        use_cur = jnp.asarray(plan.use_cur_sample)[i]
        store_cur = jnp.asarray(plan.store_cur_sample)[i]
        alpha_t = jnp.asarray(plan.alpha_prod_t)[i]
        alpha_prev = jnp.asarray(plan.alpha_prod_t_prev)[i]

        model_output = model_output.astype(state.ets.dtype)
        sample = sample.astype(state.ets.dtype)

        # Ring-buffer append (skipped at i==1).
        pushed = jnp.concatenate([state.ets[1:], model_output[None]], axis=0)
        ets = jnp.where(append, pushed, state.ets)

        # Linear multistep combination: one tensordot over the ring buffer.
        combined = mo_c * model_output + jnp.tensordot(
            ets_coeffs, ets, axes=(0, 0)
        )

        # i==0 stores the sample; i==1 reuses it.
        cur_sample = jnp.where(store_cur, sample, state.cur_sample)
        eff_sample = jnp.where(use_cur, cur_sample, sample)

        prev = _get_prev_sample(eff_sample, combined, alpha_t, alpha_prev)
        return prev, PNDMState(ets=ets, cur_sample=cur_sample)


def _get_prev_sample(sample, model_output, alpha_prod_t, alpha_prod_t_prev):
    """diffusers PNDMScheduler._get_prev_sample, epsilon prediction."""
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    sample_coeff = (alpha_prod_t_prev / alpha_prod_t) ** 0.5
    denom = alpha_prod_t * beta_prod_t_prev**0.5 + (
        alpha_prod_t * beta_prod_t * alpha_prod_t_prev
    ) ** 0.5
    return (
        sample_coeff * sample
        - (alpha_prod_t_prev - alpha_prod_t) * model_output / denom
    )
