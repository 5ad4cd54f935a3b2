"""EulerDiscrete scheduler, matching diffusers 0.18.2 (SDXL's default).

Reference pipeline: models/region_diffusion_sdxl.py:120 loads
``EulerDiscreteScheduler`` with the SDXL config (scaled_linear betas
0.00085→0.012, 1000 steps, epsilon prediction, linear sigma interpolation).
With default s_churn=0 the update is fully deterministic, so the stepper is a
pure function — no state carry at all.
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
    data_fields=("timesteps", "sigmas"),
    meta_fields=("init_noise_sigma", "num_steps"),
)
@dataclasses.dataclass(frozen=True)
class EulerPlan:
    timesteps: np.ndarray  # (S,) float32 — t fed to the UNet
    sigmas: np.ndarray  # (S+1,) float32 — trailing 0.0
    init_noise_sigma: float
    num_steps: int


class EulerDiscreteScheduler:
    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
    ):
        self.num_train_timesteps = num_train_timesteps
        self.alphas_cumprod = make_alphas_cumprod(
            num_train_timesteps, beta_start, beta_end, beta_schedule
        )

    def plan(self, num_inference_steps: int) -> EulerPlan:
        # diffusers 0.18.2 set_timesteps: linspace over train steps, reversed.
        timesteps = np.linspace(
            0, self.num_train_timesteps - 1, num_inference_steps, dtype=np.float64
        )[::-1].copy()
        sigmas_full = ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        sigmas = np.interp(timesteps, np.arange(0, self.num_train_timesteps), sigmas_full)
        sigmas = np.concatenate([sigmas, [0.0]])
        return EulerPlan(
            timesteps=timesteps.astype(np.float32),
            sigmas=sigmas.astype(np.float32),
            init_noise_sigma=float((sigmas.max() ** 2 + 1) ** 0.5),
            num_steps=num_inference_steps,
        )

    def init_state(self, latent_shape, dtype=jnp.float32):
        return ()

    def scale_model_input(self, plan: EulerPlan, i, sample):
        sigma = jnp.asarray(plan.sigmas)[i]
        return sample / jnp.sqrt(sigma**2 + 1.0)

    def step(self, plan: EulerPlan, i, state, model_output, sample):
        """Deterministic Euler step (s_churn=0 ⇒ gamma=0, sigma_hat=sigma)."""
        sigmas = jnp.asarray(plan.sigmas)
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        model_output = model_output.astype(sample.dtype)
        # epsilon prediction: denoised = x - sigma * eps
        denoised = sample - sigma * model_output
        derivative = (sample - denoised) / sigma
        prev = sample + derivative * (sigma_next - sigma)
        return prev, state
