"""DPM-Solver++ (2M) scheduler — scan-friendly stepper.

The reference imports diffusers' DPMSolverMultistepScheduler alongside PNDM
(models/region_diffusion.py:7) though its pipelines default to PNDM/Euler;
the framework ships it as the fast-sampling option (≈20 steps at 50-step
quality). Numerics follow diffusers' DPMSolverMultistepScheduler defaults
(algorithm_type="dpmsolver++", solver_order=2, epsilon prediction,
lower-order final steps).

State carry: the previous step's converted x0 prediction (2M needs one
history slot) + a validity flag resolved at plan time.
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
    data_fields=("timesteps", "alpha_t", "sigma_t", "lambda_t", "coeffs"),
    meta_fields=("num_steps",),
)
@dataclasses.dataclass(frozen=True)
class DPMPlan:
    timesteps: np.ndarray  # (S,) int32 — t fed to the UNet
    alpha_t: np.ndarray  # (S+1,) sqrt(alphas_cumprod) at step boundaries
    sigma_t: np.ndarray  # (S+1,) sqrt(1 - alphas_cumprod)
    lambda_t: np.ndarray  # (S+1,) log(alpha/sigma)
    coeffs: np.ndarray  # (S, 3): [c_sample, c_D0, c_D1] per step
    num_steps: int


class DPMSolverMultistepScheduler:
    """algorithm dpmsolver++, order 2 (2M), epsilon prediction."""

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

    def plan(self, num_inference_steps: int) -> DPMPlan:
        N = self.num_train_timesteps
        # diffusers default timestep spacing ("linspace", leading-free):
        # linspace over [0, N-1], rounded, reversed
        timesteps = (
            np.linspace(0, N - 1, num_inference_steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
        S = len(timesteps)
        # boundary sigmas: at each timestep plus the terminal (t=0) boundary
        ac = self.alphas_cumprod
        bounds = list(timesteps) + [0]
        alpha_t = np.sqrt(ac[np.asarray(bounds)])
        sigma_t = np.sqrt(1.0 - ac[np.asarray(bounds)])
        lambda_t = np.log(alpha_t) - np.log(sigma_t)

        coeffs = np.zeros((S, 3), dtype=np.float64)
        for i in range(S):
            h = lambda_t[i + 1] - lambda_t[i]
            c_sample = sigma_t[i + 1] / sigma_t[i]
            c_x0 = alpha_t[i + 1] * (1.0 - np.exp(-h))
            if i == 0 or i == S - 1:
                # first step and lower-order-final: DPM-Solver++(1) update
                # x_next = c_sample·x + α_next(1-e^{-h})·x0
                coeffs[i] = [c_sample, c_x0, 0.0]
            else:
                h_prev = lambda_t[i] - lambda_t[i - 1]
                r = h_prev / h
                # 2M: x_next = c_sample·x + A·(D0 + ½D1) with A=α(1-e^{-h}),
                # D0 = x0_i, D1 = (x0_i - x0_{i-1})/r — expanded onto
                # (x0_i, x0_{i-1}):
                coeffs[i] = [c_sample, c_x0 * (1.0 + 0.5 / r),
                             -c_x0 * 0.5 / r]
        return DPMPlan(
            timesteps=timesteps.astype(np.int32),
            alpha_t=alpha_t.astype(np.float32),
            sigma_t=sigma_t.astype(np.float32),
            lambda_t=lambda_t.astype(np.float32),
            coeffs=coeffs.astype(np.float32),
            num_steps=S,
        )

    def init_state(self, latent_shape, dtype=jnp.float32):
        return jnp.zeros(latent_shape, dtype=dtype)  # previous x0 prediction

    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, plan, i, sample):
        del plan, i
        return sample

    def step(self, plan: DPMPlan, i, state, model_output, sample):
        """One 2M update; ``state`` carries the previous x0 prediction."""
        alpha_i = jnp.asarray(plan.alpha_t)[i]
        sigma_i = jnp.asarray(plan.sigma_t)[i]
        c = jnp.asarray(plan.coeffs)[i]
        model_output = model_output.astype(sample.dtype)
        x0 = (sample - sigma_i * model_output) / alpha_i
        prev = c[0] * sample + c[1] * x0 + c[2] * state
        return prev, x0
