"""DDIM scheduler (eta=0, epsilon prediction), diffusers-compatible numerics.

Not used by the reference pipelines (they use PNDM/Euler) but part of the
framework surface: the driver baseline configs name "50-step DDIM" runs.
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
    data_fields=("timesteps", "alpha_prod_t", "alpha_prod_t_prev"),
    meta_fields=("num_steps",),
)
@dataclasses.dataclass(frozen=True)
class DDIMPlan:
    timesteps: np.ndarray  # (S,) int32
    alpha_prod_t: np.ndarray  # (S,) float32
    alpha_prod_t_prev: np.ndarray  # (S,) float32
    num_steps: int


class DDIMScheduler:
    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        steps_offset: int = 1,
        set_alpha_to_one: bool = False,
        clip_sample: bool = False,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        self.clip_sample = clip_sample
        self.alphas_cumprod = make_alphas_cumprod(
            num_train_timesteps, beta_start, beta_end, beta_schedule
        )
        self.final_alpha_cumprod = (
            1.0 if set_alpha_to_one else float(self.alphas_cumprod[0])
        )

    def plan(self, num_inference_steps: int) -> DDIMPlan:
        step_ratio = self.num_train_timesteps // num_inference_steps
        timesteps = (
            (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
        ).astype(np.int64) + self.steps_offset
        alpha_t = self.alphas_cumprod[timesteps]
        prev_t = timesteps - step_ratio
        alpha_prev = np.where(
            prev_t >= 0,
            self.alphas_cumprod[np.clip(prev_t, 0, None)],
            self.final_alpha_cumprod,
        )
        return DDIMPlan(
            timesteps=timesteps.astype(np.int32),
            alpha_prod_t=alpha_t.astype(np.float32),
            alpha_prod_t_prev=alpha_prev.astype(np.float32),
            num_steps=num_inference_steps,
        )

    def init_state(self, latent_shape, dtype=jnp.float32):
        return ()

    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, plan, i, sample):
        del plan, i
        return sample

    def step(self, plan: DDIMPlan, i, state, model_output, sample):
        alpha_t = jnp.asarray(plan.alpha_prod_t)[i]
        alpha_prev = jnp.asarray(plan.alpha_prod_t_prev)[i]
        beta_t = 1.0 - alpha_t
        model_output = model_output.astype(sample.dtype)
        x0 = (sample - beta_t**0.5 * model_output) / alpha_t**0.5
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        dir_xt = (1.0 - alpha_prev) ** 0.5 * model_output
        prev = alpha_prev**0.5 * x0 + dir_xt
        return prev, state
