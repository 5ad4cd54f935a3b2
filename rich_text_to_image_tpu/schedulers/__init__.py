"""Noise schedulers, re-designed as scan-friendly functional steppers.

Each scheduler exposes:
  * ``plan(num_inference_steps)`` → a :class:`SchedulerPlan` of host-side
    numpy arrays: the UNet timesteps plus every per-step scalar the update
    rule needs. Nothing step-index-dependent remains on device except pure
    arithmetic — so the whole denoising loop jits as one ``lax.scan``.
  * ``init_state(shape, dtype)`` → the scan carry (e.g. PNDM's ets ring
    buffer), all static shapes.
  * ``step(plan, i, state, model_output, sample)`` → ``(prev_sample, state)``
    traced with ``i`` a scan index.

Numerics match diffusers 0.18.2 (the reference's pinned version):
PNDM(skip_prk_steps=True, steps_offset=1) as used by the SD-1.5 pipeline
(reference: models/region_diffusion.py:35-36), EulerDiscrete as used by SDXL
(reference: models/region_diffusion_sdxl.py:120), plus DDIM.
"""

from .common import make_alphas_cumprod
from .ddim import DDIMScheduler
from .euler import EulerDiscreteScheduler
from .pndm import PNDMScheduler

__all__ = [
    "make_alphas_cumprod",
    "DDIMScheduler",
    "EulerDiscreteScheduler",
    "PNDMScheduler",
]

from .dpmsolver import DPMSolverMultistepScheduler  # noqa: E402

__all__.append("DPMSolverMultistepScheduler")
