"""Torch-RNG-compatible initial latents for seed parity runs.

The reference seeds torch's global RNG and draws the initial latent with
``torch.randn`` (richtext_utils.py:22-27; region_diffusion.py:90-91). To
reproduce reference outputs seed-for-seed we draw the latent with the same
generator and convert:

  * CPU runs (BASELINE config 1 is CPU-runnable): torch CPU (MT19937 +
    Box-Muller) — bit-exact reproducible here since torch-cpu ships in the
    image.
  * CUDA runs: torch's CUDA Philox sequence can't be reproduced without a
    CUDA device; pass the reference-side latent through ``--latents-npy``
    instead (the pipelines accept explicit latents everywhere, matching the
    reference's ``latents=`` argument).

Layout note: the reference latent is NCHW; our pipelines are NHWC — the
transpose happens here so a torch latent drops in unchanged.
"""

from __future__ import annotations

import numpy as np


def torch_randn_latents(seed: int, batch: int, channels: int, h: int, w: int):
    """NHWC float32 latents matching torch.manual_seed(seed); torch.randn on CPU."""
    import torch

    torch.manual_seed(seed)
    lat = torch.randn(batch, channels, h, w)
    return np.asarray(lat.numpy().transpose(0, 2, 3, 1))


def load_latents_npy(path: str):
    """Load a saved reference latent (.npy, NCHW or NHWC) as NHWC."""
    arr = np.load(path)
    # latent channel dim is 4: NCHW iff axis 1 is 4 and axis -1 is not
    if arr.ndim == 4 and arr.shape[1] == 4 and arr.shape[-1] != 4:
        arr = arr.transpose(0, 2, 3, 1)
    return arr.astype(np.float32)
