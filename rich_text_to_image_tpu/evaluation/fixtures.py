"""Loader for the committed trained color fixture.

The fixture (tests/fixtures/color_fixture, produced by
scripts/train_color_fixture.py) is a tiny VAE+UNet pair trained on synthetic
colored-square images so that decode(latent) is genuinely color-faithful —
the precondition for the color-guidance eval gates (reference protocol:
evaluation/benchmark_color.py:283-331) to measure *steering*, not noise.

Only the trained trees are stored (fp16 npz); the frozen random text
encoder/tokenizer are rebuilt deterministically via random_init(seed=0).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

FIXTURE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "tests", "fixtures",
    "color_fixture",
))


def _unflatten(template, npz):
    leaves, treedef = jax.tree.flatten_with_path(template)
    out = []
    for path, leaf in leaves:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        arr = np.asarray(npz[key], np.float32)
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        out.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, out)


def load_color_fixture(fixture_dir: str = FIXTURE_DIR, **pipeline_kw):
    """Rebuild the trained tiny RegionDiffusion pipeline (float32)."""
    from ..models import config as cfgs
    from ..pipelines.region_sd import RegionDiffusion

    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfgs.FIXTURE_UNET, vae_cfg=cfgs.TINY_VAE,
        text_cfg=cfgs.TINY_TEXT, dtype=jnp.float32, **pipeline_kw,
    )
    with np.load(os.path.join(fixture_dir, "unet_params.npz")) as z:
        model.unet_params = _unflatten(model.unet_params, z)
    with np.load(os.path.join(fixture_dir, "vae_params.npz")) as z:
        model.vae_params = _unflatten(model.vae_params, z)
    return model


def fixture_meta(fixture_dir: str = FIXTURE_DIR) -> dict:
    with open(os.path.join(fixture_dir, "fixture_meta.json")) as f:
        return json.load(f)
