"""Golden-regression tests: fixed-seed fp32 tiny-pipeline outputs.

Locks the end-to-end numerics (scheduler + UNet + compositing + token maps)
against accidental drift across refactors. Goldens are summary statistics —
robust to platform-level fp noise but sensitive to any real change. If a
deliberate numerics change breaks these, regenerate via
``python tests/test_golden.py regen``.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden.json")


def _build():
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sd import (
        RegionDiffusion,
        RichControlSpec,
    )

    pipe = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, dtype=jnp.float32, agg_start_step=3,
    )
    h = cfg.TINY_UNET.sample_size
    px = h * pipe.vae_scale_factor
    return pipe, h, px


def _compute():
    from rich_text_to_image_tpu.pipelines.region_sd import RichControlSpec

    pipe, h, px = _build()
    img, agg = pipe.produce_attn_maps(
        ["a cat by a dog"], [""], height=px, width=px,
        num_inference_steps=8, guidance_scale=7.5, seed=11,
    )
    pipe.masks = [
        np.full((1, h, h), 0.25, np.float32),
        np.full((1, h, h), 0.75, np.float32),
    ]
    embeds = pipe.get_text_embeds(["a cat", "a cat by a dog"], [""])
    latents = jax.random.normal(jax.random.PRNGKey(11), (1, h, h, 4))
    rich = pipe.produce_latents(
        embeds, height=px, width=px, num_inference_steps=8,
        latents=latents, spec=RichControlSpec(guidance_scale=7.5),
    )
    return {
        "plain_img_mean": float(np.asarray(img, np.float64).mean()),
        "plain_img_std": float(np.asarray(img, np.float64).std()),
        "self_sum_total": float(agg.self_sum.sum()),
        "cross_sum_total": float(
            sum(float(v.sum()) for v in agg.cross_sums.values())
        ),
        "rich_lat_mean": float(np.asarray(rich).mean()),
        "rich_lat_std": float(np.asarray(rich).std()),
    }


def test_golden_regression():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("no golden file (run `python tests/test_golden.py regen`)")
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    got = _compute()
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=2e-3, abs=1e-4), (k, got[k], v)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        vals = _compute()
        with open(GOLDEN_PATH, "w") as f:
            json.dump(vals, f, indent=2)
        print("wrote", GOLDEN_PATH, vals)
