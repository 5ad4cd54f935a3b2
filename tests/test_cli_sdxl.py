"""CLI flow with the SDXL pipeline (tiny XL config)."""

import json

import numpy as np
import pytest

from rich_text_to_image_tpu.cli.sample import make_parser, run_sample
from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL


@pytest.mark.slow
def test_run_sample_sdxl(tmp_path):
    model = RegionDiffusionXL.random_init(
        seed=0,
        unet_cfg=cfg.TINY_XL_UNET,
        vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        text2_cfg=cfg.CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
            projection_dim=32,
        ),
        agg_start_step=3,
    )
    px = model.unet_cfg.sample_size * model.vae_scale_factor
    doc = (
        '{"ops":[{"insert":"a "},'
        '{"attributes":{"font":"ubuntu"},"insert":"castle"},'
        '{"insert":" on a hill"}]}'
    )
    args = make_parser().parse_args(
        ["--run_dir", str(tmp_path), "--sample_steps", "12", "--model",
         "SDXL", "--num_segments", "3", "--rich_text_json", doc,
         "--seed", "2", "--random_weights"]
    )
    param = {
        "text_input": json.loads(doc),
        "height": px, "width": px,
        "guidance_weight": 5.0, "steps": 12,
        "noise_index": 2, "negative_prompt": "",
    }
    plain, rich = run_sample(model, args, param, save=False)
    assert plain.shape == (1, px, px, 3)
    assert rich.shape == (1, px, px, 3)
    assert np.isfinite(rich.astype(np.float64)).all()


@pytest.mark.slow
def test_run_sample_sdxl_injection_uses_ref_precompute(tmp_path):
    """With injection knobs on, run_sample routes through the refer
    precompute: the plain pass captures the injection-step (Q,K) cache and
    the rich pass consumes it (cli/sample.py ref wiring)."""
    model = RegionDiffusionXL.random_init(
        seed=0,
        unet_cfg=cfg.TINY_XL_UNET,
        vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        text2_cfg=cfg.CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
            projection_dim=32,
        ),
        agg_start_step=3,
    )
    px = model.unet_cfg.sample_size * model.vae_scale_factor
    doc = (
        '{"ops":[{"insert":"a "},'
        '{"attributes":{"font":"ubuntu"},"insert":"castle"},'
        '{"insert":" on a hill"}]}'
    )
    args = make_parser().parse_args(
        ["--run_dir", str(tmp_path), "--sample_steps", "12", "--model",
         "SDXL", "--num_segments", "3", "--rich_text_json", doc,
         "--seed", "2", "--random_weights",
         "--inject_selfattn", "0.3", "--inject_background", "0.3"]
    )
    param = {
        "text_input": json.loads(doc),
        "height": px, "width": px,
        "guidance_weight": 5.0, "steps": 12,
        "noise_index": 2, "negative_prompt": "",
    }
    plain, rich = run_sample(model, args, param, save=False)
    assert rich.shape == (1, px, px, 3)
    assert np.isfinite(rich.astype(np.float64)).all()
    # the plain pass captured the cache at this run's injection steps and
    # the rich program compiled the refpre variant
    assert model.ref_cache is not None
    plan = model.scheduler.plan(12)
    want = tuple(np.nonzero(
        np.asarray(plan.timesteps, np.float64) > 0.7 * 1000)[0].tolist())
    assert tuple(model.ref_cache["steps"]) == want
    assert any(k[0] == "richpre" for k in model._jit_cache)
    # --no_ref_precompute keeps the in-batch flow
    args2 = make_parser().parse_args(
        ["--run_dir", str(tmp_path), "--sample_steps", "12", "--model",
         "SDXL", "--num_segments", "3", "--rich_text_json", doc,
         "--seed", "2", "--random_weights", "--no_ref_precompute",
         "--inject_selfattn", "0.3", "--inject_background", "0.3"]
    )
    model.ref_cache = None
    run_sample(model, args2, param, save=False)
    assert model.ref_cache is None
