"""Pluggable schedulers: the SD pipeline runs with DDIM and DPM-Solver++."""

import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
from rich_text_to_image_tpu.schedulers import (

    DDIMScheduler,
    DPMSolverMultistepScheduler,
)


pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'


@pytest.mark.parametrize("sched_cls", [DDIMScheduler,
                                       DPMSolverMultistepScheduler])
def test_sd_pipeline_with_alt_scheduler(sched_cls):
    pipe = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=3,
        scheduler=sched_cls(),
    )
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    imgs, agg = pipe.produce_attn_maps(
        ["a cat"], [""], height=px, width=px, num_inference_steps=12,
        seed=4,
    )
    assert imgs.shape == (1, px, px, 3)
    assert np.isfinite(agg.self_sum).all()

    h = pipe.unet_cfg.sample_size
    pipe.masks = [np.full((1, h, h), 0.5, np.float32),
                  np.full((1, h, h), 0.5, np.float32)]
    rich = pipe.prompt_to_img(
        ["a red cat", "a cat"], [""], height=px, width=px,
        num_inference_steps=12, seed=4,
    )
    assert rich.shape == (1, px, px, 3)
    assert np.isfinite(rich.astype(np.float64)).all()


@pytest.mark.parametrize("sched_cls", [DDIMScheduler,
                                       DPMSolverMultistepScheduler])
def test_sdxl_pipeline_with_alt_scheduler(sched_cls):
    """SDXL threads scheduler state (previously hardcoded stateless ())."""
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL

    pipe = RegionDiffusionXL.random_init(
        seed=0, unet_cfg=cfg.TINY_XL_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
        text2_cfg=cfg.CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
            projection_dim=32,
        ),
        agg_start_step=3, scheduler=sched_cls(),
    )
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    imgs, agg = pipe.produce_attn_maps(
        ["a cat"], "", height=px, width=px, num_inference_steps=10, seed=4,
    )
    assert imgs.shape == (1, px, px, 3)
    assert np.isfinite(agg.self_sum).all()

    h = pipe.unet_cfg.sample_size
    pipe.masks = [np.full((1, h, h), 0.5, np.float32),
                  np.full((1, h, h), 0.5, np.float32)]
    rich = pipe.prompt_to_img(
        ["a red cat", "a cat"], "", height=px, width=px,
        num_inference_steps=10, seed=4, inject_selfattn=0.3,
    )
    assert rich.shape == (1, px, px, 3)
    assert np.isfinite(rich.astype(np.float64)).all()


def test_cli_scheduler_flag():
    from rich_text_to_image_tpu.cli.sample import _make_scheduler

    assert _make_scheduler(None) is None
    assert isinstance(_make_scheduler("dpm"), DPMSolverMultistepScheduler)
    assert isinstance(_make_scheduler("ddim"), DDIMScheduler)
