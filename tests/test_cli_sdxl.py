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
