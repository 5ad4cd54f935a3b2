"""CLI wiring test: the full sample.py flow on a tiny random pipeline."""

import json
import os

import numpy as np
import pytest

from rich_text_to_image_tpu.cli.sample import make_parser, run_sample
from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion


@pytest.mark.slow
def test_run_sample_end_to_end(tmp_path):
    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=3,
    )
    px = model.unet_cfg.sample_size * model.vae_scale_factor
    doc = (
        '{"ops":[{"insert":"a "},'
        '{"attributes":{"font":"slabo"},"insert":"tree"},'
        '{"insert":" near a "},'
        '{"attributes":{"color":"#0000ff"},"insert":"lake"},'
        '{"insert":" at dawn"}]}'
    )
    args = make_parser().parse_args(
        ["--run_dir", str(tmp_path), "--sample_steps", "12",
         "--num_segments", "3", "--segment_threshold", "0.25",
         "--rich_text_json", doc, "--seed", "3", "--random_weights",
         "--save_attn"]
    )
    param = {
        "text_input": json.loads(doc),
        "height": px,
        "width": px,
        "guidance_weight": 8.5,
        "steps": 12,
        "noise_index": 3,
        "negative_prompt": "",
    }
    plain, rich = run_sample(model, args, param, save=True)
    assert plain.shape == (1, px, px, 3)
    assert rich.shape == (1, px, px, 3)
    assert os.path.exists(tmp_path / "seed3_plain.jpg")
    assert os.path.exists(tmp_path / "seed3_rich.jpg")
    # two attributed spans → 3 region masks incl. background
    assert len(model.masks) == 3
    # per-call visual debugging parity (attention_utils.py:266-270,334-335):
    # segmentation + token-map figures saved into run_dir on every
    # get_token_maps call, raw map dumps under maps/ with --save_attn
    assert os.path.exists(tmp_path / "segmentation_k3_seed3.jpg")
    assert os.path.exists(tmp_path / "average_seed3_attn0.png")
    assert os.path.exists(tmp_path / "maps" / "selfattn_maps.npy")
    assert os.path.exists(tmp_path / "maps" / "crossattn_maps.npy")
