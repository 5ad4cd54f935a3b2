"""Visualization, tracing, and token-map visualizer CLI tests."""

import os

import numpy as np
import pytest

from rich_text_to_image_tpu.utils.tracing import phase, phase_report, sync
from rich_text_to_image_tpu.utils.viz import plot_attention_maps, save_segmentation


def test_save_segmentation(tmp_path):
    clusters = np.random.RandomState(0).randint(0, 5, (32, 32))
    img = save_segmentation(clusters, str(tmp_path), 5, 7)
    assert os.path.exists(tmp_path / "segmentation_k5_seed7.jpg")
    if img is not None:
        assert img.ndim == 3 and img.shape[-1] == 3


def test_plot_attention_maps(tmp_path):
    maps = [np.random.RandomState(1).rand(1, 16, 16) for _ in range(3)]
    tokens = [np.asarray([1, 2]), np.asarray([3])]
    plot_attention_maps([maps], tokens, str(tmp_path), 3,
                        tokens_vis=["a</w>", "cat</w>", "dog</w>"])
    assert os.path.exists(tmp_path / "average_seed3_attn0.png")


def test_phase_timer():
    with phase("demo", annotate=False):
        sync()
    rep = phase_report()
    assert "demo" in rep and rep["demo"] >= 0
    assert phase_report() == {}  # reset


@pytest.mark.slow
def test_visualize_token_maps_cli(tmp_path, monkeypatch):
    from rich_text_to_image_tpu.cli import visualize_token_maps as vtm
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=3,
    )
    monkeypatch.setattr(vtm, "build_model", lambda args: model)
    px = model.unet_cfg.sample_size * model.vae_scale_factor
    vtm.main([
        "--run_dir", str(tmp_path), "--prompt", "a cat by a dog",
        "--words", "cat", "--sample_steps", "12", "--num_segments", "3",
        "--height", str(px), "--width", str(px), "--random_weights",
    ])
    assert any(f.startswith("segmentation_") for f in os.listdir(tmp_path))
