"""Evaluation harness tests: metrics math + miniature benchmark runs."""

import numpy as np
import pytest

from rich_text_to_image_tpu.evaluation.metrics import (
    RunningStats,
    color_distances,
    compose_region,
)
from rich_text_to_image_tpu.evaluation.suites import (
    COLOR_SUITES,
    STYLES,
    STYLE_SCENES,
)


def test_suite_sizes():
    assert len(COLOR_SUITES["common"]) == 17
    assert len(COLOR_SUITES["html"]) == 33
    assert len(COLOR_SUITES["rgb"]) == 50
    assert len(STYLES) == 7
    assert len(STYLE_SCENES) == 10


def test_color_distance_perfect_match():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = [255, 0, 0]
    mask = np.zeros((8, 8))
    mask[:4] = 1.0
    mn, av = color_distances(img, mask, np.array([1.0, 0, 0]), "red")
    assert mn == pytest.approx(0.0)
    assert av == pytest.approx(0.0)


def test_color_distance_black_background_flip():
    img = np.zeros((4, 4, 3), np.uint8)  # black image
    mask = np.zeros((4, 4))
    mask[0, 0] = 1.0
    # target black: background flips to white so the min is driven by the
    # masked region, not the background
    mn, _ = color_distances(img, mask, np.array([0.0, 0, 0]), "black")
    assert mn == pytest.approx(0.0)
    # and a white target on a black region scores the full distance
    mn, _ = color_distances(img, mask, np.array([1.0, 1, 1]), "white")
    assert mn == pytest.approx(np.sqrt(3), rel=1e-6)


def test_compose_region():
    img = np.full((4, 4, 3), 200, np.uint8)
    mask = np.zeros((4, 4))
    mask[1, 1] = 1.0
    out = compose_region(img, mask)
    assert out[1, 1, 0] == 200 and out[0, 0, 0] == 0


def test_running_stats():
    s = RunningStats()
    for v in (1.0, 2.0, 3.0):
        s.add(v)
    assert s.mean == 2.0 and len(s) == 3


@pytest.mark.slow
def test_benchmark_color_tiny_run():
    from rich_text_to_image_tpu.evaluation import benchmark_color as bc
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=3,
    )
    args = bc.make_parser().parse_args(
        ["--limit", "1", "--num_seeds", "1", "--steps", "12",
         "--save_path", "/tmp/test_bench_color"]
    )
    summary = bc.run(args, model=model)
    assert summary["ours_min"]["n"] == 1
    assert np.isfinite(summary["ours_min"]["mean"])


@pytest.mark.slow
def test_benchmark_color_batched_run():
    """--batch_colors plumbing end-to-end (batched scan → scoring)."""
    from rich_text_to_image_tpu.evaluation import benchmark_color as bc
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=3,
    )
    args = bc.make_parser().parse_args(
        ["--limit", "3", "--num_seeds", "1", "--steps", "8",
         "--batch_colors", "2", "--save_path", "/tmp/test_bench_color_b"]
    )
    summary = bc.run(args, model=model)
    assert summary["ours_min"]["n"] == 3
    assert np.isfinite(summary["ours_min"]["mean"])


@pytest.mark.slow
def test_benchmark_style_batched_run():
    """--batch_pairs plumbing end-to-end (batched scan → CLIP scoring)."""
    from rich_text_to_image_tpu.evaluation import benchmark_style as bs
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
    from rich_text_to_image_tpu.utils.clip_score import CLIPScorer

    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=3,
    )
    scorer = CLIPScorer.random_init(seed=0, tokenizer=model.tokenizer)
    args = bs.make_parser().parse_args(
        ["--limit", "3", "--num_seeds", "1", "--steps", "8",
         "--batch_pairs", "2", "--save_path", "/tmp/test_bench_style_b"]
    )
    summary = bs.run(args, model=model, scorer=scorer)
    assert summary["ours"]["n"] == 6  # 3 items × 2 regions
    assert np.isfinite(summary["ours"]["mean"])
    # an explicitly passed scorer is trusted: smoke-stamp stays False
    assert summary["clip_scores_random_weights"] is False


@pytest.mark.slow
def test_benchmark_style_tiny_run():
    from rich_text_to_image_tpu.evaluation import benchmark_style as bs
    from rich_text_to_image_tpu.models import config as cfg
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
    from rich_text_to_image_tpu.utils.clip_score import CLIPScorer
    from rich_text_to_image_tpu.models.config import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=3,
    )
    scorer = CLIPScorer.random_init(
        seed=0,
        text_cfg=CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, projection_dim=16,
        ),
        vision_cfg=CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, projection_dim=16,
        ),
        tokenizer=model.tokenizer,
    )
    args = bs.make_parser().parse_args(
        ["--limit", "1", "--num_seeds", "1", "--steps", "12",
         "--save_path", "/tmp/test_bench_style"]
    )
    summary = bs.run(args, model=model, scorer=scorer)
    assert summary["ours"]["n"] == 2  # two regions scored
    assert np.isfinite(summary["ours"]["mean"])


def test_token_map_cluster_cache():
    import numpy as np

    from rich_text_to_image_tpu.utils.token_maps import (
        AttnAggregates,
        get_token_maps,
    )

    rng = np.random.RandomState(0)
    A = rng.rand(64, 64).astype(np.float32)
    agg = AttnAggregates(
        self_sum=A, self_count=2,
        cross_sums={8: rng.rand(64, 77).astype(np.float32)},
        cross_layer_count=1,
    )
    m1 = get_token_maps(agg, [np.asarray([3])], (8, 8), seed=1,
                        num_segments=3, n_init=3)
    assert (1, 3, 3) in agg.cluster_cache
    cached = agg.cluster_cache[(1, 3, 3)].copy()
    m2 = get_token_maps(agg, [np.asarray([5])], (8, 8), seed=1,
                        num_segments=3, n_init=3)
    np.testing.assert_array_equal(agg.cluster_cache[(1, 3, 3)], cached)
    # different seed → new clustering entry
    get_token_maps(agg, [np.asarray([5])], (8, 8), seed=2,
                   num_segments=3, n_init=3)
    assert (2, 3, 3) in agg.cluster_cache


def test_benchmark_style_random_scorer_banner(monkeypatch, capsys):
    """With no --clip_dir the scorer resolution must print an unmissable
    random-weight warning (and flag the summary — threading covered by
    test_benchmark_style_batched_run); an explicit scorer prints nothing."""
    from rich_text_to_image_tpu.evaluation import benchmark_style as bs
    from rich_text_to_image_tpu.utils import clip_score as cs

    class DummyScorer:
        def get_clip_score(self, image, text):
            return 0.5

    monkeypatch.setattr(
        cs.CLIPScorer, "random_init",
        classmethod(lambda c, **kw: DummyScorer()),
    )
    import types

    args = bs.make_parser().parse_args(["--save_path", "/tmp/x"])
    stub = types.SimpleNamespace(tokenizer=None)
    scorer, is_random = bs._resolve_scorer(args, model=stub, scorer=None)
    assert isinstance(scorer, DummyScorer) and is_random is True
    assert "RANDOM-WEIGHT" in capsys.readouterr().out

    scorer2, is_random2 = bs._resolve_scorer(args, None, DummyScorer())
    assert is_random2 is False
    assert "RANDOM-WEIGHT" not in capsys.readouterr().out
