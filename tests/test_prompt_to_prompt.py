"""Prompt-to-prompt baseline tests (tiny config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.pipelines.prompt_to_prompt import (
    PromptToPromptPipeline,
)
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
from rich_text_to_image_tpu.utils.seq_aligner import get_refinement_mapper


def test_refinement_mapper_insertion():
    base = np.array([49, 1, 2, 3, 50, 0, 0])
    edit = np.array([49, 1, 9, 2, 3, 50, 0])  # token 9 inserted
    mapper, alphas = get_refinement_mapper(base, edit, max_len=7)
    # shared tokens map to base positions
    assert mapper[0] == 0 and alphas[0] == 1
    assert mapper[1] == 1 and alphas[1] == 1
    assert alphas[2] == 0  # inserted token keeps its own attention
    assert mapper[3] == 2 and alphas[3] == 1
    assert mapper[4] == 3 and alphas[4] == 1


def test_refinement_mapper_identical():
    ids = np.array([49, 5, 6, 50])
    mapper, alphas = get_refinement_mapper(ids, ids, max_len=4)
    np.testing.assert_array_equal(mapper, np.arange(4))
    np.testing.assert_array_equal(alphas, np.ones(4))


@pytest.fixture(scope="module")
def pipe():
    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
    )


def test_p2p_generate(pipe):
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    p2p = PromptToPromptPipeline(pipe)
    imgs = p2p.generate(
        "a cat", "a red cat", num_inference_steps=8,
        height=px, width=px, seed=1,
    )
    assert imgs.shape == (2, px, px, 3)
    assert np.isfinite(imgs.astype(np.float64)).all()
    # base and edited differ, but share early structure (same latent)
    assert np.abs(imgs[0].astype(int) - imgs[1].astype(int)).max() > 0


def test_p2p_identical_prompts_match(pipe):
    """Editing with the identical prompt must reproduce the base image."""
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    p2p = PromptToPromptPipeline(pipe)
    imgs = p2p.generate(
        "a cat", "a cat", num_inference_steps=8, height=px, width=px, seed=2,
    )
    # the edited branch recomputes attention through the injection path
    # (gather + mix) in bf16; with a random (chaotic) tiny UNet, rounding
    # noise grows over steps, so demand *relative* identity: the identical
    # edit must be far closer to the base than a real edit is
    diff_same = np.abs(imgs[0].astype(np.float64) - imgs[1].astype(np.float64)).mean()
    imgs2 = p2p.generate(
        "a cat", "a big red dog", num_inference_steps=8,
        height=px, width=px, seed=2,
    )
    diff_edit = np.abs(
        imgs2[0].astype(np.float64) - imgs2[1].astype(np.float64)
    ).mean()
    assert diff_same < 0.3 * diff_edit, (diff_same, diff_edit)
