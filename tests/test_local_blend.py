"""LocalBlend + word-index helper tests."""

import numpy as np
import pytest

from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer
from rich_text_to_image_tpu.pipelines.prompt_to_prompt import (
    PromptToPromptPipeline,
)
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
from rich_text_to_image_tpu.utils.seq_aligner import get_word_inds

pytestmark = pytest.mark.slow  # heavy pipeline e2e — fast lane: -m 'not slow'


def test_get_word_inds():
    tok = CLIPTokenizer.byte_level()
    inds = get_word_inds("a cat on a mat", "cat", tok)
    # byte-level: "a"=1 token, "cat"=3 tokens at positions 2..4
    np.testing.assert_array_equal(inds, [2, 3, 4])
    # punctuation-insensitive match, multiple occurrences; the trailing
    # period's token belongs to the second word's span (ptp get_word_inds
    # walks whole whitespace words): 3 + 4 tokens
    inds2 = get_word_inds("cat and cat.", "cat", tok)
    assert len(inds2) == 7


@pytest.fixture(scope="module")
def pipe():
    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT,
    )


def test_local_blend_runs_and_constrains(pipe):
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    p2p = PromptToPromptPipeline(pipe)
    imgs_nb = p2p.generate(
        "a cat on a mat", "a red cat on a mat",
        num_inference_steps=6, height=px, width=px, seed=3,
    )
    imgs_lb = p2p.generate(
        "a cat on a mat", "a red cat on a mat",
        num_inference_steps=6, height=px, width=px, seed=3,
        blend_words=("cat", "cat"),
    )
    assert imgs_lb.shape == (2, px, px, 3)
    assert np.isfinite(imgs_lb.astype(np.float64)).all()
    # base rows near-identical (different jitted programs → bf16 fusion
    # noise only). NB: a random tiny UNet yields near-uniform attention, so
    # the default-threshold mask may saturate — the strong mechanics checks
    # use threshold extremes below.
    base_diff = np.abs(imgs_lb[0].astype(int) - imgs_nb[0].astype(int))
    assert base_diff.mean() < 1.0

    # threshold > 1 → empty mask → the edit is fully suppressed: edited
    # latent tracks the base latent, so both rows decode identically
    imgs_zero = p2p.generate(
        "a cat on a mat", "a red cat on a mat",
        num_inference_steps=6, height=px, width=px, seed=3,
        blend_words=("cat", "cat"), blend_threshold=1.5,
    )
    np.testing.assert_allclose(
        imgs_zero[1].astype(int), imgs_zero[0].astype(int), atol=2
    )

    # threshold ≤ 0 → full mask → blend is the identity: matches unblended
    imgs_full = p2p.generate(
        "a cat on a mat", "a red cat on a mat",
        num_inference_steps=6, height=px, width=px, seed=3,
        blend_words=("cat", "cat"), blend_threshold=-1.0,
    )
    np.testing.assert_allclose(
        imgs_full[1].astype(int), imgs_nb[1].astype(int), atol=2
    )


def test_replacement_mapper():
    tok = CLIPTokenizer.byte_level()
    from rich_text_to_image_tpu.utils.seq_aligner import get_replacement_mapper

    # equal-length word swap: "cat" -> "dog" (both 3 byte-tokens).
    # The mapper is the [77,77] matrix form (seq_aligner.py:153-187
    # semantics): identity rows outside the swap, permutation/fractional
    # block inside it.
    mapper = get_replacement_mapper("a cat runs", "a dog runs", tok)
    assert mapper.shape == (77, 77)
    assert mapper[1, 1] == 1  # position of "a" unchanged
    np.testing.assert_array_equal(mapper[2:5, 2:5], np.eye(3))
    # unequal token lengths: fractional redistribution — cat (3 tokens,
    # rows 2:5) spreads 1/8 mass over elephant's 8 target columns 2:10
    m2 = get_replacement_mapper("a cat runs", "a elephant runs", tok)
    np.testing.assert_allclose(m2[2:5, 2:10], np.full((3, 8), 1 / 8))
    np.testing.assert_allclose(m2[2:5].sum(-1), 1.0)  # mass conserved
    # unequal word counts still refuse
    with pytest.raises(ValueError):
        get_replacement_mapper("a cat", "a big cat", tok)


def test_p2p_replace_controller(pipe):
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    p2p = PromptToPromptPipeline(pipe)
    imgs = p2p.generate(
        "a cat runs", "a dog runs", num_inference_steps=6,
        height=px, width=px, seed=5, controller="replace",
    )
    assert imgs.shape == (2, px, px, 3)
    assert np.isfinite(imgs.astype(np.float64)).all()
