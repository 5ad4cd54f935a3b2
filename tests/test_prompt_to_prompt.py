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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# AttentionReplace mapper — differential vs a literal port of the reference
# (utils/seq_aligner.py:130-187) used ONLY as a test oracle.
# ---------------------------------------------------------------------------

def _oracle_word_inds(text, word_place, tokenizer):
    """Literal numpy port of reference get_word_inds (int word_place):
    walks decoded per-token strings, char-counting against the split words."""
    split_text = text.split(" ")
    word_place = [word_place]
    out = []
    ids = tokenizer.encode(text)
    words_encode = [tokenizer.decode([i]).strip("#") for i in ids][1:-1]
    cur_len, ptr = 0, 0
    for i in range(len(words_encode)):
        cur_len += len(words_encode[i])
        if ptr in word_place:
            out.append(i + 1)
        if cur_len >= len(split_text[ptr]):
            ptr += 1
            cur_len = 0
    return np.array(out)


def _oracle_replacement_mapper(x, y, tokenizer, max_len=77):
    """Literal numpy port of reference get_replacement_mapper_."""
    words_x = x.split(" ")
    words_y = y.split(" ")
    inds_replace = [i for i in range(len(words_y)) if words_y[i] != words_x[i]]
    inds_source = [_oracle_word_inds(x, i, tokenizer) for i in inds_replace]
    inds_target = [_oracle_word_inds(y, i, tokenizer) for i in inds_replace]
    mapper = np.zeros((max_len, max_len))
    i = j = 0
    cur_inds = 0
    while i < max_len and j < max_len:
        if cur_inds < len(inds_source) and inds_source[cur_inds][0] == i:
            inds_source_, inds_target_ = inds_source[cur_inds], inds_target[cur_inds]
            if len(inds_source_) == len(inds_target_):
                mapper[inds_source_, inds_target_] = 1
            else:
                ratio = 1 / len(inds_target_)
                for i_t in inds_target_:
                    mapper[inds_source_, i_t] = ratio
            cur_inds += 1
            i += len(inds_source_)
            j += len(inds_target_)
        elif cur_inds < len(inds_source):
            mapper[i, j] = 1
            i += 1
            j += 1
        else:
            mapper[j, j] = 1
            i += 1
            j += 1
    return mapper.astype(np.float32)


@pytest.mark.parametrize("base,edit", [
    ("a cat on a table", "a dog on a table"),      # equal token lengths (3,3)
    ("a cat on a table", "a tiger on a table"),    # 3 -> 5 tokens (fractional)
    ("a zebra in snow", "a ox in snow"),           # 5 -> 2 tokens (fractional)
    ("a cat and a dog here", "a pig and a hen here"),  # two swaps
    ("same words here", "same words here"),        # no-op edit
])
def test_replacement_mapper_matches_reference_oracle(base, edit):
    from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer
    from rich_text_to_image_tpu.utils.seq_aligner import get_replacement_mapper

    tok = CLIPTokenizer.byte_level()
    ours = get_replacement_mapper(base, edit, tok, max_len=77)
    oracle = _oracle_replacement_mapper(base, edit, tok, max_len=77)
    np.testing.assert_array_equal(ours, oracle)


def test_replacement_mapper_fractional_weights():
    from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer
    from rich_text_to_image_tpu.utils.seq_aligner import (
        _word_inds_by_place, get_replacement_mapper,
    )

    tok = CLIPTokenizer.byte_level()
    base, edit = "a cat on a table", "a tiger on a table"
    m = get_replacement_mapper(base, edit, tok)
    src = _word_inds_by_place(base, 1, tok)
    tgt = _word_inds_by_place(edit, 1, tok)
    assert len(src) != len(tgt)
    # every source row spreads mass 1/len(tgt) over all target columns
    np.testing.assert_allclose(m[np.ix_(src, tgt)], 1.0 / len(tgt))
    # source rows sum to 1 (mass conserved)
    np.testing.assert_allclose(m[src].sum(-1), 1.0)


def test_replacement_mapper_long_prompt_clamps():
    """A swap whose tokens land past max_len must clamp, not IndexError
    (the reference's 1-D path bounds writes by max_len)."""
    from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer
    from rich_text_to_image_tpu.utils.seq_aligner import get_replacement_mapper

    tok = CLIPTokenizer.byte_level()
    filler = "word " * 76
    base = filler + "cat"
    edit = filler + "dog"
    m = get_replacement_mapper(base, edit, tok, max_len=77)
    assert m.shape == (77, 77)
    assert np.isfinite(m).all()


@pytest.mark.slow
def test_p2p_replace_unequal_lengths_e2e(pipe):
    """The fractional Replace path runs end-to-end (previously raised)."""
    px = pipe.unet_cfg.sample_size * pipe.vae_scale_factor
    p2p = PromptToPromptPipeline(pipe)
    imgs = p2p.generate(
        "a cat on a table", "a tiger on a table", num_inference_steps=4,
        height=px, width=px, seed=3, controller="replace",
    )
    assert imgs.shape == (2, px, px, 3)
    assert np.isfinite(imgs.astype(np.float64)).all()
