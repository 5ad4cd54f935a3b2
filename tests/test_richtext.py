"""Rich-text JSON front-end parity tests (vs utils/richtext_utils.py)."""

import json

import numpy as np
import pytest

from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer
from rich_text_to_image_tpu.utils import richtext
from rich_text_to_image_tpu.utils.colors import COLORS, find_nearest_color, hex_to_rgb

CAT_JSON = (
    '{"ops":[{"insert":"A close-up 4k dslr photo of a "},'
    '{"attributes":{"link":"A cat wearing sunglasses and a bandana around its neck."},'
    '"insert":"cat"},'
    '{"insert":" riding a scooter. There are palm trees in the background."}]}'
)


def test_color_table():
    assert len(COLORS) == 11
    assert COLORS["pink"] == [253, 108, 158]


def test_hex_to_rgb():
    rgb = hex_to_rgb("#ff0000")
    np.testing.assert_allclose(rgb, [1.0, 0.0, 0.0])
    assert find_nearest_color(rgb) == "red"
    assert find_nearest_color([10, 10, 10]) == "black"
    # #fd6c9e is exactly the table's pink
    assert find_nearest_color(hex_to_rgb("#fd6c9e")) == "pink"


def test_parse_footnote():
    parsed = richtext.parse_json(json.loads(CAT_JSON))
    assert parsed.base_text_prompt == (
        "A close-up 4k dslr photo of a cat riding a scooter. "
        "There are palm trees in the background."
    )
    assert parsed.footnote_text_prompts == [
        "A cat wearing sunglasses and a bandana around its neck."
    ]
    assert parsed.footnote_target_tokens == ["cat"]
    assert not parsed.use_grad_guidance
    assert parsed.style_text_prompts == []


def test_parse_style_merging():
    doc = {
        "ops": [
            {"insert": "a "},
            {"attributes": {"font": "mirza"}, "insert": "garden"},
            {"attributes": {"font": "mirza"}, "insert": "house"},
            {"insert": " and a "},
            {"attributes": {"font": "slabo"}, "insert": "river"},
        ]
    }
    parsed = richtext.parse_json(doc)
    style = richtext.font2style("mirza")
    # Adjacent same-font spans merge into one region prompt. The doubled
    # space is reference-exact: its merge splits on "in the style of",
    # keeping the trailing space, then joins with another space
    # (richtext_utils.py:100-104); the tokenizer normalizes it away.
    assert parsed.style_text_prompts == [
        f"garden house in the style of {style}".replace("garden h", "garden  h"),
        f"river in the style of {richtext.font2style('slabo')}",
    ]


def test_parse_color_and_size():
    doc = {
        "ops": [
            {"insert": "a "},
            {"attributes": {"color": "#00ff00"}, "insert": "church"},
            {"insert": " with a "},
            {"attributes": {"size": "60px"}, "insert": "huge"},
            {"attributes": {"size": "30px", "strike": True}, "insert": "tiny"},
            {"attributes": {"strike": True}, "insert": "door"},
            {"insert": " entrance"},
        ]
    }
    parsed = richtext.parse_json(doc)
    assert parsed.use_grad_guidance
    assert parsed.color_text_prompts == ["church"]
    assert parsed.color_names == ["green"]
    np.testing.assert_allclose(parsed.color_rgbs[0], [0.0, 1.0, 0.0])
    # size 60px → 20; strike+30px → -10; strike alone → no entry (quirk parity)
    assert parsed.size_text_prompts_and_sizes == [("huge", 20.0), ("tiny", -10.0)]


def test_space_spans_skipped():
    doc = {
        "ops": [
            {"insert": "a cat"},
            {"attributes": {"font": "mirza"}, "insert": " "},
            {"insert": "dog"},
        ]
    }
    parsed = richtext.parse_json(doc)
    assert parsed.style_text_prompts == []
    assert parsed.base_text_prompt == "a cat dog"


@pytest.fixture
def tok():
    return CLIPTokenizer.byte_level()


def test_region_input_footnote(tok):
    parsed = richtext.parse_json(json.loads(CAT_JSON))
    prompts, token_ids, base_tokens = richtext.get_region_diffusion_input(
        tok._tokenize, parsed
    )
    # one footnote region + the base ("rest") region
    assert prompts == [
        "A cat wearing sunglasses and a bandana around its neck.",
        parsed.base_text_prompt,
    ]
    assert len(token_ids) == 2
    # footnote ids must point at the "cat" sub-word tokens of the base prompt
    for tid in token_ids[0]:
        assert base_tokens[tid - 1] in ("c", "a", "t</w>")
    # rest-region ids are the complement
    assert set(token_ids[0]).isdisjoint(set(token_ids[1]))
    assert set(token_ids[0]) | set(token_ids[1]) == set(
        range(1, len(base_tokens) + 1)
    )


def test_region_input_color_prompt_prefix(tok):
    doc = {
        "ops": [
            {"insert": "a "},
            {"attributes": {"color": "#0000fe"}, "insert": "car"},
            {"insert": " parked"},
        ]
    }
    parsed = richtext.parse_json(doc)
    prompts, token_ids, base_tokens = richtext.get_region_diffusion_input(
        tok._tokenize, parsed
    )
    assert prompts[0] == "blue car"  # nearest color prepended
    assert prompts[-1] == "a car parked"


def test_attention_control_input(tok):
    doc = {
        "ops": [
            {"insert": "a "},
            {"attributes": {"size": "60px"}, "insert": "dog"},
        ]
    }
    parsed = richtext.parse_json(doc)
    _, _, base_tokens = richtext.get_region_diffusion_input(tok._tokenize, parsed)
    fmt = richtext.get_attention_control_input(tok._tokenize, base_tokens, parsed)
    assert fmt["word_pos"] is not None
    assert fmt["font_size"] is not None
    np.testing.assert_allclose(fmt["font_size"], [20.0, 20.0, 20.0])  # d,o,g</w>
    for pos in fmt["word_pos"]:
        assert base_tokens[pos - 1] in ("d", "o", "g</w>")

    empty = richtext.get_attention_control_input(tok._tokenize, base_tokens,
                                                 richtext.parse_json({"ops": [{"insert": "x"}]}))
    assert empty["word_pos"] is None


def test_gradient_guidance_input(tok):
    doc = {
        "ops": [
            {"insert": "a "},
            {"attributes": {"color": "#ff0000"}, "insert": "rose"},
        ]
    }
    parsed = richtext.parse_json(doc)
    _, _, base_tokens = richtext.get_region_diffusion_input(tok._tokenize, parsed)
    fmt = richtext.get_attention_control_input(tok._tokenize, base_tokens, parsed)
    fmt, color_ids = richtext.get_gradient_guidance_input(
        tok._tokenize, base_tokens, parsed, fmt, color_guidance_weight=0.5
    )
    assert fmt["color_guidance_weight"] == 0.5
    assert fmt["guidance_start_step"] == 999
    assert len(fmt["target_RGB"]) == 1
    assert len(color_ids) == 2  # one span + rest
    assert set(color_ids[0].tolist()) | set(color_ids[1].tolist()) == set(
        range(1, len(base_tokens) + 1)
    )
