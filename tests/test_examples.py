"""Example bank sanity: every example parses into valid control inputs."""

from rich_text_to_image_tpu.cli.examples import EXAMPLES
from rich_text_to_image_tpu.models.tokenizer import CLIPTokenizer
from rich_text_to_image_tpu.utils import richtext


def test_examples_parse_and_build_controls():
    tok = CLIPTokenizer.byte_level()
    assert len(EXAMPLES) >= 5
    for name, doc in EXAMPLES.items():
        parsed = richtext.parse_json(doc)
        assert parsed.base_text_prompt, name
        prompts, ids, base_tokens = richtext.get_region_diffusion_input(
            tok._tokenize, parsed
        )
        assert prompts[-1] == parsed.base_text_prompt
        fmt = richtext.get_attention_control_input(
            tok._tokenize, base_tokens, parsed
        )
        fmt, color_ids = richtext.get_gradient_guidance_input(
            tok._tokenize, base_tokens, parsed, fmt
        )
        assert len(color_ids) == len(parsed.color_text_prompts) + 1


def test_examples_cover_all_attributes():
    kinds = {"font": False, "color": False, "size": False, "strike": False,
             "link": False}
    for doc in EXAMPLES.values():
        for op in doc["ops"]:
            for k in (op.get("attributes") or {}):
                if k in kinds:
                    kinds[k] = True
    assert all(kinds.values()), kinds
