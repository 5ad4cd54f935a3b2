"""Demo-layer contract tests that need no gradio and no browser (VERDICT r3 #7).

Two surfaces the environment can't execute for real are pinned structurally:

1. ``run_generate`` — the demo's request contract as a pure function
   (rich-text JSON string → [plain, rich, seg PNG, token-map PNG]), driven
   end-to-end on a tiny pipeline, including the gr.Error-equivalent paths.
2. ``cli/editor.html`` — regex pins on the Quill page's JS contract:
   the ``document.body._data`` publication (reference
   utils/rich-text-to-json-iframe.html:306-311), the 9-entry font whitelist
   (must stay in lockstep with utils/richtext.FONT2STYLE), the size
   whitelist, and the offline fallback textarea that publishes the same
   contract. The parsed-DOM structure checks (element tree, id uniqueness,
   toolbar <select> order — VERDICT r4 #8) live in tests/test_editor_dom.py,
   which owns the shared html.parser DOM builder.
"""

import json
import os
import re

import numpy as np
import pytest

import jax.numpy as jnp

from rich_text_to_image_tpu.cli.gradio_app import GET_JS_DATA, run_generate
from rich_text_to_image_tpu.models import config as cfg
from rich_text_to_image_tpu.utils.richtext import FONT2STYLE

EDITOR = os.path.join(os.path.dirname(__file__), "..",
                      "rich_text_to_image_tpu", "cli", "editor.html")

RICH_JSON = json.dumps({"ops": [
    {"insert": "a "},
    {"attributes": {"color": "#ff0000"}, "insert": "red"},
    {"insert": " rose in a "},
    {"attributes": {"link": "a lush green summer garden"}, "insert": "garden"},
    {"insert": ", "},
    {"attributes": {"size": "50px"}, "insert": "detailed"},
    {"insert": "\n"},
]})


@pytest.fixture(scope="module")
def model():
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, agg_start_step=2, dtype=jnp.float32,
    )


class _DemoError(Exception):
    pass


def test_run_generate_end_to_end(model, tmp_path):
    px = cfg.TINY_UNET.sample_size * model.vae_scale_factor
    outs = run_generate(
        model, px, RICH_JSON, "", seed=3, steps=4, guidance_weight=7.5,
        color_guidance_weight=0.5, inject_selfattn=0.3, inject_background=0.3,
        segment_threshold=0.3, num_segments=4, error_cls=_DemoError,
        vis_dir=str(tmp_path),
    )
    plain, rich, seg_vis, tok_vis = outs
    assert plain.shape == (px, px, 3) and plain.dtype == np.uint8
    assert rich.shape == (px, px, 3) and rich.dtype == np.uint8
    # seg/token-map visualizations: rendered RGB arrays for gr.Image (or
    # None when matplotlib is absent), plus files saved like the reference
    # (attention_utils.py:266-270, :334-335)
    for vis in (seg_vis, tok_vis):
        assert vis is None or (vis.ndim == 3 and vis.shape[-1] in (3, 4))
    saved = os.listdir(tmp_path)
    assert any(f.startswith("segmentation_") and f.endswith(".jpg")
               for f in saved), saved
    assert any(f.startswith("average_seed") and f.endswith(".png")
               for f in saved), saved


def test_run_generate_refpre_opt_out(model, tmp_path):
    """ref_precompute=False mirrors the CLI's --no_ref_precompute: the
    plain pass captures no refer cache and the rich pass runs the
    reference-shaped in-batch flow (ADVICE r4: the in-batch flow must stay
    reachable from the demo)."""
    px = cfg.TINY_UNET.sample_size * model.vae_scale_factor
    outs = run_generate(
        model, px, RICH_JSON, "", seed=3, steps=4, guidance_weight=7.5,
        color_guidance_weight=0.5, inject_selfattn=0.3, inject_background=0.3,
        segment_threshold=0.3, num_segments=4, ref_precompute=False,
        error_cls=_DemoError, vis_dir=str(tmp_path),
    )
    assert model.ref_cache is None
    assert outs[1].shape == (px, px, 3)


def test_run_generate_error_contract(model):
    with pytest.raises(_DemoError, match="empty rich-text input"):
        run_generate(model, 16, "", "", 0, 2, 7.5, 0.5, 0, 0, 0.3, 4,
                     error_cls=_DemoError)
    with pytest.raises(_DemoError, match="invalid rich-text JSON"):
        run_generate(model, 16, "{not json", "", 0, 2, 7.5, 0.5, 0, 0, 0.3, 4,
                     error_cls=_DemoError)


# ---------------------------------------------------------------- editor.html

@pytest.fixture(scope="module")
def editor_html():
    with open(EDITOR, encoding="utf-8") as f:
        return f.read()


def test_editor_publishes_data_contract(editor_html):
    """Both branches (Quill + offline fallback) publish the Delta JSON on
    document.body._data — the host page's JS bridge reads exactly that."""
    assert editor_html.count("document.body._data") >= 2
    assert "JSON.stringify(quill.getContents())" in editor_html
    # the bridge on the gradio side reads the same field
    assert "contentDocument.body._data" in GET_JS_DATA


def test_editor_font_whitelist_matches_parser(editor_html):
    """The editor's font whitelist must stay in lockstep with the parse-side
    FONT2STYLE table (reference font2style, richtext_utils.py:59-71) — a
    font the editor emits but the parser doesn't know crashes parse_json."""
    m = re.search(r"Font\.whitelist\s*=\s*\[([^\]]*)\]", editor_html)
    assert m, "font whitelist missing from editor.html"
    fonts = re.findall(r"'([^']+)'", m.group(1))
    assert fonts == list(FONT2STYLE.keys())
    # every font is offered in the toolbar dropdown too
    for font in fonts:
        assert f'<option value="{font}">' in editor_html, font


def test_editor_size_whitelist(editor_html):
    """Size whitelist mirrors the reference's (18/32/50/64 px; default M has
    no value attribute so Quill emits no size for it)."""
    m = re.search(r"Size\.whitelist\s*=\s*\[([^\]]*)\]", editor_html)
    assert m
    sizes = re.findall(r"'([^']+)'", m.group(1))
    assert sizes == ["18px", "32px", "50px", "64px"]
    for s in sizes:
        assert f'<option value="{s}">' in editor_html, s


def test_editor_offline_fallback_shape(editor_html):
    """Zero-egress deployments degrade to a textarea that publishes the same
    _data contract (framework addition; the reference iframe dies without
    its CDNs)."""
    assert 'typeof Quill === \'undefined\'' in editor_html
    assert 'id="fallback-json"' in editor_html
    assert "JSON.parse(ta.value)" in editor_html  # only valid JSON publishes
    assert "addEventListener('input', publishFallback)" in editor_html


def test_editor_toolbar_controls(editor_html):
    """Strike (negative weight), link (footnote), color pickers exist —
    the four attribute families the parser consumes."""
    for needle in ("ql-strike", "ql-link", "ql-color",
                   'input type="color" id="custom-color"'):
        assert needle in editor_html, needle


