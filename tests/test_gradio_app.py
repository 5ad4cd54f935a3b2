"""Browser-less gradio demo smoke test (VERDICT item 6).

gradio is absent in the build image, so a minimal recording stub stands in
for it: build_app's construction logic — per-app slider defaults (incl. the
SDXL segment-threshold delta), example-bank wiring into gr.Examples, the
share button, and the generate callback — is exercised for real; only the
web framework is faked. The generate callback is then driven end-to-end on a
tiny pipeline through the recorded click binding, exactly as a button press
would.
"""

import json
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from rich_text_to_image_tpu.models import config as cfg


# ---------------------------------------------------------------------------
# recording gradio stub
# ---------------------------------------------------------------------------

class _Component:
    def __init__(self, kind, *a, **kw):
        self.kind = kind
        self.args = a
        self.kw = kw
        self.clicks = []

    def click(self, fn=None, inputs=None, outputs=None, js=None, **kw):
        self.clicks.append(dict(fn=fn, inputs=inputs, outputs=outputs, js=js))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _make_stub():
    gr = types.ModuleType("gradio")
    gr._created = []

    def _factory(kind):
        def make(*a, **kw):
            c = _Component(kind, *a, **kw)
            gr._created.append(c)
            return c
        return make

    for kind in ("Blocks", "HTML", "Textbox", "Slider", "Button", "Image",
                 "Row", "Examples", "Accordion", "JSON", "Markdown",
                 "Checkbox"):
        setattr(gr, kind, _factory(kind))

    class Error(Exception):
        pass

    gr.Error = Error
    gr.utils = types.SimpleNamespace()
    return gr


@pytest.fixture()
def stub_gradio(monkeypatch):
    gr = _make_stub()
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return gr


@pytest.fixture(scope="module")
def tiny_model():
    from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion

    return RegionDiffusion.random_init(
        seed=0, unet_cfg=cfg.TINY_UNET, vae_cfg=cfg.TINY_VAE,
        text_cfg=cfg.TINY_TEXT, dtype=jnp.float32,
    )


def _components(gr, kind):
    return [c for c in gr._created if c.kind == kind]


def _slider(gr, label):
    return next(c for c in _components(gr, "Slider")
                if c.kw.get("label") == label)


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def test_build_app_constructs_and_wires(stub_gradio, tiny_model):
    from rich_text_to_image_tpu.cli.gradio_app import GET_JS_DATA, build_app
    from rich_text_to_image_tpu.cli.examples import EXAMPLE_SUITES
    from rich_text_to_image_tpu.cli.share_button import COMMUNITY_JS

    demo = build_app("SD", model=tiny_model)
    gr = stub_gradio
    assert demo.kind == "Blocks"
    # SD slider defaults (reference gradio_app.py:182-236)
    assert _slider(gr, "segment threshold").kw["value"] == 0.25
    assert _slider(gr, "inject background").kw["value"] == 0.3
    assert _slider(gr, "steps").kw["value"] == 41
    # example banks: one gr.Examples per suite, 10-column rows
    ex = _components(gr, "Examples")
    assert len(ex) == len(EXAMPLE_SUITES)
    for e in ex:
        assert e.kw["fn"] is not None
        assert len(e.kw["inputs"]) == 10
        for row in e.kw["examples"]:
            assert len(row) == 10
            json.loads(row[0])  # first column is the rich-text JSON
        assert e.kw["cache_examples"] is False  # no weights in this env
    # share button wired with the community JS
    share = next(b for b in _components(gr, "Button")
                 if b.kw.get("elem_id") == "share-btn")
    assert share.clicks and share.clicks[0]["js"] == COMMUNITY_JS
    # generate button wired with the iframe JS bridge
    gen = next(b for b in _components(gr, "Button") if b.args == ("Generate",))
    assert gen.clicks and gen.clicks[0]["js"] == GET_JS_DATA
    # the 10 reference knobs + turbo (encoder reuse) + guidance downsample
    # + the refer-precompute opt-out checkbox (round-5 advisor fix)
    assert len(gen.clicks[0]["inputs"]) == 13


def test_build_app_sdxl_threshold_delta(stub_gradio):
    """SDXL demo defaults to segment threshold 0.55 (gradio_app_xl.py:187);
    AnimeXL back to 0.25 (gradio_app_anime_xl.py:187)."""
    from rich_text_to_image_tpu.cli.examples import APP_DEFAULTS

    assert APP_DEFAULTS["SDXL"]["segment_threshold"] == 0.55
    assert APP_DEFAULTS["AnimeXL"]["segment_threshold"] == 0.25
    assert APP_DEFAULTS["SD"]["segment_threshold"] == 0.25


def test_examples_cover_every_attribute_class():
    from rich_text_to_image_tpu.cli.examples import EXAMPLE_SUITES, EXAMPLES

    used = [k for items in EXAMPLE_SUITES.values() for k, _ in items]
    attrs = set()
    for k in used:
        for op in EXAMPLES[k]["ops"]:
            attrs.update(op.get("attributes", {}))
    assert {"link", "color", "font", "size", "strike"} <= attrs


# ---------------------------------------------------------------------------
# drive the generate callback through the recorded click binding
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_generate_callback_end_to_end(stub_gradio, tiny_model, tmp_path):
    from rich_text_to_image_tpu.cli.examples import EXAMPLES
    from rich_text_to_image_tpu.cli.gradio_app import build_app

    px = tiny_model.unet_cfg.sample_size * tiny_model.vae_scale_factor
    build_app("SD", model=tiny_model, resolution=px)
    gr = stub_gradio
    gen = next(b for b in _components(gr, "Button") if b.args == ("Generate",))
    fn = gen.clicks[0]["fn"]
    out = fn(json.dumps(EXAMPLES["footnote-cat"]), "", 1, 2, 8.5, 0.5,
             0.0, 0.0, 0.3, 4)
    assert len(out) == 4  # plain, rich, segmentation, token maps
    plain, rich = out[0], out[1]
    assert plain.shape == (px, px, 3) and rich.shape == (px, px, 3)
    assert np.isfinite(np.asarray(plain, np.float64)).all()
    # empty input raises the gradio error
    with pytest.raises(gr.Error):
        fn("", "", 1, 2, 8.5, 0.5, 0.0, 0.0, 0.3, 4)


# ---------------------------------------------------------------------------
# editor.html structural contract (no browser in the build image)
# ---------------------------------------------------------------------------

def test_editor_html_contract():
    """The editor's whitelists must match the framework's parsing contract:
    Font.whitelist == FONT2STYLE keys, the size whitelist matches the
    reference's (rich-text-to-json-iframe.html:269), and the Delta JSON is
    published on document.body._data for the JS bridge."""
    import os
    import re

    from rich_text_to_image_tpu.utils.richtext import FONT2STYLE

    path = os.path.join(
        os.path.dirname(__file__), "..", "rich_text_to_image_tpu", "cli",
        "editor.html",
    )
    with open(path, encoding="utf-8") as f:
        html = f.read()
    m = re.search(r"Font\.whitelist = \[([^\]]*)\]", html)
    fonts = re.findall(r"'([^']+)'", m.group(1))
    assert fonts == list(FONT2STYLE)
    m = re.search(r"Size\.whitelist = \[([^\]]*)\]", html)
    sizes = re.findall(r"'([^']+)'", m.group(1))
    assert sizes == ["18px", "32px", "50px", "64px"]
    assert "document.body._data" in html          # host-page JS bridge
    assert 'id="custom-color"' in html            # custom color input
    assert html.count("<option value=\"#") >= 12  # palette swatches
    assert 'class="ql-strike"' in html and 'class="ql-link"' in html
    # every whitelisted font has a picker preview rule
    for font in fonts:
        assert f'data-value={font}]' in html, font


def test_editor_offline_fallback():
    """Zero-egress deployments can't reach the Quill CDN: the page must
    degrade to a textarea publishing the same document.body._data Delta-JSON
    contract, and its prefilled payload must parse through the framework's
    rich-text front-end."""
    import json
    import os
    import re

    from rich_text_to_image_tpu.utils.richtext import parse_json

    path = os.path.join(
        os.path.dirname(__file__), "..", "rich_text_to_image_tpu", "cli",
        "editor.html",
    )
    with open(path, encoding="utf-8") as f:
        html = f.read()
    # the init script must gate on Quill's availability
    assert re.search(r"typeof Quill === 'undefined'", html)
    assert 'id="fallback-json"' in html
    # fallback publishes to the same bridge the host page polls
    fb = html.split("function initQuill")[0]
    assert "document.body._data" in fb
    # the prefilled Delta must be valid JSON and parse as rich text
    m = re.search(r'id="fallback-json"[^>]*>\s*(\{.*?\})</textarea>',
                  html, re.S)
    assert m, "prefilled Delta JSON not found"
    delta = json.loads(m.group(1))
    parsed = parse_json(delta)
    assert parsed.base_text_prompt.strip()
