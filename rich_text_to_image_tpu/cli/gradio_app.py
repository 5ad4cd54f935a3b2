"""Gradio web demo (reference: gradio_app.py / gradio_app_xl.py /
gradio_app_anime_xl.py).

Embeds the Quill rich-text editor (cli/editor.html) via the same JS-bridge
trick the reference uses (document.body._data → hidden textbox), exposes the
full knob set as sliders, and returns four outputs: plain image, rich image,
segmentation visualization, token-map visualization.

gradio is an optional dependency (absent in the build image); importing this
module is safe — building the app raises with guidance if it's missing.
"""

from __future__ import annotations

import json
import os

import numpy as np

GET_JS_DATA = """
async (text_input) => {
  const frame = document.querySelector('iframe');
  return frame.contentDocument.body._data || text_input;
}
"""


def run_generate(model, resolution, text_input, negative_prompt, seed, steps,
                 guidance_weight, color_guidance_weight, inject_selfattn,
                 inject_background, segment_threshold, num_segments,
                 encoder_reuse=1, guidance_downsample=1, ref_precompute=True,
                 error_cls=ValueError, vis_dir="/tmp/gradio_vis"):
    """The demo's full request contract as a pure function (testable without
    gradio/browser): rich-text JSON string → [plain image, rich image,
    segmentation PNG path, token-map PNG path]. ``build_app``'s click
    callback is a thin wrapper that maps ``error_cls`` to ``gr.Error``.

    Mirrors reference gradio_app.py:66-156 (same step order, token maps at
    the demo's fixed resolution, color masks for guidance computed before
    region masks).
    """
    from ..ops.resize import resize_bicubic
    from ..utils import richtext
    from ..utils.token_maps import get_token_maps
    from ..utils.viz import plot_attention_maps, save_segmentation

    if not text_input:
        raise error_cls("empty rich-text input")
    try:
        doc = json.loads(text_input)
    except json.JSONDecodeError as e:
        raise error_cls(f"invalid rich-text JSON: {e}") from e
    parsed = richtext.parse_json(doc)
    tok = model.tokenizer._tokenize
    region_prompts, region_ids, base_tokens = (
        richtext.get_region_diffusion_input(tok, parsed)
    )
    fmt = richtext.get_attention_control_input(tok, base_tokens, parsed)
    fmt, color_ids = richtext.get_gradient_guidance_input(
        tok, base_tokens, parsed, fmt,
        color_guidance_weight=color_guidance_weight,
    )
    h = w = resolution
    f = model.vae_scale_factor
    # refer-trajectory precompute (see cli/sample.py run_sample): the plain
    # pass doubles as the reference trajectory the injected rich pass needs.
    # ``ref_precompute=False`` mirrors the CLI's --no_ref_precompute opt-out
    # so the reference-shaped in-batch flow stays reachable from the demo.
    ref_kw = {}
    if (ref_precompute
            and (inject_selfattn > 0 or inject_background > 0)
            and hasattr(model, "_rich_fn_refpre")):
        plan = model.scheduler.plan(int(steps))
        gates = np.asarray(plan.timesteps, np.float64) > (
            (1 - inject_selfattn) * 1000
        )
        ref_kw = {"ref_capture_steps": tuple(np.nonzero(gates)[0].tolist())}
    plain, agg = model.produce_attn_maps(
        [parsed.base_text_prompt], [negative_prompt],
        height=h, width=w, num_inference_steps=int(steps),
        guidance_scale=guidance_weight, seed=int(seed), **ref_kw,
    )
    color_masks = get_token_maps(
        agg, color_ids[:-1], (h // f, w // f), int(seed),
        segment_threshold=segment_threshold,
        num_segments=int(num_segments),
    )
    fmt["color_obj_atten"] = [
        np.asarray(resize_bicubic(np.asarray(m), (h, w)))
        for m in color_masks[:-1]
    ]
    fmt["color_obj_atten_all"] = sum(
        np.asarray(m) for m in color_masks[:-1]
    ) if len(color_masks) > 1 else np.zeros_like(np.asarray(color_masks[0]))
    masks, clusters = get_token_maps(
        agg, region_ids[:-1], (h // f, w // f), int(seed),
        segment_threshold=segment_threshold,
        num_segments=int(num_segments), return_segments=True,
    )
    model.masks = masks
    seg_vis = save_segmentation(clusters, vis_dir,
                                int(num_segments), int(seed))
    tok_vis = plot_attention_maps([masks], region_ids[:-1],
                                  vis_dir, int(seed),
                                  tokens_vis=base_tokens)
    rich = model.prompt_to_img(
        region_prompts, [negative_prompt], height=h, width=w,
        num_inference_steps=int(steps), guidance_scale=guidance_weight,
        use_guidance=parsed.use_grad_guidance,
        inject_selfattn=inject_selfattn,
        inject_background=inject_background,
        text_format_dict=fmt, seed=int(seed),
        **({"encoder_reuse": int(encoder_reuse)}
           if int(encoder_reuse) > 1 else {}),
        **({"guidance_downsample": int(guidance_downsample)}
           if int(guidance_downsample) > 1 else {}),
        **({"ref_cache": model.ref_cache}
           if ref_kw and getattr(model, "ref_cache", None) is not None
           else {}),
    )
    return [plain[0], rich[0], seg_vis, tok_vis]


def build_app(model_kind: str = "SD", checkpoint_dir: str | None = None,
              random_weights: bool = False, model=None,
              resolution: int | None = None, mesh: str | None = None):
    """Construct the demo. ``model``/``resolution`` let tests (and embedders)
    inject a pre-built pipeline / a non-default output size; ``mesh`` takes
    the CLI's --mesh grammar ('auto', 'N', 'dp,tp', 'dcn,dp,tp') to shard
    the serving pipeline over a device mesh (parallel/mesh.py)."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed in this environment; the demo module is "
            "shipped for deployments that have it (pip install gradio)."
        ) from e

    from .sample import build_model

    from .examples import APP_DEFAULTS, example_rows
    from .share_button import COMMUNITY_JS, SHARE_BUTTON_CSS

    if model is None:
        class _Args:
            pass

        _Args.model = model_kind
        _Args.checkpoint_dir = checkpoint_dir
        _Args.random_weights = random_weights
        _Args.mesh = mesh
        model = build_model(_Args())
    elif mesh:
        from ..parallel.mesh import apply_mesh_arg

        apply_mesh_arg(model, mesh)
    d = APP_DEFAULTS[model_kind]
    default_res = resolution or d["resolution"]

    def generate(text_input, negative_prompt, seed, steps, guidance_weight,
                 color_guidance_weight, inject_selfattn, inject_background,
                 segment_threshold, num_segments, encoder_reuse=1,
                 guidance_downsample=1, ref_precompute=True):
        return run_generate(
            model, default_res, text_input, negative_prompt, seed, steps,
            guidance_weight, color_guidance_weight, inject_selfattn,
            inject_background, segment_threshold, num_segments,
            encoder_reuse, guidance_downsample, ref_precompute,
            error_cls=gr.Error,
        )

    editor_path = os.path.join(os.path.dirname(__file__), "editor.html")
    with open(editor_path, encoding="utf-8") as fp:
        editor_html = fp.read()

    with gr.Blocks(css=SHARE_BUTTON_CSS) as demo:
        gr.HTML(
            f'<iframe srcdoc="{gr.utils.sanitize_html(editor_html) if hasattr(gr.utils, "sanitize_html") else editor_html}" '
            'style="width:100%;height:260px;border:none;"></iframe>'
        )
        text_input = gr.Textbox(visible=False)
        negative = gr.Textbox(label="negative prompt", value="")
        with gr.Row():
            seed = gr.Slider(0, 100000, value=d["seed"], step=1, label="seed")
            steps = gr.Slider(10, 100, value=d["steps"], step=1, label="steps")
            guidance = gr.Slider(1, 20, value=d["guidance_weight"],
                                 label="guidance weight")
        with gr.Row():
            colorw = gr.Slider(0, 2, value=d["color_guidance_weight"],
                               label="color guidance weight")
            inj_s = gr.Slider(0, 1, value=d["inject_selfattn"],
                              label="inject self-attention")
            inj_b = gr.Slider(0, 1, value=d["inject_background"],
                              label="inject background")
        with gr.Row():
            # per-app default delta: SDXL uses threshold 0.55, SD/AnimeXL 0.25
            # (reference gradio_app*.py:187)
            seg_t = gr.Slider(0, 1, value=d["segment_threshold"],
                              label="segment threshold")
            num_seg = gr.Slider(2, 20, value=d["num_segments"], step=1,
                                label="num segments")
            turbo = gr.Slider(
                1, 4, value=1, step=1, label="turbo (encoder reuse)",
                info="1 = exact; N>1 recomputes the UNet encoder every Nth "
                     "step (Faster Diffusion) — faster, approximate",
            )
            guid_ds = gr.Slider(
                1, 4, value=1, step=1, label="guidance downsample",
                info="1 = exact; d>1 computes the color-guidance gradient "
                     "at 1/d resolution — faster, approximate",
            )
            refpre = gr.Checkbox(
                value=True, label="refer precompute",
                info="capture the refer trajectory in the plain pass "
                     "(output-exact, faster); untick to run the "
                     "reference-shaped in-batch flow (--no_ref_precompute)",
            )
        btn = gr.Button("Generate")
        with gr.Row(elem_id="outputs"):
            outs = [gr.Image(label=n) for n in
                    ("plain", "rich", "segmentation", "token maps")]
        share = gr.Button("Share to community", elem_id="share-btn")
        share.click(None, [], [], js=COMMUNITY_JS)
        inputs = [text_input, negative, seed, steps, guidance, colorw,
                  inj_s, inj_b, seg_t, num_seg]
        # turbo / guidance-downsample / ref-precompute ride only the live
        # button — example banks keep the exact 10-column reference knob
        # set (generate defaults: 1, 1, True)
        btn.click(generate, inputs=inputs + [turbo, guid_ds, refpre],
                  outputs=outs, js=GET_JS_DATA)
        # example banks (cached as golden demos when real weights exist,
        # reference gradio_app.py:264-508 cache_examples=True)
        for suite, rows in example_rows(model_kind).items():
            gr.Examples(
                examples=rows, label=suite, inputs=inputs, outputs=outs,
                fn=generate,
                # "lazy": cache on first view instead of blocking app
                # startup with a full diffusion run per example row
                cache_examples="lazy" if checkpoint_dir is not None
                else False,
            )
    return demo


def main():  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="SD", choices=["SD", "SDXL", "AnimeXL"])
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--mesh", default=None,
                   help="shard the serving pipeline over a device mesh "
                        "('auto', 'N', 'dp,tp', or 'dcn,dp,tp')")
    a = p.parse_args()
    app = build_app(a.model, a.checkpoint_dir, a.random_weights, mesh=a.mesh)
    app.queue(max_size=4).launch(server_port=a.port)


if __name__ == "__main__":  # pragma: no cover
    main()
