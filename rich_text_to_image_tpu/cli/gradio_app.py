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


def build_app(model_kind: str = "SD", checkpoint_dir: str | None = None,
              random_weights: bool = False):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed in this environment; the demo module is "
            "shipped for deployments that have it (pip install gradio)."
        ) from e

    from ..utils.token_maps import get_token_maps
    from ..utils.viz import plot_attention_maps, save_segmentation
    from ..utils import richtext
    from ..ops.resize import resize_bicubic
    from .sample import build_model

    class _Args:
        model = model_kind
        checkpoint_dir = checkpoint_dir
        random_weights = random_weights

    model = build_model(_Args())
    default_res = 512 if model_kind == "SD" else 1024

    def generate(text_input, negative_prompt, seed, steps, guidance_weight,
                 color_guidance_weight, inject_selfattn, inject_background,
                 segment_threshold, num_segments):
        if not text_input:
            raise gr.Error("empty rich-text input")
        doc = json.loads(text_input)
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
        h = w = default_res
        f = model.vae_scale_factor
        plain, agg = model.produce_attn_maps(
            [parsed.base_text_prompt], [negative_prompt],
            height=h, width=w, num_inference_steps=int(steps),
            guidance_scale=guidance_weight, seed=int(seed),
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
        seg_vis = save_segmentation(clusters, "/tmp/gradio_vis",
                                    int(num_segments), int(seed))
        tok_vis = plot_attention_maps([masks], region_ids[:-1],
                                      "/tmp/gradio_vis", int(seed),
                                      tokens_vis=base_tokens)
        rich = model.prompt_to_img(
            region_prompts, [negative_prompt], height=h, width=w,
            num_inference_steps=int(steps), guidance_scale=guidance_weight,
            use_guidance=parsed.use_grad_guidance,
            inject_selfattn=inject_selfattn,
            inject_background=inject_background,
            text_format_dict=fmt, seed=int(seed),
        )
        return [plain[0], rich[0], seg_vis, tok_vis]

    editor_path = os.path.join(os.path.dirname(__file__), "editor.html")
    with open(editor_path, encoding="utf-8") as fp:
        editor_html = fp.read()

    with gr.Blocks() as demo:
        gr.HTML(
            f'<iframe srcdoc="{gr.utils.sanitize_html(editor_html) if hasattr(gr.utils, "sanitize_html") else editor_html}" '
            'style="width:100%;height:220px;border:none;"></iframe>'
        )
        text_input = gr.Textbox(visible=False)
        negative = gr.Textbox(label="negative prompt", value="")
        with gr.Row():
            seed = gr.Slider(0, 100000, value=6, step=1, label="seed")
            steps = gr.Slider(10, 100, value=41, step=1, label="steps")
            guidance = gr.Slider(1, 20, value=8.5, label="guidance weight")
        with gr.Row():
            colorw = gr.Slider(0, 2, value=0.5, label="color guidance weight")
            inj_s = gr.Slider(0, 1, value=0.0, label="inject self-attention")
            inj_b = gr.Slider(0, 1, value=0.0, label="inject background")
        with gr.Row():
            seg_t = gr.Slider(0, 1, value=0.3, label="segment threshold")
            num_seg = gr.Slider(2, 20, value=9, step=1, label="num segments")
        btn = gr.Button("Generate")
        outs = [gr.Image(label=n) for n in
                ("plain", "rich", "segmentation", "token maps")]
        btn.click(
            generate,
            inputs=[text_input, negative, seed, steps, guidance, colorw,
                    inj_s, inj_b, seg_t, num_seg],
            outputs=outs,
            js=GET_JS_DATA,
        )
    return demo


def main():  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="SD", choices=["SD", "SDXL", "AnimeXL"])
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    a = p.parse_args()
    app = build_app(a.model, a.checkpoint_dir, a.random_weights)
    app.queue(max_size=4).launch(server_port=a.port)


if __name__ == "__main__":  # pragma: no cover
    main()
