"""CLI sampler — flag- and flow-compatible with the reference sample.py.

Same knob set (SURVEY §5 "the knob set IS the public API"): --seed,
--sample_steps, --rich_text_json, --negative_prompt, --model,
--guidance_weight, --color_guidance_weight, --inject_selfattn,
--segment_threshold, --num_segments, --inject_background, --run_dir,
--height/--width. Plus TPU-framework additions: --checkpoint_dir (local HF
checkpoint; the reference downloads from the hub at runtime) and
--random_weights (weight-free smoke mode).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _make_scheduler(name):
    if name is None:
        return None
    from ..schedulers import (
        DDIMScheduler,
        DPMSolverMultistepScheduler,
        EulerDiscreteScheduler,
        PNDMScheduler,
    )

    return {
        "pndm": PNDMScheduler,
        "ddim": DDIMScheduler,
        "dpm": DPMSolverMultistepScheduler,
        "euler": EulerDiscreteScheduler,
    }[name]()


def _place_on_mesh(model, args):
    """Honor --mesh: shard the pipeline over a (dp,tp) device mesh.

    The reference is strictly single-GPU; this is the TPU framework's
    introduced scale-out surface (SURVEY §2: benchmark work items and the
    rich pass's batched UNet rows are embarrassingly dp-parallel)."""
    from ..parallel.mesh import apply_mesh_arg

    return apply_mesh_arg(model, getattr(args, "mesh", None))


def build_model(args):
    sched = _make_scheduler(getattr(args, "scheduler", None))
    if args.model in ("SD",):
        from ..pipelines.region_sd import RegionDiffusion

        if args.checkpoint_dir:
            model = RegionDiffusion.from_pretrained(args.checkpoint_dir)
        elif args.random_weights:
            model = RegionDiffusion.random_init(seed=0)
        else:
            model = None
        if model is not None:
            if sched is not None:
                model.scheduler = sched
            return _place_on_mesh(model, args)
        raise SystemExit(
            "no weights: pass --checkpoint_dir <local SD-1.5 dir> "
            "or --random_weights"
        )
    elif args.model in ("SDXL", "AnimeXL"):
        import jax.numpy as jnp

        from ..pipelines.region_sdxl import RegionDiffusionXL

        kw = {}
        if getattr(args, "bf16_vae", False):
            kw["vae_dtype"] = jnp.bfloat16
        if args.checkpoint_dir:
            model = RegionDiffusionXL.from_pretrained(args.checkpoint_dir, **kw)
        elif args.random_weights:
            model = RegionDiffusionXL.random_init(seed=0, **kw)
        else:
            model = None
        if model is not None:
            if sched is not None:
                model.scheduler = sched
            return _place_on_mesh(model, args)
        raise SystemExit(
            "no weights: pass --checkpoint_dir <local SDXL dir> "
            "or --random_weights"
        )
    raise NotImplementedError(args.model)


def run_sample(model, args, param, save=True):
    """The reference main() flow (sample.py:17-114)."""
    from ..utils import richtext
    from ..utils.token_maps import get_token_maps, host_cpu
    from ..ops.resize import resize_bicubic

    run_dir = args.run_dir
    os.makedirs(run_dir, exist_ok=True)
    parsed = richtext.parse_json(param["text_input"])
    tok = model.tokenizer._tokenize
    region_text_prompts, region_target_token_ids, base_tokens = (
        richtext.get_region_diffusion_input(tok, parsed)
    )
    text_format_dict = richtext.get_attention_control_input(
        tok, base_tokens, parsed
    )
    text_format_dict, color_target_token_ids = richtext.get_gradient_guidance_input(
        tok, base_tokens, parsed, text_format_dict,
        color_guidance_weight=args.color_guidance_weight,
    )

    height, width = param["height"], param["width"]
    seed = param["noise_index"]
    negative_text = param["negative_prompt"]
    f = model.vae_scale_factor
    lat_hw = (height // f, width // f)

    # Refer-trajectory precompute: when the rich pass will run with
    # injection, the plain pass (same seed/prompt/scheduler — it IS the
    # refer trajectory the reference re-denoises, region_diffusion_sdxl.py
    # :805-832) also captures the injection-step (Q,K)/resnet features +
    # latent trajectory so the rich scan drops both refer rows.
    use_refpre = (
        (args.inject_selfattn > 0 or args.inject_background > 0)
        and not getattr(args, "no_ref_precompute", False)
        and hasattr(model, "_rich_fn_refpre")
    )
    ref_kw = {}
    if use_refpre:
        plan = model.scheduler.plan(param["steps"])
        gates = np.asarray(plan.timesteps, np.float64) > (
            (1 - args.inject_selfattn) * 1000
        )
        ref_kw = {"ref_capture_steps": tuple(np.nonzero(gates)[0].tolist())}

    # ---- plain pass + attention aggregation
    begin = time.time()
    plain_img, agg = model.produce_attn_maps(
        [parsed.base_text_prompt], [negative_text],
        height=height, width=width, num_inference_steps=param["steps"],
        guidance_scale=param["guidance_weight"], seed=seed, **ref_kw,
    )
    if save:
        _imwrite(os.path.join(run_dir, f"seed{seed}_plain.jpg"), plain_img[0])
    print("time lapses to get attention maps: %.4f" % (time.time() - begin))

    # ---- token maps (color spans, then region spans — sample.py:77-92).
    # Like the reference, every call saves segmentation + token-map figures
    # into run_dir (attention_utils.py:266-270,334-335).
    vis_kw = dict(
        save_dir=run_dir if save else None,
        tokens_vis=base_tokens,
        save_attn=getattr(args, "save_attn", False),
    )
    color_obj_masks = get_token_maps(
        agg, color_target_token_ids[:-1], lat_hw, seed,
        segment_threshold=args.segment_threshold,
        num_segments=args.num_segments, **vis_kw,
    )
    color_obj_atten_all = np.zeros_like(color_obj_masks[-1])
    for m in color_obj_masks[:-1]:
        color_obj_atten_all += m
    with host_cpu():
        text_format_dict["color_obj_atten"] = [
            np.asarray(resize_bicubic(np.asarray(m), (height, width)))
            for m in color_obj_masks[:-1]
        ]
    text_format_dict["color_obj_atten_all"] = color_obj_atten_all
    model.masks = get_token_maps(
        agg, region_target_token_ids[:-1], lat_hw, seed,
        segment_threshold=args.segment_threshold,
        num_segments=args.num_segments, **vis_kw,
    )

    # ---- rich pass
    begin = time.time()
    rich_img = model.prompt_to_img(
        region_text_prompts, [negative_text],
        height=height, width=width, num_inference_steps=param["steps"],
        guidance_scale=param["guidance_weight"],
        use_guidance=parsed.use_grad_guidance,
        inject_selfattn=args.inject_selfattn,
        inject_background=args.inject_background,
        text_format_dict=text_format_dict, seed=seed,
        **({"encoder_reuse": args.encoder_reuse,
            "encoder_schedule": getattr(args, "encoder_schedule", "early")}
           if args.encoder_reuse > 1 else {}),
        **({"bf16_guidance": True}
           if getattr(args, "bf16_guidance", False) else {}),
        **({"guidance_downsample": args.guidance_downsample}
           if getattr(args, "guidance_downsample", 1) > 1 else {}),
        **({"ref_cache": model.ref_cache}
           if use_refpre and getattr(model, "ref_cache", None) is not None
           else {}),
    )
    if save:
        _imwrite(os.path.join(run_dir, f"seed{seed}_rich.jpg"), rich_img[0])
    print(
        "time lapses to generate image from rich text: %.4f"
        % (time.time() - begin)
    )
    return plain_img, rich_img


def _imwrite(path, img):
    try:
        import imageio

        imageio.imwrite(path, img)
    except Exception:
        from PIL import Image

        Image.fromarray(img).save(path)


def make_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_dir", type=str, default="results/")
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--seed", type=int, default=6)
    parser.add_argument("--sample_steps", type=int, default=41)
    parser.add_argument(
        "--rich_text_json", type=str,
        default='{"ops":[{"insert":"A close-up 4k dslr photo of a "},{"attributes":{"link":"A cat wearing sunglasses and a bandana around its neck."},"insert":"cat"},{"insert":" riding a scooter. There are palm trees in the background."}]}',
    )
    parser.add_argument("--negative_prompt", type=str, default="")
    parser.add_argument("--model", type=str, default="SD",
                        choices=["SD", "SDXL", "AnimeXL"])
    parser.add_argument("--guidance_weight", type=float, default=8.5)
    parser.add_argument("--color_guidance_weight", type=float, default=0.5)
    parser.add_argument("--inject_selfattn", type=float, default=0.0)
    parser.add_argument("--segment_threshold", type=float, default=0.3)
    parser.add_argument("--num_segments", type=int, default=9)
    parser.add_argument("--inject_background", type=float, default=0.0)
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--random_weights", action="store_true")
    parser.add_argument(
        "--bf16_vae", action="store_true",
        help="SDXL: decode the VAE in bfloat16 (fp32 range, ~4x faster "
             "matmuls) — the TPU analogue of the reference efficient "
             "variant's bf16 decode; default keeps the reference's fp32",
    )
    parser.add_argument(
        "--save_attn", action="store_true",
        help="dump raw aggregated self/cross attention maps under "
             "run_dir/maps/ (reference attention_utils.py:257-260)",
    )
    parser.add_argument(
        "--scheduler", type=str, default=None,
        choices=["pndm", "ddim", "dpm", "euler"],
        help="override the pipeline default (SD: pndm, SDXL: euler)",
    )
    parser.add_argument(
        "--bf16_guidance", action="store_true",
        help="run the color-guidance VAE decode + gradient in bfloat16 "
             "(fp32 range, ~3x cheaper); default keeps fp32 math",
    )
    parser.add_argument(
        "--no_ref_precompute", action="store_true",
        help="disable the refer-trajectory precompute (rich pass recomputes "
             "the reference trajectory in-batch like the reference code)",
    )
    parser.add_argument(
        "--guidance_downsample", type=int, default=1,
        help="compute the color-guidance gradient at 1/d resolution "
             "(pool the x0 latent before the VAE decode, ~d^2 cheaper); "
             "1 = exact reference math",
    )
    parser.add_argument(
        "--encoder_reuse", type=int, default=1,
        help="rich-pass turbo: recompute the UNet encoder only every Nth "
             "step and reuse cached down-path features between (Faster "
             "Diffusion, arXiv 2312.09608). 1 = off (exact reference math)",
    )
    parser.add_argument(
        "--mesh", type=str, default=None,
        help="shard the pipeline over a device mesh: 'auto' (all chips), "
             "'N' (first N chips), 'dp,tp' (e.g. '2,4'), or 'dcn,dp,tp' "
             "for multi-host. Params shard over tp, batched UNet rows "
             "over dp (parallel/mesh.py rules). Default: single device, "
             "the reference's execution model",
    )
    parser.add_argument(
        "--encoder_schedule", choices=["early", "uniform"], default="early",
        help="key-step placement for --encoder_reuse: 'early' packs key "
             "steps denser at high noise (the paper's non-uniform "
             "prescription), 'uniform' spaces them evenly",
    )
    return parser


def main(argv=None):
    args = make_parser().parse_args(argv)
    default_resolution = 512 if args.model == "SD" else 1024
    param = {
        "text_input": json.loads(args.rich_text_json),
        "height": args.height or default_resolution,
        "width": args.width or default_resolution,
        "guidance_weight": args.guidance_weight,
        "steps": args.sample_steps,
        "noise_index": args.seed,
        "negative_prompt": args.negative_prompt,
    }
    model = build_model(args)
    run_sample(model, args, param)


if __name__ == "__main__":
    main()
