"""Local-style benchmark (protocol of evaluation/benchmark_style.py).

10 scenes × 2 regions × 7×6 ordered style pairs × 3 seeds; rich pass with
"<region> in the style of <style>" prompts (no guidance/injection —
:124-127); metric: CLIP similarity of the black-composited region crop vs
its styled region prompt (:146-167), overall and per-region.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..ops.resize import resize_bicubic
from ..utils.token_maps import get_token_maps, host_cpu
from .metrics import RunningStats, compose_region
from .suites import (
    GUIDANCE_SCALE,
    NUM_DIFFUSION_STEPS,
    STYLE_REGIONS,
    STYLE_SCENES,
    STYLES,
)


def make_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_seeds", type=int, default=3)
    p.add_argument("--save_path", default="results/benchmark_style")
    p.add_argument("--save_img", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--steps", type=int, default=NUM_DIFFUSION_STEPS)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--clip_dir", type=str, default=None,
                   help="local CLIP ViT-B/32 checkpoint for the scorer")
    p.add_argument("--with_p2p", action="store_true")
    p.add_argument("--load_previous", action="store_true",
                   help="re-score previously saved images instead of "
                        "regenerating (reference benchmark_style.py)")
    p.add_argument("--batch_pairs", type=int, default=1,
                   help="TPU batch-DP: run N style pairs per (seed,scene) "
                        "in ONE scan (RegionDiffusion.style_bench_batch). "
                        "1 = the reference's sequential loop")
    p.add_argument("--mesh", type=str, default=None,
                   help="shard the suite over a device mesh ('auto', 'N', "
                        "'dp,tp', or 'dcn,dp,tp'): params over tp, the "
                        "--batch_pairs item axis over dp. Default: single "
                        "device")
    return p


def _resolve_scorer(args, model, scorer):
    """Returns (scorer, is_random). A random-weight fallback (no --clip_dir
    in a zero-egress environment) prints an unmissable banner so smoke
    scores can never be mistaken for style-fidelity results."""
    if scorer is not None:
        return scorer, False
    from ..utils.clip_score import CLIPScorer

    if args.clip_dir:
        return CLIPScorer.from_pretrained(args.clip_dir), False
    print(
        "=" * 70 + "\n"
        "WARNING: no --clip_dir given — CLIP scorer is RANDOM-WEIGHT.\n"
        "The benchmark protocol runs, but every CLIP similarity below\n"
        "is protocol-only smoke output, NOT a style-fidelity result.\n"
        "Pass --clip_dir <local ViT-B/32 checkpoint> for real scores.\n"
        + "=" * 70,
        flush=True,
    )
    return CLIPScorer.random_init(seed=0, tokenizer=model.tokenizer), True


def run(args, model=None, scorer=None):
    import jax

    if model is None:
        from ..pipelines.region_sd import RegionDiffusion

        if args.checkpoint_dir:
            model = RegionDiffusion.from_pretrained(args.checkpoint_dir)
        else:
            model = RegionDiffusion.random_init(seed=0)
    if getattr(args, "mesh", None):
        from ..parallel.mesh import apply_mesh_arg

        apply_mesh_arg(model, args.mesh)
    scorer, scorer_is_random = _resolve_scorer(args, model, scorer)

    p2p = None
    if args.with_p2p:
        from ..pipelines.prompt_to_prompt import PromptToPromptPipeline

        p2p = PromptToPromptPipeline(model)

    os.makedirs(args.save_path, exist_ok=True)
    height = width = 512 if model.unet_cfg.sample_size >= 64 else (
        model.unet_cfg.sample_size * model.vae_scale_factor
    )
    lat_hw = (height // model.vae_scale_factor,
              width // model.vae_scale_factor)

    overall = {"ours": RunningStats(), "p2p": RunningStats()}
    per_region = {
        "ours": [RunningStats(), RunningStats()],
        "p2p": [RunningStats(), RunningStats()],
    }

    for seed in range(args.seed, args.seed + args.num_seeds):
        latent = jax.random.normal(jax.random.PRNGKey(seed), (1, *lat_hw, 4))
        n_done = 0
        for scene, regions in zip(STYLE_SCENES, STYLE_REGIONS):
            _, agg = model.produce_attn_maps(
                [scene], [""], height=height, width=width,
                num_inference_steps=args.steps,
                guidance_scale=GUIDANCE_SCALE, latents=latent, seed=seed,
            )
            base_tokens = model.tokenizer._tokenize(scene)
            ids = []
            for span in regions:
                ids.append(np.asarray(
                    [base_tokens.index(t) + 1
                     for t in model.tokenizer._tokenize(span)],
                    dtype=np.int32))
            masks = get_token_maps(
                agg, ids, lat_hw, seed, segment_threshold=0.3,
                num_segments=15,
            )
            model.masks = masks
            with host_cpu():
                masks_px = [
                    np.asarray(resize_bicubic(np.asarray(m), (height, width)))
                    .clip(0, 1)[0]
                    for m in masks
                ]
            # --- batched fast path: style pairs of this (seed, scene) in
            # chunked single-scan calls
            pre_imgs = {}
            if args.batch_pairs > 1 and not args.load_previous:
                todo = [(s1, s2) for s1 in STYLES for s2 in STYLES
                        if s1 != s2]
                if args.limit:
                    todo = todo[: max(args.limit - n_done, 0)]
                for c0 in range(0, len(todo), args.batch_pairs):
                    chunk = todo[c0:c0 + args.batch_pairs]
                    items = [
                        [f"{regions[0]} in the style of {s1}",
                         f"{regions[1]} in the style of {s2}", scene]
                        for s1, s2 in chunk
                    ]
                    imgs = model.style_bench_batch(
                        items, height, width, args.steps, GUIDANCE_SCALE,
                        seed=seed, latents=latent,
                    )
                    for (s1, s2), im in zip(chunk, imgs):
                        pre_imgs[(s1, s2)] = im[None]

            for s1 in STYLES:
                for s2 in STYLES:
                    if s1 == s2:
                        continue
                    if args.limit and n_done >= args.limit:
                        break
                    n_done += 1
                    rich = [
                        f"{regions[0]} in the style of {s1}",
                        f"{regions[1]} in the style of {s2}",
                        scene,
                    ]
                    base_name = "_".join(regions)
                    ours_name = os.path.join(
                        args.save_path,
                        f"ours_{base_name}_{s1}_{s2}_{seed}.png")
                    if args.load_previous:
                        from PIL import Image

                        img = np.asarray(Image.open(ours_name))[None]
                    elif (s1, s2) in pre_imgs:
                        img = pre_imgs[(s1, s2)]
                        if args.save_img:
                            from PIL import Image

                            Image.fromarray(img[0]).save(ours_name)
                    else:
                        img = model.prompt_to_img(
                            rich, [""], height=height, width=width,
                            num_inference_steps=args.steps,
                            guidance_scale=GUIDANCE_SCALE, latents=latent,
                            use_guidance=False, seed=seed,
                        )
                        if args.save_img:
                            from PIL import Image

                            Image.fromarray(img[0]).save(ours_name)
                    img_p2p = None
                    if p2p is not None:
                        edited = scene.replace(regions[0], rich[0]).replace(
                            regions[1], rich[1])
                        img_p2p = p2p.generate(
                            scene, edited, latents=latent,
                            num_inference_steps=args.steps,
                            guidance_scale=GUIDANCE_SCALE, seed=seed,
                            height=height, width=width,
                        )
                    for rid in range(2):
                        crop = compose_region(img[0], masks_px[rid])
                        sc = scorer.get_clip_score(crop, rich[rid])
                        overall["ours"].add(sc)
                        per_region["ours"][rid].add(sc)
                        if img_p2p is not None:
                            crop = compose_region(img_p2p[-1], masks_px[rid])
                            sc = scorer.get_clip_score(crop, rich[rid])
                            overall["p2p"].add(sc)
                            per_region["p2p"][rid].add(sc)
                    print(
                        f"N: {len(overall['ours'])}, "
                        f"ours: {overall['ours'].fmt()}, "
                        f"p2p: {overall['p2p'].fmt()}"
                    )
                if args.limit and n_done >= args.limit:
                    break
            if args.limit and n_done >= args.limit:
                break

    summary = {
        "ours": {"mean": overall["ours"].mean, "std": overall["ours"].std,
                 "region1": per_region["ours"][0].mean,
                 "region2": per_region["ours"][1].mean,
                 "n": len(overall["ours"])},
        "p2p": {"mean": overall["p2p"].mean, "std": overall["p2p"].std,
                "n": len(overall["p2p"])},
        # stamped so a saved smoke run can never be mistaken for results
        "clip_scores_random_weights": scorer_is_random,
    }
    summary["config"] = {
        k: v for k, v in sorted(vars(args).items())
        if isinstance(v, (bool, int, float, str, type(None)))
    }
    with open(os.path.join(args.save_path, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    args = make_parser().parse_args(argv)
    run(args)


if __name__ == "__main__":
    main()
