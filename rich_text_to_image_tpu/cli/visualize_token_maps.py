"""Token-map debugging CLI (reference: visualize_token_maps.py:11-57).

Runs the plain pass, segments, and saves token-map + segmentation figures
for user-chosen words.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..utils.token_maps import get_token_maps
from ..utils.viz import plot_attention_maps, save_segmentation
from .sample import build_model


def make_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", type=str, default="results/token_maps")
    p.add_argument("--prompt", type=str,
                   default="A cat riding a scooter by the beach.")
    p.add_argument("--words", type=str, nargs="+", default=["cat", "scooter"])
    p.add_argument("--seed", type=int, default=6)
    p.add_argument("--sample_steps", type=int, default=41)
    p.add_argument("--model", type=str, default="SD",
                   choices=["SD", "SDXL", "AnimeXL"])
    p.add_argument("--guidance_weight", type=float, default=8.5)
    p.add_argument("--segment_threshold", type=float, default=0.3)
    p.add_argument("--num_segments", type=int, default=9)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--random_weights", action="store_true")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    model = build_model(args)
    res = 512 if args.model == "SD" else 1024
    height = args.height or res
    width = args.width or res

    base_tokens = model.tokenizer._tokenize(args.prompt)
    token_ids = []
    for word in args.words:
        ids = [base_tokens.index(t) + 1 for t in model.tokenizer._tokenize(word)]
        token_ids.append(np.asarray(ids, dtype=np.int32))

    _, agg = model.produce_attn_maps(
        [args.prompt], [""], height=height, width=width,
        num_inference_steps=args.sample_steps,
        guidance_scale=args.guidance_weight, seed=args.seed,
    )
    f = model.vae_scale_factor
    masks, clusters = get_token_maps(
        agg, token_ids, (height // f, width // f), args.seed,
        segment_threshold=args.segment_threshold,
        num_segments=args.num_segments, return_segments=True,
    )
    save_segmentation(clusters, args.run_dir, args.num_segments, args.seed)
    plot_attention_maps([masks], token_ids, args.run_dir, args.seed,
                        tokens_vis=base_tokens)
    print(f"saved token maps for {args.words} under {args.run_dir}")


if __name__ == "__main__":
    main()
