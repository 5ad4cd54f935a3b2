"""Visualization: segmentation figures + token/attention heat grids.

Parity with the reference's always-on visual debugging
(utils/attention_utils.py:96-149 plot_attention_maps; :266-270 segmentation
figure). matplotlib is host-side and optional — every function degrades to a
raw-array PNG when it's unavailable.
"""

from __future__ import annotations

import os

import numpy as np


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def save_segmentation(clusters: np.ndarray, save_dir: str, num_segments: int,
                      seed: int) -> np.ndarray | None:
    """Save segmentation figure ``segmentation_k{K}_seed{S}.jpg``; returns the
    rendered RGB array (reference attention_utils.py:266-277)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"segmentation_k{num_segments}_seed{seed}.jpg")
    plt = _mpl()
    if plt is None:
        _save_raw(clusters / max(clusters.max(), 1), path)
        return None
    fig = plt.figure()
    plt.imshow(clusters)
    plt.axis("off")
    plt.savefig(path, bbox_inches="tight", pad_inches=0)
    fig.canvas.draw()
    w, h = fig.canvas.get_width_height()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    img = buf.reshape(h, w, 4)[..., :3].copy()
    plt.close("all")
    return img


def plot_attention_maps(map_lists, obj_tokens, save_dir: str, seed: int,
                        tokens_vis=None) -> np.ndarray | None:
    """Heat-grid figure(s) ``average_seed{S}_attn{i}.png`` per map list
    (reference attention_utils.py:96-149)."""
    os.makedirs(save_dir, exist_ok=True)
    plt = _mpl()
    img = None
    for i, maps in enumerate(map_lists):
        maps = [np.asarray(m).squeeze() for m in maps]
        path = os.path.join(save_dir, f"average_seed{seed}_attn{i}.png")
        if plt is None:
            _save_raw(np.concatenate(maps, axis=1), path)
            continue
        n = len(maps)
        fig, axs = plt.subplots(ncols=n + 1, gridspec_kw=dict(
            width_ratios=[1] * n + [0.1]))
        fig.set_figheight(3)
        fig.set_figwidth(3 * n + 0.1)
        vmin = min(float(m.min()) for m in maps)
        vmax = max(float(m.max()) for m in maps)
        cmap = plt.get_cmap("OrRd")
        for tid, m in enumerate(maps):
            axs[tid].imshow(m, cmap=cmap, vmin=vmin, vmax=vmax)
            axs[tid].set_axis_off()
            if tokens_vis is not None:
                if tid == n - 1:
                    label = "other tokens"
                else:
                    label = " ".join(
                        tokens_vis[t - 1].removesuffix("</w>")
                        for t in np.asarray(obj_tokens[tid]).tolist()
                    )
                axs[tid].set_title(label, fontsize=8)
        import matplotlib as mpl

        norm = mpl.colors.Normalize(vmin=vmin, vmax=vmax)
        fig.colorbar(mpl.cm.ScalarMappable(cmap=cmap, norm=norm), cax=axs[-1])
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        fig.canvas.draw()
        w, h = fig.canvas.get_width_height()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        img = buf.reshape(h, w, 4)[..., :3].copy()
        plt.close("all")
    return img


def _save_raw(arr: np.ndarray, path: str):
    from PIL import Image

    a = np.asarray(arr, dtype=np.float32)
    a = (255 * (a - a.min()) / (a.ptp() + 1e-9)).astype(np.uint8)
    Image.fromarray(a).save(path)
