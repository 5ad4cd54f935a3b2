"""Checkpoint save/load via orbax.

The reference has no checkpoint subsystem: weights are re-downloaded from
the HF hub on every process start (SURVEY §5 "Checkpoint / resume"). Here the
one-time HF→flax conversion result persists as an orbax checkpoint, so
subsequent pipeline starts restore in seconds with zero torch involvement
and optional sharding-aware restore onto a mesh.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_pipeline(path: str, pipeline) -> None:
    """Persist a RegionDiffusion(XL) pipeline's param trees."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    trees: dict[str, Any] = {
        "unet": pipeline.unet_params,
        "vae": pipeline.vae_params,
        "text": pipeline.text_params,
    }
    if hasattr(pipeline, "text2_params"):
        trees["text2"] = pipeline.text2_params
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), trees)


def load_params(path: str, shardings=None) -> dict[str, Any]:
    """Restore param trees; optional NamedSharding tree for mesh restore."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if shardings is None:
            return ckptr.restore(os.path.join(path, "params"))
        return ckptr.restore(
            os.path.join(path, "params"),
            jax.tree.map(lambda s: ocp.utils.to_shape_dtype_struct, shardings),
        )
