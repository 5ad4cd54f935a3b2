"""Fast host-side parameter initialization.

``flax.Module.init`` traces one giant RNG program (hundreds of threefry
calls); through this environment's remote-compile TPU relay that program
takes minutes to compile (and is wasteful anywhere). For random-weight
pipelines (tests, benchmarks, smoke runs) we instead eval_shape the init and
fill leaves with numpy on the host — milliseconds of compile, one
device_put. Values use fan-in-scaled normals for kernels and ones/zeros for
norm scales/biases: statistically sane, not checkpoint-compatible (real
checkpoints come from models/convert.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fast_init(module, rng_seed: int, *example_args, dtype=None, **example_kw):
    """Shape-driven host init of ``module.init(...)``'s param tree."""
    tree = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *example_args, **example_kw)
    )
    rng = np.random.default_rng(rng_seed)
    leaves, treedef = jax.tree.flatten_with_path(tree)

    out = []
    for path, leaf in leaves:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape = leaf.shape
        ldtype = dtype or leaf.dtype
        if name in ("scale",):
            arr = np.ones(shape, np.float32)
        elif name in ("bias",):
            arr = np.zeros(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else max(
                shape[0], 1
            )
            std = np.float32(1.0 / np.sqrt(max(fan_in, 1)))
            arr = rng.standard_normal(shape, dtype=np.float32) * std
        out.append(jnp.asarray(arr, dtype=ldtype))
    return jax.tree.unflatten(treedef, out)
