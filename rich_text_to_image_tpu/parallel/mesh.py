"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY §2: no distributed backend at
all), so parallelism here is *introduced*, not ported:

  * ``dp`` — data parallelism: benchmark work items (prompts × colors ×
    seeds are embarrassingly parallel, evaluation/benchmark_color.py) and
    the rich pass's region batch.
  * ``tp`` — tensor parallelism: attention/MLP/conv channel dims sharded;
    XLA GSPMD inserts the collectives over ICI.

``shard_params`` annotates a flax param tree with NamedShardings by rule:
kernels whose output dim divides the tp axis shard there; everything else
replicates. Activations follow via GSPMD propagation from the batch
constraint.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("dp", "tp"),
              tp: int | None = None, dcn: int | None = None) -> Mesh:
    """Build a (dp, tp) — or (dcn, dp, tp) — mesh over the available devices.

    ``tp`` defaults to the largest power of two ≤ 4 dividing the device
    count (v5e-4: tp=4 on one host; tp=1 falls back to pure DP).

    ``dcn > 1`` adds an OUTERMOST data-parallel axis for multi-host
    deployments: params replicate across it (param_spec never shards on
    dcn) and only the embarrassingly-parallel batch axis (benchmark work
    items, text_to_images requests) crosses it, so the sole inter-host
    traffic is the initial param broadcast — no per-step collective rides
    DCN. On real multi-host topologies build the device array with
    ``mesh_utils.create_hybrid_device_mesh((dp, tp), (dcn, 1), ...)`` so
    the dcn axis lands on host boundaries; single-process (tests, the
    virtual CPU platform) falls back to a contiguous split, which is
    collective-equivalent.
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n_devices and n < n_devices:
        raise ValueError(
            f"mesh wants {n_devices} devices but only {n} visible "
            f"({jax.default_backend()}); for CPU simulation set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
        )
    if tp is not None and n % tp:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n % cand == 0:
                tp = cand
                break
    if dcn and dcn > 1:
        assert n % (dcn * tp) == 0, (n, dcn, tp)
        shape = (dcn, n // (dcn * tp), tp)
        names = ("dcn",) + tuple(axis_names)
        try:  # real multi-host: put dcn on the host boundary
            arr = mesh_utils.create_hybrid_device_mesh(
                shape[1:], (dcn, 1), devices=devices)
        except Exception:  # single-process fallback (CPU mesh, tests)
            arr = mesh_utils.create_device_mesh(shape, devices=devices)
        return Mesh(arr.reshape(shape), names)
    dp = n // tp
    arr = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    return Mesh(arr, axis_names)


def mesh_from_spec(spec: str | None) -> Mesh | None:
    """Parse the user-facing ``--mesh`` flag into a :class:`Mesh`.

    Grammar (axis sizes, innermost last — matching :func:`make_mesh`):

    * ``"auto"`` — all visible devices, tp picked by :func:`make_mesh`;
    * ``"N"`` — first N devices, tp picked automatically;
    * ``"dp,tp"`` — e.g. ``"2,4"`` = 2-way batch DP × 4-way tensor parallel;
    * ``"dcn,dp,tp"`` — adds the outermost multi-host data axis.

    ``x`` is accepted as a separator too (``"2x4"``). Empty/None → no mesh
    (single-device, the reference's execution model). This is the single
    entry point the CLI sampler and both benchmark drivers share, so the
    product's mesh surface stays one grammar.
    """
    if not spec:
        return None
    if str(spec).strip().lower() == "auto":
        return make_mesh()
    parts = [int(x) for x in str(spec).replace("x", ",").split(",")]
    if any(p < 1 for p in parts):
        raise ValueError(f"--mesh axis sizes must be >= 1: {spec!r}")
    if len(parts) == 1:
        return make_mesh(parts[0])
    if len(parts) == 2:
        dp, tp = parts
        return make_mesh(dp * tp, tp=tp)
    if len(parts) == 3:
        dcn, dp, tp = parts
        return make_mesh(dcn * dp * tp, tp=tp, dcn=dcn)
    raise ValueError(f"--mesh wants 'auto', N, dp,tp or dcn,dp,tp: {spec!r}")


def apply_mesh_arg(model, spec: str | None):
    """Place ``model`` on the mesh described by a ``--mesh`` flag value.

    No-op for empty specs so drivers can call it unconditionally."""
    mesh = mesh_from_spec(spec)
    if mesh is not None:
        model.use_mesh(mesh)
    return model


def param_spec(path_leaf_shape, mesh: Mesh, tp_axis: str = "tp"):
    """PartitionSpec for one param leaf: shard the widest weight dim on tp."""
    shape = path_leaf_shape
    tp_size = mesh.shape[tp_axis]
    if len(shape) >= 2 and shape[-1] % tp_size == 0 and shape[-1] >= tp_size * 8:
        return P(*([None] * (len(shape) - 1)), tp_axis)
    return P()


def shard_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """NamedSharding tree for a flax param tree (rule of param_spec)."""
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, param_spec(np.shape(leaf), mesh, tp_axis)),
        params,
    )


def batch_spec(mesh: Mesh, dp_axis: str = "dp") -> P:
    """Batch axis spec: ("dcn", dp) on a multi-host mesh, else (dp,)."""
    if "dcn" in mesh.axis_names:
        return P(("dcn", dp_axis))
    return P(dp_axis)
