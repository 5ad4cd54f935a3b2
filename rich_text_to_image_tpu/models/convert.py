"""HF checkpoint → flax param-tree conversion.

The reference pulls torch weights from the HF hub at runtime
(models/region_diffusion.py:26-37, models/region_diffusion_sdxl.py:105-127).
The TPU framework instead converts once: safetensors state dicts (from a
locally available SD-1.5 / SDXL / AnimeXL checkpoint directory) map into our
flax trees with NCHW→HWIO conv transposition and dense-kernel transposes.

Conversion is *target-driven*: we walk our own param tree (so every leaf
must be produced — missing sources raise), derive the HF tensor name for
each flax path by rule, and transform by leaf kind. ``strict`` reports
unconsumed source tensors.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Mapping

import jax.numpy as jnp
import numpy as np

from .config import CLIPTextConfig, UNetConfig, VAEConfig


# ------------------------------------------------------------------ plumbing
def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _to_jax(x, leaf_kind: str, dtype) -> jnp.ndarray:
    a = np.asarray(x)
    if leaf_kind == "conv_kernel":
        a = a.transpose(2, 3, 1, 0)  # OIHW → HWIO
    elif leaf_kind == "dense_kernel":
        a = a.transpose(1, 0)
    return jnp.asarray(a, dtype=dtype)


def _leaf_kind(path: tuple[str, ...], src_shape) -> str:
    if path[-1] == "kernel":
        return "conv_kernel" if len(src_shape) == 4 else "dense_kernel"
    return "direct"


def convert_by_rule(
    target_tree,
    source: Mapping[str, np.ndarray],
    rule: Callable[[tuple[str, ...]], str],
    dtype=jnp.float32,
    strict: bool = False,
):
    """Fill ``target_tree``-shaped params from ``source`` via ``rule``."""
    flat = _flatten(target_tree)
    out = {}
    used = set()
    for path, leaf in flat.items():
        name = rule(path)
        if name not in source:
            raise KeyError(
                f"converter: no source tensor {name!r} for param path {path}"
            )
        src = source[name]
        used.add(name)
        kind = _leaf_kind(path, np.shape(src))
        arr = _to_jax(src, kind, dtype)
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch at {path}: got {arr.shape}, want {leaf.shape} "
                f"(source {name})"
            )
        out[path] = arr
    if strict:
        unused = sorted(set(source) - used)
        if unused:
            raise ValueError(f"converter: {len(unused)} unused tensors: "
                             f"{unused[:8]}...")
    return _unflatten(out)


# ----------------------------------------------------------------- UNet rule
def _unet_rule(path: tuple[str, ...]) -> str:
    """flax path → diffusers UNet state-dict name."""
    parts = list(path[:-1])
    leaf = path[-1]

    def tr(p: str) -> str:
        p = re.sub(r"^(down_blocks|up_blocks)_(\d+)$", r"\1.\2", p)
        p = re.sub(r"^(resnets|attentions|transformer_blocks)_(\d+)$", r"\1.\2", p)
        return p

    parts = [tr(p) for p in parts]
    name = ".".join(parts)
    # structural renames
    name = name.replace(".downsample", ".downsamplers.0.conv")
    name = name.replace(".upsample", ".upsamplers.0.conv")
    name = name.replace(".to_out", ".to_out.0")
    name = name.replace(".ff.geglu", ".ff.net.0.proj")
    name = name.replace(".ff.out", ".ff.net.2")
    suffix = {
        "kernel": "weight",
        "bias": "bias",
        "scale": "weight",
        "embedding": "weight",
    }[leaf]
    return f"{name}.{suffix}"


def convert_unet(source, cfg: UNetConfig, target_tree, dtype=jnp.float32):
    return convert_by_rule(target_tree, source, _unet_rule, dtype)


# ------------------------------------------------------------------ VAE rule
def _vae_rule(path: tuple[str, ...]) -> str:
    parts = list(path[:-1])
    leaf = path[-1]
    name = ".".join(parts)
    # encoder/decoder internals
    name = re.sub(r"down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2", name)
    name = re.sub(r"down_(\d+)_downsample", r"down_blocks.\1.downsamplers.0.conv", name)
    name = re.sub(r"up_(\d+)_res_(\d+)", r"up_blocks.\1.resnets.\2", name)
    name = re.sub(r"up_(\d+)_upsample", r"up_blocks.\1.upsamplers.0.conv", name)
    name = re.sub(r"mid_res_(\d+)", r"mid_block.resnets.\1", name)
    name = name.replace("mid_attn", "mid_block.attentions.0")
    # VAE attention out proj is to_out.0 in diffusers
    name = re.sub(r"(mid_block\.attentions\.0)\.to_out$", r"\1.to_out.0", name)
    suffix = {"kernel": "weight", "bias": "bias", "scale": "weight"}[leaf]
    return f"{name}.{suffix}"


def convert_vae(source, cfg: VAEConfig, target_tree, dtype=jnp.float32):
    return convert_by_rule(target_tree, source, _vae_rule, dtype)


# ----------------------------------------------------------------- CLIP rule
def _clip_text_rule(path: tuple[str, ...]) -> str:
    parts = list(path[:-1])
    leaf = path[-1]
    name = ".".join(parts)
    name = re.sub(r"layers_(\d+)\.self_attn", r"encoder.layers.\1.self_attn", name)
    name = re.sub(r"layers_(\d+)\.layer_norm", r"encoder.layers.\1.layer_norm", name)
    name = re.sub(r"layers_(\d+)\.fc(\d)", r"encoder.layers.\1.mlp.fc\2", name)
    if name == "token_embedding":
        return "text_model.embeddings.token_embedding.weight"
    if name == "final_layer_norm":
        name = "final_layer_norm"
    if name == "text_projection":
        # lives outside text_model in the WithProjection wrapper
        return "text_projection.weight"
    suffix = {"kernel": "weight", "bias": "bias", "scale": "weight",
              "embedding": "weight"}[leaf]
    return f"text_model.{name}.{suffix}"


def convert_clip_text(source, cfg: CLIPTextConfig, target_tree, dtype=jnp.float32):
    source = dict(source)
    # our position_embedding is a bare param, not an Embed module
    key = "text_model.embeddings.position_embedding.weight"
    if key in source:
        source["text_model.position_embedding"] = source[key]
    flat = _flatten(target_tree)
    out = {}
    for path, leaf in flat.items():
        name = (
            "text_model.position_embedding"
            if path[-1] == "position_embedding"
            else _clip_text_rule(path)
        )
        src = source[name]
        kind = _leaf_kind(path, np.shape(src))
        if path[-1] == "position_embedding":
            kind = "direct"
        arr = _to_jax(src, kind, dtype)
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {path}: {arr.shape} vs {leaf.shape}")
        out[path] = arr
    return _unflatten(out)


# ---------------------------------------------------------- CLIP vision rule
def convert_clip_vision(source, target_tree, dtype=jnp.float32):
    """HF CLIPVisionModelWithProjection state dict → our flax tree."""
    src = dict(source)

    def rule(path: tuple[str, ...]) -> str:
        parts = list(path[:-1])
        leaf = path[-1]
        name = ".".join(parts)
        name = re.sub(r"layers_(\d+)\.self_attn",
                      r"encoder.layers.\1.self_attn", name)
        name = re.sub(r"layers_(\d+)\.layer_norm",
                      r"encoder.layers.\1.layer_norm", name)
        name = re.sub(r"layers_(\d+)\.fc(\d)", r"encoder.layers.\1.mlp.fc\2",
                      name)
        if name == "patch_embedding":
            return "vision_model.embeddings.patch_embedding.weight"
        if name == "visual_projection":
            return "visual_projection.weight"
        suffix = {"kernel": "weight", "bias": "bias", "scale": "weight"}[leaf]
        return f"vision_model.{name}.{suffix}"

    # bare params (not module leaves)
    src["vision_model.class_embedding"] = src[
        "vision_model.embeddings.class_embedding"
    ]
    src["vision_model.position_embedding"] = src[
        "vision_model.embeddings.position_embedding.weight"
    ]
    flat = _flatten(target_tree)
    out = {}
    for path, leaf in flat.items():
        if path[-1] in ("class_embedding", "position_embedding"):
            name = f"vision_model.{path[-1]}"
            kind = "direct"
        else:
            name = rule(path)
            kind = _leaf_kind(path, np.shape(src[name]))
        arr = _to_jax(src[name], kind, dtype)
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {path}: {arr.shape} vs "
                             f"{leaf.shape}")
        out[path] = arr
    return _unflatten(out)


# ----------------------------------------------------------------- UNet LoRA
_LORA_PROJ = {"to_q": "to_q_lora", "to_k": "to_k_lora",
              "to_v": "to_v_lora", "to_out": "to_out_lora"}


def apply_lora_unet(unet_params, lora_sd: Mapping[str, np.ndarray],
                    scale: float = 1.0):
    """Merge a diffusers-format UNet LoRA state dict into converted params.

    Reference semantics (models/attention_processor.py:548-576): every
    attention projection computes ``proj(x) + scale * up(down(x))`` with
    rank-r ``down``/``up`` linears, stored under
    ``<attn module>.processor.<proj>_lora.{down,up}.weight`` (diffusers
    0.18 attn-procs layout; a leading ``unet.`` prefix is tolerated).
    On TPU the low-rank pair is merged into the projection weight at load
    time — ``W' = W + scale · up @ down`` — which is mathematically
    identical for inference and keeps the hot attention path free of extra
    matmuls (the reference pays two additional GEMMs per projection per
    call). Returns a NEW params pytree; raises if any LoRA tensor found no
    matching projection (catches key-mapping drift).
    """
    lora_sd = {k.removeprefix("unet."): np.asarray(v)
               for k, v in lora_sd.items()}
    flat = _flatten(unet_params)
    used: set[str] = set()
    out = {}
    n_merged = 0
    for path, leaf in flat.items():
        out[path] = leaf
        if path[-1] != "kernel" or len(path) < 2:
            continue
        proj = path[-2]
        if proj not in _LORA_PROJ:
            continue
        # strip the flax "params" root — diffusers names never carry it
        # (round-4 bug: the prefixed lookup matched no real checkpoint key)
        base = _unet_rule(path[1:] if path[0] == "params" else path)
        mod = base.rsplit(f".{proj}.", 1)[0]
        down_k = f"{mod}.processor.{_LORA_PROJ[proj]}.down.weight"
        up_k = f"{mod}.processor.{_LORA_PROJ[proj]}.up.weight"
        if down_k not in lora_sd and up_k not in lora_sd:
            continue
        if down_k not in lora_sd or up_k not in lora_sd:
            raise ValueError(
                f"LoRA: half-present pair at {mod}.processor."
                f"{_LORA_PROJ[proj]} (have "
                f"{'down' if down_k in lora_sd else 'up'} only — "
                "truncated/corrupt checkpoint?)")
        down = lora_sd[down_k]  # [r, in]  (torch [out,in] convention)
        up = lora_sd[up_k]      # [out, r]
        used.update((down_k, up_k))
        delta = (up @ down).T  # → flax dense kernel layout [in, out]
        if delta.shape != leaf.shape:
            raise ValueError(
                f"LoRA shape mismatch at {path}: delta {delta.shape} vs "
                f"kernel {leaf.shape} (source {down_k})")
        out[path] = (leaf + jnp.asarray(scale * delta, leaf.dtype)
                     ).astype(leaf.dtype)
        n_merged += 1
    unused = sorted(k for k in lora_sd if k not in used)
    if unused:
        raise ValueError(
            f"LoRA: {len(unused)} tensors matched no UNet projection "
            f"(key-mapping drift?): {unused[:6]}...")
    if n_merged == 0:
        raise ValueError("LoRA: state dict contained no LoRA tensors")
    return _unflatten(out)


# ---------------------------------------------------------------- text LoRA
def apply_lora_text(text_params, lora_sd: Mapping[str, np.ndarray],
                    scale: float = 1.0):
    """Merge diffusers-format CLIP text-encoder LoRA into converted params.

    Completes the ``LoraLoaderMixin`` contract the reference inherits
    (reference models/region_diffusion_sdxl.py:10,:56): ``load_lora_weights``
    also patches the text encoder's attention projections with rank-r
    pairs, serialized as
    ``text_encoder.text_model.encoder.layers.<i>.self_attn.<proj>_proj
    .lora_linear_layer.{down,up}.weight`` (the ``.lora.`` infix of older
    diffusers is tolerated). As with :func:`apply_lora_unet`, the pair is
    merged at load time — ``W' = W + scale · up @ down`` — identical for
    inference, zero runtime cost. Returns a NEW params pytree; raises on
    unmatched LoRA tensors or when none are found.
    """
    lora_sd = {k.removeprefix("text_encoder."): np.asarray(v)
               for k, v in lora_sd.items()}
    flat = _flatten(text_params)
    used: set[str] = set()
    out = {}
    n_merged = 0
    for path, leaf in flat.items():
        out[path] = leaf
        if path[-1] != "kernel" or len(path) < 2 or not path[-2].endswith(
                "_proj"):
            continue
        mod = _clip_text_rule(
            path[1:] if path[0] == "params" else path
        ).removesuffix(".weight")
        down = up = None
        for infix in ("lora_linear_layer", "lora"):
            dk, uk = (f"{mod}.{infix}.down.weight", f"{mod}.{infix}.up.weight")
            if dk in lora_sd or uk in lora_sd:
                if dk not in lora_sd or uk not in lora_sd:
                    raise ValueError(
                        f"text LoRA: half-present pair at {mod}.{infix} "
                        f"(have {'down' if dk in lora_sd else 'up'} only — "
                        "truncated/corrupt checkpoint?)")
                down, up = lora_sd[dk], lora_sd[uk]
                used.update((dk, uk))
                break
        if down is None:
            continue
        delta = (up @ down).T  # torch [out,in] pair → flax kernel [in, out]
        if delta.shape != leaf.shape:
            raise ValueError(
                f"text LoRA shape mismatch at {path}: delta {delta.shape} "
                f"vs kernel {leaf.shape}")
        out[path] = (leaf + jnp.asarray(scale * delta, leaf.dtype)
                     ).astype(leaf.dtype)
        n_merged += 1
    unused = sorted(k for k in lora_sd if k not in used)
    if unused:
        raise ValueError(
            f"text LoRA: {len(unused)} tensors matched no projection "
            f"(key-mapping drift?): {unused[:6]}...")
    if n_merged == 0:
        raise ValueError("text LoRA: state dict contained no LoRA tensors")
    return _unflatten(out)


# ------------------------------------------------------------- file loading
def load_safetensors_dir(path: str) -> dict[str, np.ndarray]:
    """Load every *.safetensors under ``path`` into one numpy state dict."""
    from safetensors import safe_open

    sd: dict[str, np.ndarray] = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(path, fn), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
    if not sd:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return sd
