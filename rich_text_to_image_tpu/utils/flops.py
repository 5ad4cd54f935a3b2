"""Model-FLOPs accounting from XLA's own cost model (no execution).

Used by bench.py (MFU field per record) and scripts/profile_sdxl.py (the
per-phase roofline). FLOPs come from ``lower().compile().cost_analysis()``
of standalone programs with the production shapes — authoritative for the
matmul/conv-dominated phases, no hand-derived topology walk to drift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Per-chip bf16 peak (dense matmul) for MFU normalization; keyed on
# device_kind substrings. The 197 default matches the measured MXU ceiling
# on this environment's chip (docs/STATUS.md: XLA conv3x3 at ~189 TF/s).
PEAK_BF16 = {
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v4": 275e12, "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12,
}


def peak_flops():
    kind = jax.devices()[0].device_kind
    for key, val in PEAK_BF16.items():
        if key in kind.lower():
            return val, kind
    return 197e12, kind


def xla_flops(fn, *abstract_args):
    """FLOPs of one jitted call, from XLA's cost model (compile only)."""
    compiled = jax.jit(fn).lower(*abstract_args).compile()
    return float(compiled.cost_analysis()["flops"])


def _struct_tree(params):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
    )


def unet_fwd_flops(model, batch: int, xl: bool) -> float:
    """One UNet CFG-row forward at the model's native latent resolution."""
    ucfg = model.unet_cfg
    h = w = ucfg.sample_size
    dt = model.unet.dtype
    pstruct = _struct_tree(model.unet_params)
    x = jax.ShapeDtypeStruct((batch, h, w, ucfg.in_channels), dt)
    t = jax.ShapeDtypeStruct((), jnp.float32)
    e = jax.ShapeDtypeStruct((batch, 77, ucfg.cross_attention_dim), dt)
    if xl:
        # pooled-embed width from the actual add_embedding params (the
        # config formula doesn't hold for the tiny test configs)
        add_in = model.unet_params["params"]["add_embedding"][
            "linear_1"]["kernel"].shape[0]
        pool_dim = add_in - 6 * ucfg.addition_time_embed_dim
        added = {
            "text_embeds": jax.ShapeDtypeStruct((batch, pool_dim), dt),
            "time_ids": jax.ShapeDtypeStruct((batch, 6), jnp.float32),
        }
        fn = lambda p, x, t, e, a: model.unet.apply(p, x, t, e, a)[0]
        return xla_flops(fn, pstruct, x, t, e, added)
    fn = lambda p, x, t, e: model.unet.apply(p, x, t, e)[0]
    return xla_flops(fn, pstruct, x, t, e)


def unet_encode_flops(model, batch: int, xl: bool) -> float:
    """FLOPs of the down-path only (conv_in + down blocks) — what encoder
    reuse skips on non-key steps. Executed FLOPs of a reuse-stride run:
    key_steps × fwd + (steps − key_steps) × (fwd − encode)."""
    ucfg = model.unet_cfg
    h = w = ucfg.sample_size
    dt = model.unet.dtype
    pstruct = _struct_tree(model.unet_params)
    x = jax.ShapeDtypeStruct((batch, h, w, ucfg.in_channels), dt)
    e = jax.ShapeDtypeStruct((batch, 77, ucfg.cross_attention_dim), dt)
    emb_dim = model.unet_params["params"]["time_embedding"][
        "linear_2"]["kernel"].shape[1]
    emb = jax.ShapeDtypeStruct((batch, emb_dim), dt)
    fn = lambda p, x, emb, e: model.unet.apply(
        p, x, emb, e, method=model.unet.encode)
    return xla_flops(fn, pstruct, x, emb, e)


def vae_decode_flops(model, batch: int = 1) -> float:
    ucfg = model.unet_cfg
    h = w = ucfg.sample_size
    z = jax.ShapeDtypeStruct((batch, h, w, 4), jnp.float32)
    vstruct = _struct_tree(model.vae_params)
    fn = lambda p, z: model.vae.apply(p, z, method=model.vae.decode)
    return xla_flops(fn, vstruct, z)


def guidance_grad_flops(model, batch: int = 1) -> float:
    """The color-guidance VAE gradient program (fwd + bwd through decode)."""
    ucfg = model.unet_cfg
    h = w = ucfg.sample_size
    px = h * model.vae_scale_factor
    z = jax.ShapeDtypeStruct((batch, h, w, 4), jnp.float32)
    m = jax.ShapeDtypeStruct((1, px, px), jnp.float32)
    tgt = jax.ShapeDtypeStruct((1, 3), jnp.float32)
    vstruct = _struct_tree(model.vae_params)

    def loss(p, z, m, tgt):
        imgs = model.vae.apply(
            p, z.astype(jnp.float32) / model.vae_cfg.scaling_factor,
            method=model.vae.decode,
        )
        imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
        num = jnp.einsum("bhwc,nhw->nc", imgs, m)
        den = m.sum(axis=(1, 2))[:, None] + 1e-12
        return (jnp.mean((num / den - tgt) ** 2, axis=1) * 100.0).sum()

    fn = lambda p, z, m, tgt: jax.grad(loss, argnums=1)(p, z, m, tgt)
    return xla_flops(fn, vstruct, z, m, tgt)
