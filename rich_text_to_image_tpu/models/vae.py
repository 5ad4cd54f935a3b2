"""AutoencoderKL (SD VAE) in flax, NHWC.

Decoder is the gradient path for color guidance (the reference backprops the
masked-mean-RGB loss through ``vae.decode``, region_diffusion.py:151-168); we
wrap it in ``jax.checkpoint`` at the pipeline level so the VJP fits HBM
inside the scan.

Architecture parity: diffusers AutoencoderKL (vae config of
runwayml/stable-diffusion-v1-5 / SDXL): DownEncoderBlock2D×4 with asymmetric
(0,1) downsample padding, mid resnet-attn-resnet with single-head spatial
attention, UpDecoderBlock2D×4 with nearest-2x upsampling.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import VAEConfig


def _gn(groups, dtype, name, eps=1e-6):
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype, name=name)


def _conv(features, kernel=3, stride=1, pad=1, dtype=jnp.float32, name=None):
    padding = [(pad, pad), (pad, pad)] if isinstance(pad, int) else pad
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding=padding,
        dtype=dtype, name=name,
    )


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(self.groups, self.dtype, "norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = _gn(self.groups, self.dtype, "norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, kernel=1, pad=0, dtype=self.dtype,
                      name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (VAE mid block)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(self.groups, self.dtype, "group_norm")(x).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        s = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * (C**-0.5), axis=-1).astype(self.dtype)
        o = jnp.einsum("bqk,bkc->bqc", p, v)
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = _conv(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        for lvl, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnet(ch, cfg.norm_num_groups, self.dtype,
                              name=f"down_{lvl}_res_{j}")(x)
            if lvl != len(cfg.block_out_channels) - 1:
                # diffusers encoder downsample: asymmetric (0,1) pad, stride 2
                x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down_{lvl}_downsample",
                )(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnet(ch, cfg.norm_num_groups, self.dtype, name="mid_res_0")(x)
        x = VAEAttention(cfg.norm_num_groups, self.dtype, name="mid_attn")(x)
        x = VAEResnet(ch, cfg.norm_num_groups, self.dtype, name="mid_res_1")(x)
        x = _gn(cfg.norm_num_groups, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x)
        x = _conv(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(x)
        return x  # moments [B,h,w,2*latent]


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32
    # per-block rematerialization: bounds the VJP's live set to one block's
    # internals (block-boundary activations only are saved). A whole-decode
    # jax.checkpoint does NOT bound the peak — inside the region the
    # backward still differentiates the full decoder — so the fp32 color-
    # guidance gradient at SDXL's 1024² needs this to fit a 16 GB chip.
    # Param tree is unchanged (nn.remat preserves module names).
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        Res = nn.remat(VAEResnet) if self.remat_blocks else VAEResnet
        Attn = nn.remat(VAEAttention) if self.remat_blocks else VAEAttention
        rev = list(reversed(cfg.block_out_channels))
        x = _conv(rev[0], dtype=self.dtype, name="conv_in")(z)
        x = Res(rev[0], cfg.norm_num_groups, self.dtype, name="mid_res_0")(x)
        x = Attn(cfg.norm_num_groups, self.dtype, name="mid_attn")(x)
        x = Res(rev[0], cfg.norm_num_groups, self.dtype, name="mid_res_1")(x)
        for lvl, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = Res(ch, cfg.norm_num_groups, self.dtype,
                        name=f"up_{lvl}_res_{j}")(x)
            if lvl != len(rev) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
                x = _conv(ch, dtype=self.dtype, name=f"up_{lvl}_upsample")(x)
        x = _gn(cfg.norm_num_groups, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x)
        return _conv(cfg.out_channels, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32
    remat_blocks: bool = False  # see Decoder.remat_blocks

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype,
                               remat_blocks=self.remat_blocks)
        self.quant_conv = _conv(
            2 * self.cfg.latent_channels, kernel=1, pad=0, dtype=self.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = _conv(
            self.cfg.latent_channels, kernel=1, pad=0, dtype=self.dtype,
            name="post_quant_conv",
        )

    def encode_moments(self, x):
        """pixels [-1,1] NHWC → (mean, logvar) each [B,h,w,latent]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """pixels → *scaled* latent sample (or mode when rng is None)."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, dtype=mean.dtype
            )
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        """*Unscaled* latent → pixels in [-1, 1] (caller divides by the
        scaling factor first, matching diffusers' API split)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z / self.cfg.scaling_factor)
