"""rich_text_to_image_tpu — a TPU-native rich-text-to-image framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
songweige/rich-text-to-image (ICCV 2023, arXiv 2304.06720): expressive
text-to-image generation where rich-text attributes (font color, footnotes,
font family, font size) become generation controls for Stable Diffusion 1.5
and SDXL class models.

Design stance (vs. the PyTorch-hook reference):
  * The UNet apply function *returns* (eps, aux) where aux carries attention
    maps; controls (injected attention, font-size reweighting) go in as a
    pytree. No hooks, no module mutation.
  * The denoising loop is a jit-compiled ``lax.scan``; per-step branching is
    ``lax.cond`` / masked selects on traced step indices.
  * Region fan-out is a batched UNet forward (and optionally sharded over a
    ``jax.sharding.Mesh``), not a Python loop of forwards.
  * Self-attention injection stores the reference pass's (Q, K) per layer and
    recomputes attention with the region pass's V inside a Pallas flash
    kernel — mathematically identical to the reference's stored-probs
    injection (models/region_diffusion.py:356-395) at a fraction of the HBM.
"""

__version__ = "0.1.0"
