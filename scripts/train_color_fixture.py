"""Train the tiny color fixture: a VAE+UNet pair where color steering is real.

VERDICT r3 #1: every quality gate in the repo so far ran on *random* weights,
where decode(latent) has no latent<->pixel color correlation, so exact-vs-
approximate guidance comparisons (e.g. --guidance_downsample) were
uninterpretable. This script trains, on synthetic colored-square images:

  1. the TINY_VAE (reconstruction + tiny KL) so decode is color-faithful, and
  2. the TINY_UNET (epsilon-prediction DSM, prompt-conditioned through the
     frozen random tiny text encoder + byte-level tokenizer) on the trained
     VAE's latents,

then persists both as an orbax pipeline checkpoint (tests/fixtures/
color_fixture) plus a metrics JSON. Downstream: tests/test_color_fixture.py
and scripts/eval_color_fixture.py re-run the color-benchmark protocol
(reference evaluation/benchmark_color.py:283-331) against this fixture so
"ours vs plain" and "exact vs approximated guidance" become measurable.

CPU by default (tiny shapes; never claims the TPU); pass --tpu to train on
the chip instead (~10x faster than this image's 1-core host).

Storage: float16 .npz of the *trained* trees only (UNet + VAE); the frozen
random text encoder and tokenizer are reproducible from random_init(seed=0),
so they are not stored — see evaluation/fixtures.load_color_fixture.
"""

import json
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # never claim the chip
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "--tpu" not in sys.argv:
    # the axon plugin overrides jax_platforms at registration; drop its
    # factory so CPU mode really is CPU (tests/conftest.py:26-35)
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rich_text_to_image_tpu.models import config as cfgs
from rich_text_to_image_tpu.pipelines.region_sd import RegionDiffusion
from rich_text_to_image_tpu.schedulers.common import make_alphas_cumprod
from rich_text_to_image_tpu.utils.colors import COLORS

FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "color_fixture"
)


def _flatten(tree):
    flat = {}
    for path, leaf in jax.tree.flatten_with_path(tree)[0]:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        flat[key] = np.asarray(leaf, np.float16)
    return flat


def make_batch(rng: np.random.RandomState, n: int, px: int):
    """Synthetic data: solid background + one colored axis-aligned square.

    Returns images [n,px,px,3] in [-1,1], fg color names (for the prompt),
    fg RGB in [0,1].
    """
    names = list(COLORS)
    imgs = np.empty((n, px, px, 3), np.float32)
    fg_names = []
    fg_rgb = np.empty((n, 3), np.float32)
    for i in range(n):
        name = names[rng.randint(len(names))]
        fg = np.asarray(COLORS[name], np.float32) / 255.0
        # jitter the named color a little so the manifold isn't 11 points
        fg = np.clip(fg + rng.uniform(-0.08, 0.08, 3).astype(np.float32), 0, 1)
        bg = rng.uniform(0, 1, 3).astype(np.float32)
        img = np.broadcast_to(bg, (px, px, 3)).copy()
        side = rng.randint(px // 2, px - 2)
        y = rng.randint(0, px - side)
        x = rng.randint(0, px - side)
        img[y:y + side, x:x + side] = fg
        imgs[i] = img * 2.0 - 1.0
        fg_names.append(name)
        fg_rgb[i] = fg
    return imgs, fg_names, fg_rgb


def main(vae_steps=1500, unet_steps=4000, batch=64, out_dir=FIXTURE_DIR):
    t_start = time.time()
    model = RegionDiffusion.random_init(
        seed=0, unet_cfg=cfgs.FIXTURE_UNET, vae_cfg=cfgs.TINY_VAE,
        text_cfg=cfgs.TINY_TEXT, dtype=jnp.float32,
    )
    px = model.unet_cfg.sample_size * model.vae_scale_factor
    vae, unet = model.vae, model.unet
    rng_np = np.random.RandomState(0)

    # ------------------------------------------------------------- VAE stage
    def vae_loss(vp, imgs, rng):
        mean, logvar = vae.apply(vp, imgs, method=vae.encode_moments)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, dtype=mean.dtype)
        rec = vae.apply(vp, z, method=vae.decode)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
        return jnp.mean((rec - imgs) ** 2) + 1e-4 * kl

    tx = optax.adam(2e-3)

    @jax.jit
    def vae_step(vp, opt, imgs, rng):
        loss, g = jax.value_and_grad(vae_loss)(vp, imgs, rng)
        up, opt = tx.update(g, opt, vp)
        return optax.apply_updates(vp, up), opt, loss

    vp, opt = model.vae_params, tx.init(model.vae_params)
    key = jax.random.PRNGKey(0)
    for i in range(vae_steps):
        imgs, _, _ = make_batch(rng_np, batch, px)
        key, k = jax.random.split(key)
        vp, opt, loss = vae_step(vp, opt, jnp.asarray(imgs), k)
        if i % 300 == 0 or i == vae_steps - 1:
            print(f"[vae {i}/{vae_steps}] recon+kl={float(loss):.5f}",
                  flush=True)
    model.vae_params = vp

    # color faithfulness probe: solid-color images round-trip
    probe = np.stack([
        np.full((px, px, 3), c, np.float32) * 2 - 1
        for c in np.asarray(list(COLORS.values()), np.float32) / 255.0
    ])
    z = vae.apply(vp, jnp.asarray(probe), method=vae.encode)
    rt = vae.apply(vp, z / model.vae_cfg.scaling_factor, method=vae.decode)
    color_err = float(jnp.mean(jnp.abs(rt - probe))) / 2.0  # in [0,1] units
    print(f"[vae] solid-color round-trip mean|dRGB| = {color_err:.4f}")

    # ------------------------------------------------------------ UNet stage
    # Frozen random text encoder: precompute context embeddings for the
    # conditioning prompt bank ('' uncond + "a <color> square").
    prompts = [""] + [f"a {n} square" for n in COLORS]
    ids = jnp.asarray(model.tokenizer(prompts))
    ehs_bank = model.text_encoder.apply(model.text_params, ids)[
        "last_hidden_state"]
    name_to_idx = {n: i + 1 for i, n in enumerate(COLORS)}

    alphas = jnp.asarray(make_alphas_cumprod(), jnp.float32)

    def unet_loss(up, lat, ehs, rng):
        rt_, rn = jax.random.split(rng)
        t = jax.random.randint(rt_, (lat.shape[0],), 0, 1000)
        noise = jax.random.normal(rn, lat.shape, dtype=lat.dtype)
        a = alphas[t][:, None, None, None]
        x_t = jnp.sqrt(a) * lat + jnp.sqrt(1.0 - a) * noise
        eps, _ = unet.apply(up, x_t, t, ehs)
        return jnp.mean((eps - noise) ** 2)

    txu = optax.adam(1e-3)

    @jax.jit
    def unet_step(up, opt, imgs, pidx, rng):
        lat = vae.apply(vp, imgs, method=vae.encode)  # scaled mode latents
        ehs = ehs_bank[pidx]
        loss, g = jax.value_and_grad(unet_loss)(up, lat, ehs, rng)
        upd, opt = txu.update(g, opt, up)
        return optax.apply_updates(up, upd), opt, loss

    up, optu = model.unet_params, txu.init(model.unet_params)
    for i in range(unet_steps):
        imgs, names, _ = make_batch(rng_np, batch, px)
        # 20% unconditional rows for CFG
        pidx = np.asarray(
            [0 if rng_np.rand() < 0.2 else name_to_idx[n] for n in names],
            np.int32)
        key, k = jax.random.split(key)
        up, optu, loss = unet_step(up, optu, jnp.asarray(imgs), pidx, k)
        if i % 500 == 0 or i == unet_steps - 1:
            print(f"[unet {i}/{unet_steps}] dsm={float(loss):.5f}", flush=True)
    model.unet_params = up

    # ------------------------------------------------------------- persist
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(os.path.join(out_dir, "unet_params.npz"),
                        **_flatten(up))
    np.savez_compressed(os.path.join(out_dir, "vae_params.npz"),
                        **_flatten(vp))
    meta = {
        "px": px,
        "vae_steps": vae_steps,
        "unet_steps": unet_steps,
        "batch": batch,
        "vae_solid_color_roundtrip_mean_abs_drgb": round(color_err, 5),
        "final_dsm_loss": round(float(loss), 5),
        "prompt_bank": prompts,
        "configs": {"unet": "FIXTURE_UNET", "vae": "TINY_VAE",
                    "text": "TINY_TEXT", "tokenizer": "byte_level",
                    "random_init_seed": 0, "dtype": "float32"},
        "train_seconds": round(time.time() - t_start, 1),
    }
    with open(os.path.join(out_dir, "fixture_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--tpu"]
    kw = {}
    if len(argv) > 0:
        kw["vae_steps"] = int(argv[0])
    if len(argv) > 1:
        kw["unet_steps"] = int(argv[1])
    main(**kw)
