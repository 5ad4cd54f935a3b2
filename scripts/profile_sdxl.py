"""Per-phase roofline of the SDXL rich-text e2e flow on the real chip.

Times each phase of the bench workload (injection 0.2/0.3, 50 steps,
1024²) separately and pairs it with XLA-cost-model FLOPs so every phase
gets an achieved-TFLOP/s and MFU number (VERDICT r2 item 3: publish the
roofline before optimizing). Also times the standalone color-guidance VAE
gradient (fp32 and bf16) — the color-bench bottleneck — though the bench
workload itself has no color spans.

Usage: python scripts/profile_sdxl.py [steps]   (REAL TPU, ~15-25 min cold)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(steps=50, standalone_only=False):
    jax.config.update("jax_compilation_cache_dir", "/tmp/rtxi_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rich_text_to_image_tpu.pipelines.region_sdxl import RegionDiffusionXL
    from rich_text_to_image_tpu.utils.flops import (
        guidance_grad_flops, peak_flops, unet_fwd_flops, vae_decode_flops,
    )
    from rich_text_to_image_tpu.utils.token_maps import get_token_maps
    from rich_text_to_image_tpu.utils.tracing import phase, phase_report

    model = RegionDiffusionXL.random_init(seed=0)
    h = model.unet_cfg.sample_size
    px = h * model.vae_scale_factor
    base = "a close-up photo of a cat riding a scooter"
    regions = ["a cat wearing sunglasses", base]

    def one_pass(report=False):
        with phase("plain_pass+decode"):
            img, agg = model.produce_attn_maps(
                [base], "", height=px, width=px,
                num_inference_steps=steps, guidance_scale=5.0, seed=6,
            )
        with phase("token_maps"):
            ids = [np.asarray([2, 3], np.int32)]
            m = get_token_maps(agg, ids, (h, h), 6, num_segments=9,
                               segment_threshold=0.55)
        model.masks = [m[0], m[-1]]
        with phase("rich_pass+decode"):
            model.prompt_to_img(
                regions, "", height=px, width=px,
                num_inference_steps=steps, guidance_scale=5.0, seed=6,
                inject_selfattn=0.2, inject_background=0.3,
            )
        if report:
            peak, kind = peak_flops()
            # phase FLOPs from the cost model (programs already compiled);
            # rich accounts for ref_skip: the B=4+B=R split runs only
            # through the refer trajectory's last use (inject 0.2/bg 0.3),
            # merged B=R+2 after (region_sdxl.py)
            f2 = unet_fwd_flops(model, 2, xl=True)
            f4 = unet_fwd_flops(model, 4, xl=True)
            fdec = vae_decode_flops(model)
            n_inject = sum(
                1 for i in range(steps)
                if 999 * (1 - i / (steps - 1)) > (1 - 0.2) * 1000)
            ref_steps = min(max(int(0.3 * steps), n_inject - 1) + 1, steps)
            fl = {
                "plain_pass+decode": steps * f2 + fdec,
                "token_maps": None,  # bandwidth/host-bound, not FLOP-bound
                "rich_pass+decode": (ref_steps * (f4 + f2)
                                     + (steps - ref_steps) * f4 + fdec),
            }
            rep = phase_report()
            total = sum(rep.values())
            for k, v in rep.items():
                rec = {"phase": k, "s": round(v, 3),
                       "pct": round(100 * v / total, 1)}
                if fl.get(k):
                    rec["model_tflops"] = round(fl[k] / 1e12, 1)
                    rec["achieved_tflops_s"] = round(fl[k] / v / 1e12, 1)
                    rec["mfu"] = round(fl[k] / v / peak, 3)
                print(json.dumps(rec), flush=True)
            print(json.dumps({
                "phase": "TOTAL", "s": round(total, 3),
                "img_per_min": round(60 / total, 2), "chip": kind,
                "peak_tflops_s": round(peak / 1e12, 0),
            }), flush=True)

    if not standalone_only:
        one_pass()  # warmup/compile
        phase_report()  # drop warmup numbers
        one_pass(report=True)

    # ---- standalone: rich 6-row step (the hot program, isolated)
    from rich_text_to_image_tpu.utils.flops import peak_flops as _pf
    peak, _ = _pf()
    rng = jax.random.PRNGKey(0)
    dt = model.unet.dtype
    ucfg = model.unet_cfg
    x4 = jax.random.normal(rng, (4, h, h, 4), dt)
    x2 = jax.random.normal(rng, (2, h, h, 4), dt)
    e4 = jax.random.normal(rng, (4, 77, ucfg.cross_attention_dim), dt)
    e2 = jax.random.normal(rng, (2, 77, ucfg.cross_attention_dim), dt)
    add_in = model.unet_params["params"]["add_embedding"][
        "linear_1"]["kernel"].shape[0]
    pool_dim = add_in - 6 * ucfg.addition_time_embed_dim

    def added(b):
        return {"text_embeds": jnp.zeros((b, pool_dim), dt),
                "time_ids": jnp.zeros((b, 6), jnp.float32)}

    @jax.jit
    def six_rows(p, x4, x2, e4, e2):
        a, _ = model.unet.apply(p, x4, jnp.float32(500.), e4, added(4))
        b, _ = model.unet.apply(p, x2, jnp.float32(500.), e2, added(2))
        return a.sum() + b.sum()

    six_rows(model.unet_params, x4, x2, e4, e2).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = six_rows(model.unet_params, x4, x2, e4, e2)
    jax.device_get(out)
    dt_step = (time.time() - t0) / 5
    from rich_text_to_image_tpu.utils.flops import unet_fwd_flops as _uf
    f_step = _uf(model, 4, True) + _uf(model, 2, True)
    print(json.dumps({
        "phase": "rich_6row_step_isolated", "s": round(dt_step, 4),
        "model_tflops": round(f_step / 1e12, 1),
        "achieved_tflops_s": round(f_step / dt_step / 1e12, 1),
        "mfu": round(f_step / dt_step / peak, 3),
    }), flush=True)

    # ---- standalone: guidance gradient fp32 vs bf16
    for tag, g_dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        from rich_text_to_image_tpu.models.vae import AutoencoderKL

        vae = AutoencoderKL(model.vae_cfg, dtype=g_dt, remat_blocks=True)
        m_px = jnp.asarray(np.random.RandomState(0).rand(1, px, px),
                           jnp.float32)
        tgt = jnp.asarray([[0.8, 0.1, 0.1]], jnp.float32)
        # mirror the pipeline: remat the decode (fp32 fwd+bwd activations
        # through the 1024² VAE otherwise exhaust HBM)
        decode = jax.checkpoint(
            lambda vp, z: vae.apply(vp, z, method=vae.decode))

        def loss(z):
            imgs = decode(
                model.vae_params,
                z.astype(jnp.float32) / model.vae_cfg.scaling_factor,
            )
            imgs = jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)
            num = jnp.einsum("bhwc,nhw->nc", imgs, m_px)
            den = m_px.sum(axis=(1, 2))[:, None] + 1e-12
            return (jnp.mean((num / den - tgt) ** 2, axis=1) * 100.0).sum()

        gfn = jax.jit(jax.grad(loss))
        z = jax.random.normal(rng, (1, h, h, 4), jnp.float32)
        gfn(z).block_until_ready()
        t0 = time.time()
        for _ in range(3):
            g = gfn(z)
        jax.device_get(g)
        dt_g = (time.time() - t0) / 3
        fg = guidance_grad_flops(model)  # fp32 flop count for both
        print(json.dumps({
            "phase": f"guidance_grad_{tag}", "s": round(dt_g, 4),
            "model_tflops": round(fg / 1e12, 1),
            "achieved_tflops_s": round(fg / dt_g / 1e12, 1),
            "mfu": round(fg / dt_g / peak, 3),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50,
         standalone_only="standalone" in sys.argv[2:])
