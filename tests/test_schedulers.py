"""Scheduler numerics tests.

Oracle: stateful numpy re-implementations of the diffusers 0.18.2 update
rules (counter/ets-list style, mirroring the published algorithm) — an
independent code path from the framework's vectorized plan/ring-buffer
design, so agreement is a real differential check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rich_text_to_image_tpu.schedulers import (
    DDIMScheduler,
    EulerDiscreteScheduler,
    PNDMScheduler,
    make_alphas_cumprod,
)


# --------------------------------------------------------------------- oracle
class _OraclePNDM:
    """diffusers.PNDMScheduler PLMS path, stateful-list style."""

    def __init__(self, n_train=1000, steps_offset=1):
        self.n_train = n_train
        self.alphas_cumprod = make_alphas_cumprod(n_train)
        self.final_alpha_cumprod = self.alphas_cumprod[0]
        self.steps_offset = steps_offset

    def set_timesteps(self, n):
        self.num_inference_steps = n
        ratio = self.n_train // n
        ts = (np.arange(0, n) * ratio).round().astype(np.int64) + self.steps_offset
        self.timesteps = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1].copy()
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, model_output, timestep, sample):
        prev_timestep = timestep - self.n_train // self.num_inference_steps
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_timestep = timestep
            timestep = timestep + self.n_train // self.num_inference_steps

        if len(self.ets) == 1 and self.counter == 0:
            mo = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            mo = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            mo = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            mo = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            mo = (1 / 24) * (
                55 * self.ets[-1]
                - 59 * self.ets[-2]
                + 37 * self.ets[-3]
                - 9 * self.ets[-4]
            )

        alpha_t = self.alphas_cumprod[timestep]
        alpha_prev = (
            self.alphas_cumprod[prev_timestep]
            if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        beta_t = 1 - alpha_t
        beta_prev = 1 - alpha_prev
        coeff = (alpha_prev / alpha_t) ** 0.5
        denom = alpha_t * beta_prev**0.5 + (alpha_t * beta_t * alpha_prev) ** 0.5
        prev = coeff * sample - (alpha_prev - alpha_t) * mo / denom
        self.counter += 1
        return prev


def _fake_model(sample, t):
    """Deterministic pseudo-eps depending on sample & t."""
    return np.sin(sample * 3.1 + float(t) * 0.01) * 0.7


@pytest.mark.parametrize("n_steps", [41, 50, 7])
def test_pndm_matches_oracle(n_steps):
    rng = np.random.RandomState(0)
    x0 = rng.randn(1, 4, 8, 8).astype(np.float32)

    oracle = _OraclePNDM()
    oracle.set_timesteps(n_steps)
    x = x0.copy()
    oracle_traj = []
    for t in oracle.timesteps:
        eps = _fake_model(x, t)
        x = oracle.step(eps, int(t), x)
        oracle_traj.append(x.copy())

    sched = PNDMScheduler()
    plan = sched.plan(n_steps)
    np.testing.assert_array_equal(plan.timesteps, oracle.timesteps)
    assert plan.num_steps == n_steps + 1  # the PLMS duplication quirk

    state = sched.init_state(x0.shape)
    y = jnp.asarray(x0)
    for i in range(plan.num_steps):
        eps = jnp.asarray(_fake_model(np.asarray(y), plan.timesteps[i]))
        y, state = sched.step(plan, i, state, eps, y)
        # fp32 device math vs float64 oracle, compounded over 40+ steps of a
        # chaotic fake model — 1e-3 relative is the expected precision gap.
        np.testing.assert_allclose(
            np.asarray(y), oracle_traj[i], rtol=3e-3, atol=1e-4
        )


def test_pndm_step_under_scan():
    """The stepper must trace under lax.scan with index-gathered scalars."""
    sched = PNDMScheduler()
    plan = sched.plan(8)
    shape = (1, 4, 4, 4)
    x0 = jnp.ones(shape) * 0.3

    def body(carry, i):
        x, state = carry
        eps = jnp.sin(x * 2.0)
        x, state = sched.step(plan, i, state, eps, x)
        return (x, state), ()

    (x_scan, _), _ = jax.lax.scan(
        body, (x0, sched.init_state(shape)), jnp.arange(plan.num_steps)
    )

    step = jax.jit(lambda i, st, eps, x: sched.step(plan, i, st, eps, x))
    x_loop, state = x0, sched.init_state(shape)
    for i in range(plan.num_steps):
        eps = jnp.sin(x_loop * 2.0)
        x_loop, state = step(jnp.int32(i), state, eps, x_loop)
    # scan and loop fuse differently; fp32 agreement to ~1e-5 is expected
    np.testing.assert_allclose(
        np.asarray(x_scan), np.asarray(x_loop), rtol=1e-4, atol=1e-6
    )


# ---------------------------------------------------------------------- euler
def test_euler_matches_oracle():
    n = 30
    sched = EulerDiscreteScheduler()
    plan = sched.plan(n)

    # oracle: straight diffusers-0.18.2 math
    alphas = make_alphas_cumprod()
    ts = np.linspace(0, 999, n, dtype=np.float64)[::-1].copy()
    sig = np.interp(ts, np.arange(1000), ((1 - alphas) / alphas) ** 0.5)
    sig = np.concatenate([sig, [0.0]])
    np.testing.assert_allclose(plan.sigmas, sig.astype(np.float32), rtol=1e-6)
    assert plan.init_noise_sigma == pytest.approx((sig.max() ** 2 + 1) ** 0.5)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 8, 8).astype(np.float32) * sig[0]
    y = jnp.asarray(x)
    for i in range(n):
        scaled = np.asarray(sched.scale_model_input(plan, i, y))
        np.testing.assert_allclose(
            scaled, np.asarray(y) / (sig[i] ** 2 + 1) ** 0.5, rtol=1e-5
        )
        eps = _fake_model(scaled, plan.timesteps[i])
        # oracle step
        denoised = x - sig[i] * eps
        x = x + (x - denoised) / sig[i] * (sig[i + 1] - sig[i])
        y, _ = sched.step(plan, i, (), jnp.asarray(eps), y)
        eps_y = _fake_model(
            np.asarray(sched.scale_model_input(plan, i, y)), plan.timesteps[i]
        )  # keep trajectories in sync
        np.testing.assert_allclose(np.asarray(y), x, rtol=3e-4, atol=3e-5)


# ----------------------------------------------------------------------- ddim
def test_ddim_recovers_x0_with_true_eps():
    """If the model returns the exact noise, DDIM must walk back to x0."""
    sched = DDIMScheduler()
    plan = sched.plan(50)
    rng = np.random.RandomState(2)
    x0 = rng.randn(1, 4, 8, 8).astype(np.float32)
    noise = rng.randn(*x0.shape).astype(np.float32)

    # forward-diffuse to the first timestep of the plan
    a = plan.alpha_prod_t[0]
    x = jnp.asarray(a**0.5 * x0 + (1 - a) ** 0.5 * noise)
    for i in range(plan.num_steps):
        x, _ = sched.step(plan, i, (), jnp.asarray(noise), x)
    # with set_alpha_to_one=False the walk ends at alphas_cumprod[0], i.e.
    # x_final = sqrt(a0) x0 + sqrt(1-a0) eps, not x0 itself
    a0 = sched.final_alpha_cumprod
    expected = a0**0.5 * x0 + (1 - a0) ** 0.5 * noise
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-3)


def test_ddim_timesteps_offset():
    plan = DDIMScheduler().plan(50)
    assert plan.timesteps[0] == 981 + 0  # (49*20).round() + offset 1 = 981
    assert plan.timesteps[-1] == 1


# ------------------------------------------------------------------ dpm++ 2M
def test_dpmsolver_recovers_x0_with_true_eps():
    """With the exact noise as model output, DPM-Solver++ walks to x0 (its
    terminal boundary is t=0, alpha=~1)."""
    from rich_text_to_image_tpu.schedulers import DPMSolverMultistepScheduler

    sched = DPMSolverMultistepScheduler()
    plan = sched.plan(20)
    rng = np.random.RandomState(5)
    x0 = rng.randn(1, 4, 8, 8).astype(np.float32)
    noise = rng.randn(*x0.shape).astype(np.float32)
    a0 = plan.alpha_t[0]
    s0 = plan.sigma_t[0]
    x = jnp.asarray(a0 * x0 + s0 * noise)
    state = sched.init_state(x.shape)
    for i in range(plan.num_steps):
        # exact eps at the current boundary keeps x0 constant
        eps = (np.asarray(x) - plan.alpha_t[i] * x0) / plan.sigma_t[i]
        x, state = sched.step(plan, i, state, jnp.asarray(eps), x)
    # terminal boundary is alphas_cumprod[0] (≈0.99915, not exactly 1):
    # x_final = α_T x0 + σ_T ε with the initial noise carried through
    expected = plan.alpha_t[-1] * x0 + plan.sigma_t[-1] * noise
    np.testing.assert_allclose(np.asarray(x), expected, rtol=2e-3, atol=2e-3)


def test_dpmsolver_scan_compatible():
    from rich_text_to_image_tpu.schedulers import DPMSolverMultistepScheduler

    sched = DPMSolverMultistepScheduler()
    plan = sched.plan(12)
    shape = (1, 4, 4, 4)
    x0 = jnp.ones(shape) * 0.2

    def body(carry, i):
        x, st = carry
        eps = jnp.sin(x * 1.7)
        x, st = sched.step(plan, i, st, eps, x)
        return (x, st), ()

    (x_scan, _), _ = jax.lax.scan(
        body, (x0, sched.init_state(shape)), jnp.arange(plan.num_steps)
    )
    assert np.isfinite(np.asarray(x_scan)).all()

    x, st = x0, sched.init_state(shape)
    for i in range(plan.num_steps):
        eps = jnp.sin(x * 1.7)
        x, st = sched.step(plan, i, st, eps, x)
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x),
                               rtol=1e-4, atol=1e-6)


def test_dpmsolver_converges_like_many_step_ddim():
    """20-step DPM++ lands near a 200-step DDIM trajectory for a smooth
    pseudo-model — the whole point of the higher-order solver."""
    from rich_text_to_image_tpu.schedulers import (
        DDIMScheduler,
        DPMSolverMultistepScheduler,
    )

    def model(x, t):
        # smooth fake eps: pull latents toward a fixed direction
        return 0.3 * x + 0.1 * np.tanh(float(t) / 1000.0)

    rng = np.random.RandomState(7)
    x_init = rng.randn(1, 4, 8, 8).astype(np.float32)

    ddim = DDIMScheduler()
    dplan = ddim.plan(200)
    x = jnp.asarray(x_init)
    for i in range(dplan.num_steps):
        x, _ = ddim.step(dplan, i, (), jnp.asarray(
            model(np.asarray(x), dplan.timesteps[i])), x)
    ref = np.asarray(x)

    dpm = DPMSolverMultistepScheduler()
    pplan = dpm.plan(20)
    y = jnp.asarray(x_init)
    st = dpm.init_state(y.shape)
    for i in range(pplan.num_steps):
        y, st = dpm.step(pplan, i, st, jnp.asarray(
            model(np.asarray(y), pplan.timesteps[i])), y)
    got = np.asarray(y)
    # 20-step DPM++ should be close to the 200-step reference trajectory
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.08, rel
