"""Scheduler math gates (SURVEY.md §7 stage 2): parity with an independent
numpy mirror of the published DDPM/DDIM update rules, plus closed-form
self-consistency properties (perfect-model recovery, inversion roundtrip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    SchedulerConfig,
    load_scheduler,
    save_scheduler,
)


def _np_tables(T=1000, b0=1e-4, b1=0.02):
    betas = np.linspace(b0, b1, T)
    return betas, np.cumprod(1 - betas)


# ------------------------------------------------------------------ timesteps

def test_leading_timesteps_match_diffusers_rule():
    sched = DDIMScheduler()
    s = sched.schedule(50)
    golden = (np.arange(0, 50) * (1000 // 50)).round()[::-1]
    np.testing.assert_array_equal(s.timesteps, golden)
    assert s.timesteps[0] == 980 and s.timesteps[-1] == 0
    assert s.step_delta == 20

    s1000 = DDPMScheduler().schedule(1000)
    np.testing.assert_array_equal(s1000.timesteps, np.arange(999, -1, -1))


# ------------------------------------------------------------------ add_noise

def test_add_noise_matches_closed_form():
    sched = DDPMScheduler()
    _, acp = _np_tables()
    x0 = np.random.default_rng(0).standard_normal((2, 4, 4)).astype(np.float32)
    eps = np.random.default_rng(1).standard_normal((2, 4, 4)).astype(np.float32)
    for t in [0, 123, 999]:
        ours = np.asarray(sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), t))
        golden = np.sqrt(acp[t]) * x0 + np.sqrt(1 - acp[t]) * eps
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_add_noise_per_example_timesteps():
    sched = DDPMScheduler()
    _, acp = _np_tables()
    x0 = np.ones((3, 2, 2), dtype=np.float32)
    eps = np.full((3, 2, 2), 0.5, dtype=np.float32)
    t = np.array([10, 500, 990])
    ours = np.asarray(sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), t))
    for i, ti in enumerate(t):
        golden = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 0.5
        np.testing.assert_allclose(ours[i], golden, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ DDIM

def test_ddim_step_perfect_model_recovers_trajectory():
    """If x_t was formed from (x0, eps) exactly and the model predicts eps,
    the eta=0 DDIM step must land exactly on x_{t_prev}."""
    sched = DDIMScheduler()
    s = sched.schedule(50)
    rng = np.random.default_rng(2)
    x0 = rng.uniform(-0.9, 0.9, (1, 8, 8)).astype(np.float32)  # inside clip range
    eps = rng.standard_normal((1, 8, 8)).astype(np.float32)
    _, acp = _np_tables()

    for t in [980, 500, 20]:
        prev_t = t - s.step_delta
        x_t = sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), t)
        out = np.asarray(sched.step(jnp.asarray(eps), t, x_t, s))
        a_prev = acp[prev_t] if prev_t >= 0 else 1.0
        golden = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(out, golden, atol=3e-5)


def test_ddim_final_step_returns_x0():
    sched = DDIMScheduler()
    s = sched.schedule(50)
    rng = np.random.default_rng(3)
    x0 = rng.uniform(-0.9, 0.9, (1, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4)).astype(np.float32)
    x_t = sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), 0)
    out = np.asarray(sched.step(jnp.asarray(eps), 0, x_t, s))
    # prev_t < 0 -> final_alpha_cumprod = 1 -> output is x0 exactly.
    np.testing.assert_allclose(out, x0, atol=3e-5)


def test_ddim_eta_matches_numpy_mirror():
    """Full-step parity (including eta>0 variance magnitude) against an
    independent numpy transcription of the DDIM update rule."""
    sched = DDIMScheduler()
    s = sched.schedule(50)
    _, acp = _np_tables()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 8, 8)).astype(np.float32)
    eps_hat = rng.standard_normal((1, 8, 8)).astype(np.float32)
    t, eta = 500, 1.0
    key = jax.random.key(7)

    ours = np.asarray(sched.step(jnp.asarray(eps_hat), t, jnp.asarray(x), s, eta=eta, key=key))

    prev_t = t - s.step_delta
    a_t, a_prev = acp[t], acp[prev_t]
    b_t = 1 - a_t
    x0 = (x - np.sqrt(b_t) * eps_hat) / np.sqrt(a_t)
    x0 = np.clip(x0, -1, 1)
    var = (1 - a_prev) / b_t * (1 - a_t / a_prev)
    std = eta * np.sqrt(var)
    direction = np.sqrt(1 - a_prev - std**2) * eps_hat
    noise = np.asarray(jax.random.normal(key, x.shape, dtype=jnp.float32))
    golden = np.sqrt(a_prev) * x0 + direction + std * noise
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_ddim_inversion_roundtrip():
    """invert_step must be the exact inverse of the eta=0 step when the model
    output is held fixed (and x0 stays inside the clip range)."""
    sched = DDIMScheduler()
    s = sched.schedule(50)
    rng = np.random.default_rng(5)
    x0 = rng.uniform(-0.5, 0.5, (1, 8, 8)).astype(np.float32)
    eps = 0.3 * rng.standard_normal((1, 8, 8)).astype(np.float32)
    for t in [980, 400, 20]:
        x_t = sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), t)
        x_prev = sched.step(jnp.asarray(eps), t, x_t, s)
        back = np.asarray(sched.invert_step(jnp.asarray(eps), t, x_prev, s))
        np.testing.assert_allclose(back, np.asarray(x_t), atol=1e-4)


# ------------------------------------------------------------------ DDPM

def test_ddpm_step_matches_numpy_mirror():
    sched = DDPMScheduler()
    s = sched.schedule(1000)
    betas, acp = _np_tables()
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 8, 8)).astype(np.float32)
    eps_hat = rng.standard_normal((1, 8, 8)).astype(np.float32)
    key = jax.random.key(9)

    for t in [999, 500, 1]:
        ours = np.asarray(sched.step(jnp.asarray(eps_hat), t, jnp.asarray(x), s, key))
        a_t = acp[t]
        a_prev = acp[t - 1] if t > 0 else 1.0
        b_t, b_prev = 1 - a_t, 1 - a_prev
        cur_alpha = a_t / a_prev
        cur_beta = 1 - cur_alpha
        x0 = np.clip((x - np.sqrt(b_t) * eps_hat) / np.sqrt(a_t), -1, 1)
        mean = (np.sqrt(a_prev) * cur_beta / b_t) * x0 + (np.sqrt(cur_alpha) * b_prev / b_t) * x
        var = max(b_prev / b_t * cur_beta, 1e-20)
        noise = np.asarray(jax.random.normal(key, x.shape, dtype=jnp.float32))
        golden = mean + (np.sqrt(var) if t > 0 else 0.0) * noise
        np.testing.assert_allclose(ours, golden, rtol=5e-4, atol=2e-4, err_msg=f"t={t}")


def test_ddpm_t0_step_is_deterministic():
    sched = DDPMScheduler()
    s = sched.schedule(1000)
    x = jnp.ones((1, 4, 4))
    eps = jnp.zeros((1, 4, 4))
    a = np.asarray(sched.step(eps, 0, x, s, jax.random.key(0)))
    b = np.asarray(sched.step(eps, 0, x, s, jax.random.key(123)))
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------------ scan + io

def test_scheduler_step_inside_scan_jits():
    sched = DDIMScheduler()
    s = sched.schedule(10)
    ts = jnp.asarray(s.timesteps)

    @jax.jit
    def run(x):
        def body(x, t):
            return sched.step(jnp.zeros_like(x), t, x, s), None

        out, _ = jax.lax.scan(body, x, ts)
        return out

    out = run(jnp.ones((1, 4, 4)))
    assert out.shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_scheduler_config_save_load(tmp_path):
    sched = DDIMScheduler(SchedulerConfig(num_train_timesteps=500, beta_end=0.01))
    save_scheduler(sched, str(tmp_path))
    loaded = load_scheduler(str(tmp_path))
    assert isinstance(loaded, DDIMScheduler)
    assert loaded.config.num_train_timesteps == 500
    assert loaded.config.beta_end == 0.01


def test_v_prediction_consistency():
    cfg = SchedulerConfig(prediction_type="v_prediction")
    sched = DDIMScheduler(cfg)
    s = sched.schedule(50)
    rng = np.random.default_rng(8)
    x0 = rng.uniform(-0.8, 0.8, (1, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4)).astype(np.float32)
    t = 500
    x_t = DDPMScheduler(cfg).add_noise(jnp.asarray(x0), jnp.asarray(eps), t)
    v = DDPMScheduler(cfg).velocity(jnp.asarray(x0), jnp.asarray(eps), t)
    out = np.asarray(sched.step(v, t, x_t, s))
    _, acp = _np_tables()
    a_prev = acp[t - s.step_delta]
    golden = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(out, golden, atol=3e-5)


# -------------------------------------------------- per-row stochastic keys

def test_per_row_step_keys_are_batch_composition_independent():
    """DDPM/eta>0 steps with a (B,) key vector draw each row's noise from its
    own key: row i's output is bitwise identical no matter what else is in
    the batch (the serving determinism contract — common.py::variance_noise).
    The scalar-key path keeps the reference's batch-shaped draw semantics."""
    from audio_diffusion_tpu.schedulers.common import split_step_key, variance_noise

    ddpm = DDPMScheduler()
    schedule = ddpm.schedule(10)
    t = jnp.asarray(schedule.timesteps[0])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((3, 4, 4, 1)).astype(np.float32))
    keys = jnp.stack([jax.random.key(s) for s in (5, 9, 2)])

    batched = ddpm.step(eps, t, x, schedule, key=keys)
    for i in range(3):
        solo = ddpm.step(eps[i:i + 1], t, x[i:i + 1], schedule,
                         key=keys[i:i + 1])
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(solo[0]))

    # Scalar key: unchanged reference semantics — one (B, ...) draw, so a
    # row beyond the first cannot be reproduced by a solo call with the same
    # key (JAX's counter-based PRNG makes row 0 prefix-stable; row 1 is not).
    full = ddpm.step(eps, t, x, schedule, key=jax.random.key(5))
    solo1 = ddpm.step(eps[1:2], t, x[1:2], schedule, key=jax.random.key(5))
    assert not np.array_equal(np.asarray(full[1]), np.asarray(solo1[0]))

    # split_step_key advances each row's chain independently.
    carry, use = split_step_key(keys)
    c0, u0 = split_step_key(keys[0])
    np.testing.assert_array_equal(
        jax.random.key_data(carry[0]), jax.random.key_data(c0))
    np.testing.assert_array_equal(
        jax.random.key_data(use[0]), jax.random.key_data(u0))


def test_ddim_eta_per_row_keys_match_solo():
    ddim = DDIMScheduler()
    schedule = ddim.schedule(10)
    t = jnp.asarray(schedule.timesteps[0])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    keys = jnp.stack([jax.random.key(7), jax.random.key(11)])
    batched = ddim.step(eps, t, x, schedule, eta=1.0, key=keys)
    solo = ddim.step(eps[1:], t, x[1:], schedule, eta=1.0, key=keys[1:])
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(solo[0]))
