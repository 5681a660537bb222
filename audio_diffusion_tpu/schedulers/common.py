"""Shared diffusion-schedule math: beta schedules and cumulative-alpha tables.

The reference uses ``diffusers.DDPMScheduler`` / ``DDIMScheduler`` (reference:
audiodiffusion/pipeline_audio_diffusion.py:24-32, scripts/train_unet.py:161-164)
with default hyperparameters. Numeric semantics here match diffusers 0.24 (the
pinned reference version): linear beta schedule 1e-4 -> 2e-2, "leading"
timestep spacing, epsilon prediction, ``clip_sample=True``.

Everything is a pure function over precomputed tables so scheduler steps can
live inside a ``lax.scan`` with traced timestep scalars.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import ConfigMixin


def split_step_key(key: jax.Array):
    """Advance the step-noise key chain one denoise step: returns
    ``(carry, use)``. A scalar key splits once (the reference's
    ``step_generator`` chain, pipeline_audio_diffusion.py:104-111); a
    ``(B,)`` vector of per-row keys splits each row's key independently —
    every row's chain depends only on its own key, which is what makes
    stochastic sampling batch-composition-independent (the serving
    determinism contract; see variance_noise)."""
    if key.ndim == 0:
        carry, use = jax.random.split(key)
        return carry, use
    ks = jax.vmap(jax.random.split)(key)
    return ks[:, 0], ks[:, 1]


def variance_noise(key: jax.Array, sample: jnp.ndarray) -> jnp.ndarray:
    """Per-step sampling noise for stochastic steps (DDPM, DDIM eta>0).

    A scalar key draws ONE (B, ...) tensor — row i's values then depend on
    the batch layout, exactly like the reference's shared ``step_generator``
    (pipeline_audio_diffusion.py:104-111, its documented batching caveat). A
    ``(B,)`` key vector draws each row's noise from ITS OWN key via vmap, so
    a request's stochastic samples are bitwise identical whether it runs solo
    or co-batched at any tier (gated by
    tests/test_serving.py::test_stochastic_solo_equals_batched_bitwise)."""
    if key.ndim == 0:
        return jax.random.normal(key, sample.shape, dtype=sample.dtype)
    return jax.vmap(
        lambda k: jax.random.normal(k, sample.shape[1:], dtype=sample.dtype)
    )(key)


def make_betas(num_train_timesteps: int, beta_start: float, beta_end: float, beta_schedule: str) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        i = np.arange(num_train_timesteps, dtype=np.float64)
        return np.minimum(1 - alpha_bar((i + 1) / num_train_timesteps) / alpha_bar(i / num_train_timesteps), 0.999)
    raise ValueError(f"Unknown beta_schedule {beta_schedule!r}")


class Schedule(NamedTuple):
    """A concrete inference schedule: the product of ``set_timesteps``.

    ``timesteps`` is a static numpy array (descending) so loop lengths stay
    shape-static under jit; ``step_delta = num_train // num_inference`` is what
    the per-step math needs to find the previous timestep.
    """

    timesteps: np.ndarray
    num_inference_steps: int
    step_delta: int


def leading_timesteps(num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 0) -> Schedule:
    """diffusers "leading" spacing: ``(arange(n) * (T // n)).round()[::-1] + offset``."""
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64) + steps_offset
    return Schedule(timesteps, num_inference_steps, step_ratio)


@dataclasses.dataclass(frozen=True)
class SchedulerConfig(ConfigMixin):
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"
    steps_offset: int = 0

    config_name = "scheduler_config.json"


def predict_x0_and_eps(sample, model_output, alpha_prod_t, prediction_type: str):
    """Recover (x0_hat, eps_hat) from the model output under a prediction type."""
    beta_prod_t = 1.0 - alpha_prod_t
    sqrt_a, sqrt_b = jnp.sqrt(alpha_prod_t), jnp.sqrt(beta_prod_t)
    if prediction_type == "epsilon":
        x0 = (sample - sqrt_b * model_output) / sqrt_a
        eps = model_output
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_b
    elif prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_b * model_output
        eps = sqrt_a * model_output + sqrt_b * sample
    else:
        raise ValueError(f"Unknown prediction_type {prediction_type!r}")
    return x0, eps
