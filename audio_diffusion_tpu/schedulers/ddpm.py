"""DDPM (ancestral) scheduler as pure functions over static tables.

Semantics match ``diffusers.DDPMScheduler`` 0.24 with ``variance_type=
"fixed_small"`` — the configuration the reference trains and samples with
(reference: scripts/train_unet.py:161-162, pipeline_audio_diffusion.py:173-179).
``step`` takes a traced timestep scalar and an explicit PRNG key so the whole
sampling loop compiles to one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    Schedule,
    SchedulerConfig,
    leading_timesteps,
    make_betas,
    predict_x0_and_eps,
    variance_noise,
)


@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    config: SchedulerConfig = SchedulerConfig()

    def __post_init__(self):
        betas = make_betas(
            self.config.num_train_timesteps, self.config.beta_start, self.config.beta_end, self.config.beta_schedule
        )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        object.__setattr__(self, "alphas_cumprod", jnp.asarray(alphas_cumprod, dtype=jnp.float32))

    @classmethod
    def from_config(cls, config: dict) -> "DDPMScheduler":
        return cls(SchedulerConfig.from_config(config))

    @property
    def num_train_timesteps(self) -> int:
        return self.config.num_train_timesteps

    def schedule(self, num_inference_steps: int) -> Schedule:
        return leading_timesteps(self.config.num_train_timesteps, num_inference_steps, self.config.steps_offset)

    def default_num_inference_steps(self) -> int:
        # Reference: 1000 steps for DDPM (pipeline_audio_diffusion.py:69).
        return self.config.num_train_timesteps

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        """Forward process q(x_t | x_0); ``t`` broadcasts over leading axes."""
        a = self.alphas_cumprod[jnp.asarray(t)]
        while a.ndim < sample.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise

    def velocity(self, sample: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        a = self.alphas_cumprod[jnp.asarray(t)]
        while a.ndim < sample.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample

    def step(
        self,
        model_output: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        schedule: Schedule,
        key: jax.Array,
    ) -> jnp.ndarray:
        """One ancestral reverse step x_t -> x_{t_prev}. Pure; scan-friendly."""
        cfg = self.config
        t = jnp.asarray(t)
        prev_t = t - schedule.step_delta

        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_prev = 1.0 - alpha_prod_prev
        current_alpha_t = alpha_prod_t / alpha_prod_prev
        current_beta_t = 1.0 - current_alpha_t

        x0, _ = predict_x0_and_eps(sample, model_output, alpha_prod_t, cfg.prediction_type)
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

        x0_coeff = jnp.sqrt(alpha_prod_prev) * current_beta_t / beta_prod_t
        xt_coeff = jnp.sqrt(current_alpha_t) * beta_prod_prev / beta_prod_t
        prev_sample = x0_coeff * x0 + xt_coeff * sample

        # "fixed_small" posterior variance, floored like diffusers.
        variance = jnp.maximum(beta_prod_prev / beta_prod_t * current_beta_t, 1e-20)
        # Scalar key: one batch-shaped draw (reference semantics);
        # (B,) keys: per-row draws (serving determinism) — see common.py.
        noise = variance_noise(key, sample)
        prev_sample = prev_sample + jnp.where(t > 0, jnp.sqrt(variance), 0.0) * noise
        return prev_sample
