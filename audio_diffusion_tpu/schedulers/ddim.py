"""DDIM scheduler as pure functions, including the closed-form inversion.

Semantics match ``diffusers.DDIMScheduler`` 0.24 (``set_alpha_to_one=True`` so
``final_alpha_cumprod = 1``): the reference's fast sampler and the basis of its
``encode``/slerp interpolation features (reference:
pipeline_audio_diffusion.py:165-172, 207-242).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .common import (
    Schedule,
    SchedulerConfig,
    leading_timesteps,
    make_betas,
    predict_x0_and_eps,
    variance_noise,
)

import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    config: SchedulerConfig = SchedulerConfig()
    set_alpha_to_one: bool = True

    def __post_init__(self):
        betas = make_betas(
            self.config.num_train_timesteps, self.config.beta_start, self.config.beta_end, self.config.beta_schedule
        )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        object.__setattr__(self, "alphas_cumprod", jnp.asarray(alphas_cumprod, dtype=jnp.float32))
        final = 1.0 if self.set_alpha_to_one else float(alphas_cumprod[0])
        object.__setattr__(self, "final_alpha_cumprod", jnp.float32(final))

    @classmethod
    def from_config(cls, config: dict) -> "DDIMScheduler":
        return cls(SchedulerConfig.from_config(config), set_alpha_to_one=config.get("set_alpha_to_one", True))

    @property
    def num_train_timesteps(self) -> int:
        return self.config.num_train_timesteps

    def schedule(self, num_inference_steps: int) -> Schedule:
        return leading_timesteps(self.config.num_train_timesteps, num_inference_steps, self.config.steps_offset)

    def default_num_inference_steps(self) -> int:
        # Reference: 50 steps for DDIM (pipeline_audio_diffusion.py:69).
        return 50

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        a = self.alphas_cumprod[jnp.asarray(t)]
        while a.ndim < sample.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise

    def velocity(self, sample: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        """v-prediction target: v = sqrt(a)*eps - sqrt(1-a)*x0."""
        a = self.alphas_cumprod[jnp.asarray(t)]
        while a.ndim < sample.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample

    def _alpha_prev(self, prev_t: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], self.final_alpha_cumprod)

    def step(
        self,
        model_output: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        schedule: Schedule,
        eta: float = 0.0,
        key: jax.Array | None = None,
    ) -> jnp.ndarray:
        """One deterministic (eta=0) or stochastic DDIM step x_t -> x_{t_prev}."""
        cfg = self.config
        t = jnp.asarray(t)
        prev_t = t - schedule.step_delta

        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = self._alpha_prev(prev_t)
        beta_prod_t = 1.0 - alpha_prod_t

        x0, eps = predict_x0_and_eps(sample, model_output, alpha_prod_t, cfg.prediction_type)
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

        variance = (1.0 - alpha_prod_prev) / beta_prod_t * (1.0 - alpha_prod_t / alpha_prod_prev)
        std_dev = eta * jnp.sqrt(variance)

        direction = jnp.sqrt(jnp.maximum(1.0 - alpha_prod_prev - std_dev**2, 0.0)) * eps
        prev_sample = jnp.sqrt(alpha_prod_prev) * x0 + direction
        if eta > 0:
            if key is None:
                raise ValueError("eta > 0 requires a PRNG key for the variance noise")
            # Scalar key: one batch-shaped draw (reference semantics);
            # (B,) keys: per-row draws (serving determinism) — see common.py.
            prev_sample = prev_sample + std_dev * variance_noise(key, sample)
        return prev_sample

    def invert_step(
        self,
        model_output: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        schedule: Schedule,
    ) -> jnp.ndarray:
        """Closed-form reverse of the deterministic step, exactly mirroring the
        reference's DDIM inversion (pipeline_audio_diffusion.py:228-240):
        undo step t (x_{t_prev} -> x0-direction decomposition) then re-noise to t."""
        t = jnp.asarray(t)
        prev_t = t - schedule.step_delta
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = self._alpha_prev(prev_t)
        beta_prod_t = 1.0 - alpha_prod_t

        direction = jnp.sqrt(1.0 - alpha_prod_prev) * model_output
        x0 = (sample - direction) / jnp.sqrt(alpha_prod_prev)
        return jnp.sqrt(alpha_prod_t) * x0 + jnp.sqrt(beta_prod_t) * model_output
