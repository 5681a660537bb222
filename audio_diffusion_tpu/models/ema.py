"""Exponential moving average of parameters as a pure tree transform.

Replaces ``diffusers.training_utils.EMAModel`` as used by the reference
(reference: scripts/train_unet.py:185-190,266,294): decay schedule
``min(max_decay, 1 - (1 + step / inv_gamma)^-power)`` with defaults
inv_gamma=1.0, power=0.75, max_decay=0.9999. Pure functions over pytrees so
the update lives inside the jitted train step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMA:
    inv_gamma: float = 1.0
    power: float = 0.75
    max_decay: float = 0.9999
    min_decay: float = 0.0

    def decay(self, step) -> jnp.ndarray:
        """Warmup decay schedule; step is the optimization step (traced ok)."""
        step = jnp.asarray(step, dtype=jnp.float32)
        value = 1.0 - (1.0 + step / self.inv_gamma) ** (-self.power)
        return jnp.clip(value, self.min_decay, self.max_decay)

    def update(self, ema_params, new_params, step):
        """ema <- decay * ema + (1 - decay) * new, elementwise over the tree."""
        d = self.decay(step)
        return jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p, ema_params, new_params)
