"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (SURVEY.md §4: the substitute for the
reference's missing distributed-test story).
"""

import jax

# jax.config (not env vars) because this environment pre-imports jax with
# JAX_PLATFORMS=axon via sitecustomize, which latches before conftest runs.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def synth_audio(num_samples: int, sr: int = 22050, seed: int = 0) -> np.ndarray:
    """Deterministic harmonic-rich test signal (chord + AM + noise floor)."""
    rng = np.random.default_rng(seed)
    t = np.arange(num_samples) / sr
    audio = np.zeros(num_samples, dtype=np.float64)
    for f0, amp in [(220.0, 0.5), (277.2, 0.35), (330.0, 0.3), (440.0, 0.2), (880.0, 0.1)]:
        audio += amp * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
    audio *= 0.6 + 0.4 * np.sin(2 * np.pi * 1.5 * t)
    audio += 0.001 * rng.standard_normal(num_samples)
    return (audio / np.max(np.abs(audio)) * 0.8).astype(np.float32)
