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

# ---------------------------------------------------------------- quick marker
# `pytest -m quick` = the <10-min regression pass on this 1-core box (the full
# suite is ~40 min serially; VERDICT r4 weak #8). Modules listed here are the
# long ones — subprocess spawns, notebook kernels, training soaks — everything
# else is auto-marked quick at collection. Tune with `--durations=20`.
SLOW_MODULES = {
    "test_multiprocess",   # spawns 2 real OS processes (~6 min)
    "test_examples",       # subprocess-executed example scripts
    "test_notebooks",      # executes 8 notebook kernels
    "test_training",       # multi-step train loops + checkpoint/resume
    "test_vae_training",   # adversarial VAE training steps
    "test_conditioning",   # trains a tiny conditional model to selectivity
    "test_serving",        # live batcher threads + warmup compiles (~5 min)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


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
