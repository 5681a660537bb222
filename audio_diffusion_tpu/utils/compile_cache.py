"""Persistent XLA compilation cache.

TPU compiles are expensive (tens of seconds to minutes for big train steps,
worse over this environment's remote-compile tunnel) and JAX's in-memory jit
cache dies with the process. Enabling the persistent cache makes every entry
point — training scripts, bench, apps — pay each compile once per machine.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> str:
    import jax

    directory = directory or os.environ.get(
        "AUDIO_DIFFUSION_TPU_CACHE", os.path.expanduser("~/.cache/audio_diffusion_tpu_xla")
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return directory
