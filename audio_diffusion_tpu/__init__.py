"""audio_diffusion_tpu — TPU-native audio diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
teticio/audio-diffusion: batched on-device mel <-> audio DSP, DDPM/DDIM
diffusion with a single-scan jitted denoise loop, latent diffusion through a
KL-VAE, audio-embedding conditioning, and pjit data-parallel training.
"""

VERSION = "0.1.0"
__version__ = VERSION

from .mel import Mel, MelConfig  # noqa: F401,E402


def __getattr__(name):
    # Lazy imports keep `import audio_diffusion_tpu` light for DSP-only users.
    if name == "AudioDiffusion":
        from .audio_diffusion import AudioDiffusion

        return AudioDiffusion
    if name == "AudioDiffusionPipeline":
        from .pipelines.pipeline import AudioDiffusionPipeline

        return AudioDiffusionPipeline
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
