"""User-facing convenience API (reference: audiodiffusion/__init__.py:15-140).

``AudioDiffusion`` wraps an :class:`AudioDiffusionPipeline` loaded from disk
(a directory saved by this framework or a torch diffusers checkpoint, which is
imported automatically). ``loop_it`` beat-tracks generated audio and tiles
whole bars, exactly mirroring the reference's bar arithmetic
(__init__.py:124-140).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from PIL import Image

from .ops.beat import beat_track
from .pipelines.pipeline import AudioDiffusionPipeline


class AudioDiffusion:
    def __init__(self, model_id: str = "teticio/audio-diffusion-256", progress_bar=None):
        """Args:
            model_id: local directory (this framework's or a torch diffusers
                checkpoint directory to import), or a Hub model id like
                ``teticio/audio-diffusion-256`` (resolved cache-first,
                utils/hub.py). Unlike the reference there is no device flag —
                JAX places computation on the TPU automatically.
        """
        self.model_id = model_id
        self.pipe = AudioDiffusionPipeline.from_pretrained(model_id)

    def generate_spectrogram_and_audio(
        self,
        steps: int = None,
        key: Optional[jax.Array] = None,
        step_key: Optional[jax.Array] = None,
        eta: float = 0,
        noise=None,
        encoding=None,
    ) -> Tuple[Image.Image, Tuple[int, np.ndarray]]:
        """Random mel spectrogram + audio (reference: __init__.py:35-68)."""
        images, (sample_rate, audios) = self.pipe(
            batch_size=1, steps=steps, key=key, step_key=step_key,
            eta=eta, noise=noise, encoding=encoding, return_dict=False,
        )
        return images[0], (sample_rate, audios[0])

    def generate_spectrogram_and_audio_from_audio(
        self,
        audio_file: str = None,
        raw_audio: np.ndarray = None,
        slice: int = 0,
        start_step: int = 0,
        steps: int = None,
        key: Optional[jax.Array] = None,
        mask_start_secs: float = 0,
        mask_end_secs: float = 0,
        step_key: Optional[jax.Array] = None,
        eta: float = 0,
        encoding=None,
        noise=None,
    ) -> Tuple[Image.Image, Tuple[int, np.ndarray]]:
        """Conditioned on input audio (reference: __init__.py:70-122)."""
        images, (sample_rate, audios) = self.pipe(
            batch_size=1, audio_file=audio_file, raw_audio=raw_audio, slice=slice,
            start_step=start_step, steps=steps, key=key,
            mask_start_secs=mask_start_secs, mask_end_secs=mask_end_secs,
            step_key=step_key, eta=eta, noise=noise, encoding=encoding,
            return_dict=False,
        )
        return images[0], (sample_rate, audios[0])

    @staticmethod
    def loop_it(audio: np.ndarray, sample_rate: int, loops: int = 12) -> Optional[np.ndarray]:
        """Tile whole bars of audio, or None if no bar is found
        (reference: __init__.py:124-140, beats_in_bar = (len(beats)-1)//4*4)."""
        _, beats = beat_track(np.asarray(audio), sample_rate, units="samples")
        beats_in_bar = (len(beats) - 1) // 4 * 4
        if beats_in_bar > 0:
            return np.tile(audio[beats[0] : beats[beats_in_bar]], loops)
        return None
