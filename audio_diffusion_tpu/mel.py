"""Bidirectional audio <-> mel-spectrogram-image conversion, batched on TPU.

TPU-native rebuild of the reference ``Mel`` class (reference:
audiodiffusion/mel.py:44-168). The reference converts one slice at a time on
the host CPU with librosa; here the forward (STFT -> mel matmul -> dB -> uint8
quantize) and inverse (uint8 -> dB -> power -> NNLS -> Griffin-Lim) paths are
single jit-compiled programs over a whole batch of slices.

The uint8 image is the data contract: models are trained on 8-bit-quantized
spectrograms, so quantization math matches the reference bit-for-bit
(reference: audiodiffusion/mel.py:149,162-163).

Public surface keeps the reference API (``load_audio``, ``get_number_of_slices``,
``get_audio_slice``, ``audio_slice_to_image``, ``image_to_audio``,
``get_sample_rate``, ``set_resolution``) plus first-class batched array methods
(``spectrogram_images_from_audio``, ``images_to_audio``) that feed the pipeline
and dataset tooling without PIL round-trips.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .ops import audio_io
from .ops.griffin_lim import mel_to_audio
from .ops.mel_filters import db_to_power, db_to_uint8, mel_filterbank, power_to_db, uint8_to_db
from .ops.stft import stft
from .utils.config import ConfigMixin


@dataclasses.dataclass(frozen=True)
class MelConfig(ConfigMixin):
    """Serialized as ``mel_config.json`` — field names match the reference's
    diffusers ``register_to_config`` contract (reference: audiodiffusion/mel.py:58-68)
    so checkpoints interoperate both ways."""

    x_res: int = 256
    y_res: int = 256
    sample_rate: int = 22050
    n_fft: int = 2048
    hop_length: int = 512
    top_db: int = 80
    n_iter: int = 32

    config_name = "mel_config.json"


class Mel:
    def __init__(
        self,
        x_res: int = 256,
        y_res: int = 256,
        sample_rate: int = 22050,
        n_fft: int = 2048,
        hop_length: int = 512,
        top_db: int = 80,
        n_iter: int = 32,
    ):
        self.config = MelConfig(x_res, y_res, sample_rate, n_fft, hop_length, top_db, n_iter)
        self.hop_length = hop_length
        self.sr = sample_rate
        self.n_fft = n_fft
        self.top_db = top_db
        self.n_iter = n_iter
        self.audio: Optional[np.ndarray] = None
        self.set_resolution(x_res, y_res)

    # ------------------------------------------------------------------ config
    @classmethod
    def from_config(cls, config: dict) -> "Mel":
        cfg = MelConfig.from_config(config)
        return cls(cfg.x_res, cfg.y_res, cfg.sample_rate, cfg.n_fft, cfg.hop_length, cfg.top_db, cfg.n_iter)

    @classmethod
    def from_pretrained(cls, directory: str) -> "Mel":
        return cls.from_config(MelConfig.load_config(directory))

    def save_pretrained(self, directory: str) -> None:
        self.config.save_config(directory)

    # --------------------------------------------------------------- reference API
    def set_resolution(self, x_res: int, y_res: int) -> None:
        """(reference: audiodiffusion/mel.py:80-90) — ``slice_size`` carries the
        ``-1`` that makes the centered STFT produce exactly ``x_res`` frames."""
        self.x_res = x_res
        self.y_res = y_res
        self.n_mels = y_res
        self.slice_size = x_res * self.hop_length - 1
        self.config = dataclasses.replace(self.config, x_res=x_res, y_res=y_res)
        self._mel_basis = mel_filterbank(self.sr, self.n_fft, self.n_mels)
        self._build_kernels()

    def load_audio(self, audio_file: str = None, raw_audio: np.ndarray = None) -> None:
        """(reference: audiodiffusion/mel.py:92-106) — zero-pads short audio."""
        if audio_file is not None:
            self.audio = audio_io.load_audio(audio_file, self.sr)
        else:
            self.audio = np.asarray(raw_audio, dtype=np.float32)
        if len(self.audio) < self.x_res * self.hop_length:
            pad = self.x_res * self.hop_length - len(self.audio)
            self.audio = np.concatenate([self.audio, np.zeros((pad,), dtype=self.audio.dtype)])

    def get_number_of_slices(self) -> int:
        return len(self.audio) // self.slice_size

    def get_audio_slice(self, slice: int = 0) -> np.ndarray:
        return self.audio[self.slice_size * slice : self.slice_size * (slice + 1)]

    def get_sample_rate(self) -> int:
        return self.sr

    def audio_slice_to_image(self, slice: int, ref=None) -> Image.Image:
        """slice -> uint8 mel image. ``ref=None`` = per-spectrogram max (the
        reference's ``np.max`` default); a scalar matches librosa's scalar-ref
        dB convention; a CALLABLE is applied to the power spectrogram like
        librosa's ``ref_value = abs(ref(S))`` — the reference accepts
        ``Union[float, Callable]`` (audiodiffusion/mel.py:135-148). Callables
        must be hashable (they key the compiled-program cache) and accept a
        jax array; numpy reducers like ``np.max``/``np.mean`` qualify."""
        arr = self.spectrogram_images_from_audio(self.get_audio_slice(slice)[None], ref=ref)[0]
        return Image.fromarray(np.asarray(arr))

    def image_to_audio(self, image: Image.Image, key: Optional[jax.Array] = None) -> np.ndarray:
        bytedata = np.frombuffer(image.tobytes(), dtype="uint8").reshape((image.height, image.width))
        return np.asarray(self.images_to_audio(bytedata[None], key=key)[0])

    # --------------------------------------------------------------- batched API
    def _build_kernels(self) -> None:
        mel_basis = self._mel_basis  # (n_mels, n_freq), static constant
        n_fft, hop, top_db = self.n_fft, self.hop_length, float(self.top_db)
        n_iter = self.n_iter
        self._gl_mats = None  # lazy device-committed windowed-DFT matrices

        @partial(jax.jit, static_argnames=("ref",))
        def _forward(audio: jnp.ndarray, ref=None) -> jnp.ndarray:
            spec = stft(audio.astype(jnp.float32), n_fft, hop)  # (B, frames, freq)
            power = jnp.abs(spec) ** 2
            mel = power @ mel_basis.T  # (B, frames, n_mels) — MXU matmul
            mel = jnp.swapaxes(mel, -2, -1)  # image layout: (B, n_mels, frames)
            log_s = power_to_db(mel, top_db, ref=ref)
            return db_to_uint8(log_s, top_db)

        # The Griffin-Lim DFT matrices (~33 MB f32 at n_fft=2048) ride along as
        # jit ARGUMENTS, not trace-time constants: baked constants bloat every
        # cached HLO module containing the inverse path and risk the remote-
        # compile upload limit (CLAUDE.md "HTTP 413"; ADVICE r4). Passed once
        # as device-committed arrays, they transfer once and are shared by
        # reference across programs.
        @partial(jax.jit, static_argnames=("length",))
        def _inverse_impl(images: jnp.ndarray, key: jax.Array, length: int,
                          dft_mats) -> jnp.ndarray:
            log_s = uint8_to_db(images, top_db)  # (B, n_mels, frames)
            mel_power = jnp.swapaxes(db_to_power(log_s), -2, -1)  # (B, frames, n_mels)
            return mel_to_audio(mel_power, mel_basis, key, n_fft, hop, n_iter,
                                length=length, dft_mats=dft_mats)

        self._forward = _forward
        self._inverse_impl = _inverse_impl

    def gl_matrices(self) -> tuple:
        """Device-committed windowed-DFT matrices for the Griffin-Lim matmul
        projection (ops.stft.windowed_dft_matrices), created once per Mel.
        Callers that trace the inverse path inside a larger jitted program
        (pipelines/pipeline._fused_generate_fn) must take these as program
        ARGUMENTS — concrete arrays closed over at trace time become HLO
        constants, which is exactly what this avoids."""
        if self._gl_mats is None:
            from .ops.stft import windowed_dft_matrices

            self._gl_mats = tuple(jax.device_put(m) for m in windowed_dft_matrices(self.n_fft))
        return self._gl_mats

    def _inverse(self, images: jnp.ndarray, key: jax.Array, length: int) -> jnp.ndarray:
        return self._inverse_impl(images, key, length, self.gl_matrices())

    def spectrogram_images_from_audio(
        self, audio: Union[np.ndarray, jnp.ndarray], ref=None
    ) -> jnp.ndarray:
        """Batch of audio slices (B, slice_size) -> uint8 images (B, y_res, x_res).

        ``ref``: None (per-spectrogram max), scalar, or hashable callable —
        see :meth:`audio_slice_to_image`."""
        return self._forward(jnp.asarray(audio), ref=ref)

    def images_to_audio(
        self, images: Union[np.ndarray, jnp.ndarray], key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """Batch of uint8 images (B, y_res, x_res) -> audio (B, (x_res-1)*hop).

        Output length matches librosa's ``mel_to_audio`` (ISTFT default length
        for ``x_res`` centered frames). ``key`` seeds the random Griffin-Lim
        initial phase; default is a fixed key for reproducibility.
        """
        if key is None:
            key = jax.random.key(0)
        images = jnp.asarray(images)
        if images.shape[-2:] != (self.y_res, self.x_res):
            raise ValueError(
                f"expected (..., {self.y_res}, {self.x_res}) mel images for this Mel config, "
                f"got {images.shape}; construct a Mel with matching x_res/y_res"
            )
        length = (self.x_res - 1) * self.hop_length
        return self._inverse(images, key, length)

    @property
    def mel_basis(self) -> np.ndarray:
        return self._mel_basis
