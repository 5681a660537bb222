"""Flax AudioEncoder: audio file -> 100-d conditioning embedding.

TPU-native port of the reference's CNN audio embedder (reference:
audiodiffusion/audio_encoder.py:7-107, itself ported from the author's Deej-AI
project). Architecture: 3x [SeparableConv2d 3x3 -> LeakyReLU(0.2) ->
BatchNorm(eps=1e-3) -> MaxPool 2x2 -> Dropout], channels 1->32->64->128, then
flatten -> Dense 41472->1024 -> LeakyReLU -> BatchNorm -> Dropout(0.5) ->
Dense 1024->100.

Layout note: the torch model permutes NCHW -> NHWC before flattening
(audio_encoder.py:54), so a plain NHWC flatten here matches the torch weight
layout exactly — the importer needs no flatten-order fixup.

Its Mel uses x_res=216, y_res=96 (audio_encoder.py:65-72); slices are scaled
by /255 (NOT to [-1, 1]) before the forward (audio_encoder.py:95). All slices
of all files are batched through one jitted forward here instead of the
reference's per-file loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..mel import Mel
from ..utils.config import ConfigMixin


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig(ConfigMixin):
    channels: tuple = (32, 64, 128)
    dropout_rates: tuple = (0.2, 0.3, 0.4)
    dense_features: int = 1024
    dense_dropout: float = 0.5
    embedding_dim: int = 100
    mel_x_res: int = 216
    mel_y_res: int = 96

    config_name = "config.json"


class SeparableConv2d(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), padding=1, feature_group_count=in_ch, use_bias=False, name="depthwise")(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, name="pointwise")(x)


class ConvBlock(nn.Module):
    out_channels: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConv2d(self.out_channels, name="sep_conv")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        # torch BatchNorm momentum 0.01 == flax momentum 0.99 (they're complements).
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, name="batch_norm")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


class AudioEncoder(nn.Module):
    config: AudioEncoderConfig = AudioEncoderConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, y_res, x_res, 1) mel images scaled to [0, 1] (/255)."""
        cfg = self.config
        for i, (ch, dr) in enumerate(zip(cfg.channels, cfg.dropout_rates)):
            x = ConvBlock(ch, dr, name=f"conv_block_{i}")(x, train)
        x = x.reshape(x.shape[0], -1)  # NHWC flatten == torch permute+flatten
        x = nn.Dense(cfg.dense_features, name="dense")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3, name="dense_norm")(x)
        x = nn.Dropout(cfg.dense_dropout, deterministic=not train)(x)
        return nn.Dense(cfg.embedding_dim, name="embedding")(x)

    def init_variables(self, key: jax.Array):
        x = jnp.zeros((1, self.config.mel_y_res, self.config.mel_x_res, 1))
        return self.init(key, x)

    # ------------------------------------------------------------- inference
    def make_mel(self) -> Mel:
        return Mel(x_res=self.config.mel_x_res, y_res=self.config.mel_y_res)

    def encode(
        self,
        variables,
        audio_files: Sequence[Union[str, np.ndarray]],
        pool: Optional[str] = "average",
        mel: Optional[Mel] = None,
    ) -> jnp.ndarray:
        """Embed audio files (paths or raw arrays) -> (n_files, 100)
        (or (n_files, n_slices, 100) with ``pool=None``; reference:
        audio_encoder.py:84-107). All slices batch through one forward."""
        assert pool in ("average", "max", None), f"Unknown pooling method {pool}"
        mel = mel or self.make_mel()
        slices, counts = [], []
        for f in audio_files:
            if isinstance(f, str):
                mel.load_audio(audio_file=f)
            else:
                mel.load_audio(raw_audio=f)
            n = mel.get_number_of_slices()
            batch = np.stack([mel.get_audio_slice(i) for i in range(n)])
            slices.append(np.asarray(mel.spectrogram_images_from_audio(batch)))
            counts.append(n)
        images = jnp.asarray(np.concatenate(slices), dtype=jnp.float32) / 255.0
        embeddings = self.apply(variables, images[..., None])

        out = []
        start = 0
        for n in counts:
            e = embeddings[start : start + n]
            start += n
            if pool == "average":
                out.append(jnp.mean(e, axis=0))
            elif pool == "max":
                out.append(jnp.max(e, axis=0))
            else:
                out.append(e)
        return jnp.stack(out) if pool is not None else out
