"""Flax AutoencoderKL for latent audio diffusion.

TPU-native replacement for ``diffusers.AutoencoderKL`` as configured by the
reference's LDM recipe (reference: config/ldm_autoencoder_kl.yaml:18-28 — ch=128,
ch_mult [1,2,4,4], 2 res blocks per level, no encoder attention except the mid
block, double_z; used at scripts/train_unet.py:96-104 and
pipeline_audio_diffusion.py:143-147,187-190). Config keys follow the diffusers
``AutoencoderKL`` JSON so published torch checkpoints import directly
(utils/torch_import.py is the analog of the reference's utils.py LDM converter).

NHWC layout; explicit PRNG keys for the reparameterized sample (the reference
threads a torch ``generator``); latents are scaled by 0.18215 at the call sites.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.config import ConfigMixin


@dataclasses.dataclass(frozen=True)
class VAEConfig(ConfigMixin):
    in_channels: int = 1
    out_channels: int = 1
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)  # ch * ch_mult
    layers_per_block: int = 2
    latent_channels: int = 1
    sample_size: int = 256
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: str = "float32"

    config_name = "config.json"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def num_down(self) -> int:
        return len(self.block_out_channels) - 1

    def latent_hw(self, h: int, w: int) -> Tuple[int, int]:
        f = 2**self.num_down
        return h // f, w // f


class DiagonalGaussian:
    """Latent distribution returned by ``encode`` (diffusers
    ``DiagonalGaussianDistribution`` semantics, logvar clamped to [-30, 20])."""

    def __init__(self, mean: jnp.ndarray, logvar: jnp.ndarray):
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        """KL to N(0, I), summed over non-batch axes."""
        return 0.5 * jnp.sum(self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar, axis=(1, 2, 3))


class VAEResnetBlock(nn.Module):
    """Norms run compute-dtype I/O with f32 statistics (flax GroupNorm's
    force_float32_reductions): in bf16 configs the normalized activations
    feed the convs in bf16 instead of bouncing through f32 — the same
    measured win as the UNet's round-2 norm change (BASELINE.md ledger);
    f32 configs are bit-unchanged (torch-twin parity gates)."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head mid-block attention (LDM AttnBlock / diffusers Attention)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        o = jax.nn.dot_product_attention(q[:, :, None], k[:, :, None], v[:, :, None])[:, :, 0]
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return o.reshape(B, H, W, C) + residual


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = cfg.compute_dtype
        x = x.astype(dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dtype, name="conv_in")(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(out_ch, cfg.norm_num_groups, dtype, name=f"down_{i}_res_{j}")(x)
            if i != len(cfg.block_out_channels) - 1:
                # LDM asymmetric downsample padding ((0,1),(0,1)), stride-2 conv.
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID", dtype=dtype,
                            name=f"down_{i}_downsample")(x)
        mid_ch = cfg.block_out_channels[-1]
        x = VAEResnetBlock(mid_ch, cfg.norm_num_groups, dtype, name="mid_res_0")(x)
        x = VAEAttention(cfg.norm_num_groups, dtype, name="mid_attn")(x)
        x = VAEResnetBlock(mid_ch, cfg.norm_num_groups, dtype, name="mid_res_1")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dtype = cfg.compute_dtype
        x = z.astype(dtype)
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(reversed_ch[0], (3, 3), padding=1, dtype=dtype, name="conv_in")(x)
        x = VAEResnetBlock(reversed_ch[0], cfg.norm_num_groups, dtype, name="mid_res_0")(x)
        x = VAEAttention(cfg.norm_num_groups, dtype, name="mid_attn")(x)
        x = VAEResnetBlock(reversed_ch[0], cfg.norm_num_groups, dtype, name="mid_res_1")(x)
        for i, out_ch in enumerate(reversed_ch):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(out_ch, cfg.norm_num_groups, dtype, name=f"up_{i}_res_{j}")(x)
            if i != len(reversed_ch) - 1:
                # nearest-x2 + conv3x3 as ONE lhs-dilated conv: the broadcast
                # tensor never materializes (see unet2d._DilatedUpConv; same
                # kernel parameters, equivalence tested).
                from .unet2d import _DilatedUpConv

                x = _DilatedUpConv(out_ch, dtype, name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """KL-regularized autoencoder. ``encode`` returns a :class:`DiagonalGaussian`
    (matching the reference's ``vqvae.encode(x).latent_dist`` contract,
    pipeline:143-147); ``decode`` maps latents back to images."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, key: jax.Array, sample_posterior: bool = True):
        posterior = self.encode(x)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(z), posterior

    def init_params(self, key: jax.Array, sample_hw: Tuple[int, int] | None = None):
        h = w = self.config.sample_size
        if sample_hw is not None:
            h, w = sample_hw
        x = jnp.zeros((1, h, w, self.config.in_channels))
        return self.init(key, x, jax.random.key(0))["params"]
