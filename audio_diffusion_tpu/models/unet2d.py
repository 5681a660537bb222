"""Flax UNet2D for mel-spectrogram diffusion (unconditional + cross-attention).

TPU-native replacement for ``diffusers.UNet2DModel`` / ``UNet2DConditionModel``
(reference: scripts/train_unet.py:115-159, pipeline_audio_diffusion.py:160-163).
The architecture graph mirrors the diffusers one exactly — block wiring, skip
ordering, GroupNorm placement, attention residuals — so published torch
checkpoints can be imported layer-for-layer (see utils/torch_import.py), but
the implementation is idiomatic Flax:

* NHWC layout throughout (TPU conv-native; torch import transposes once);
* attention uses ``jax.nn.dot_product_attention`` over flattened H*W tokens;
* compute dtype is configurable (bf16 on TPU) with f32 parameters;
* optional ``remat`` wraps each down/up block in ``jax.checkpoint`` to trade
  FLOPs for HBM during training.

Default configs reproduce the reference's two trained architectures:
``unconditional_config()`` = train_unet.py:115-137 and
``conditional_config()`` = train_unet.py:140-159.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.group_norm import group_norm_silu
from ..ops.pallas_attention import multi_head_attention
from ..ops.pallas_groupnorm import fused_group_norm_silu
from ..utils.config import ConfigMixin


# --------------------------------------------------------------------- config

@dataclasses.dataclass(frozen=True)
class UNetConfig(ConfigMixin):
    sample_size: Tuple[int, int] = (256, 256)
    in_channels: int = 1
    out_channels: int = 1
    layers_per_block: int = 2
    block_out_channels: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
        "AttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
    )
    attention_head_dim: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: Optional[int] = None  # set -> conditional UNet
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"
    norm_dtype: str = "float32"  # LEGACY, ignored: GroupNorms now always use
    # f32 statistics with compute-dtype I/O (ops/group_norm.py) — numerically
    # identical at the consuming conv's input, half the HBM traffic of the old
    # f32-output path, none of the old bf16-stats drift
    fused_groupnorm: bool = False  # Pallas fused GroupNorm+SiLU (bf16 I/O,
    # f32 stats) on the resnet norms — inference-time optimization; the Pallas
    # path has no VJP, so leave False for training
    fold_skip_concat: bool = False  # normalize [x, skip] piecewise so the raw
    # up-path concat is never materialized (ops/group_norm.py rationale #2).
    # MEASURED OFF: on the v5e the piecewise-stats path costs ~1 ms/step MORE
    # than materializing the concat (XLA fuses the concat into the stats read
    # better than the two-part reduction graph); kept opt-in as the template
    # for larger-channel architectures where the concat write dominates
    dilated_upsample: bool = True  # nearest-x2 + 3x3 conv expressed as ONE
    # lhs-dilated 4x4 conv: the 2x-broadcast tensor is never materialized
    remat: bool = False

    config_name = "config.json"

    def __post_init__(self):
        if self.norm_dtype != "float32":
            import logging

            logging.getLogger("audio_diffusion_tpu.models").warning(
                "UNetConfig.norm_dtype=%r is legacy and ignored: GroupNorms always "
                "run f32 statistics with compute-dtype I/O now (numerically identical "
                "at the conv input, and faster than the old bf16-stats opt-in).",
                self.norm_dtype,
            )

    @property
    def is_conditional(self) -> bool:
        return self.cross_attention_dim is not None

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    def sample_hw(self) -> Tuple[int, int]:
        s = self.sample_size
        return (s, s) if isinstance(s, int) else tuple(s)


def unconditional_config(sample_size=(256, 256), in_channels=1, out_channels=1, **kw) -> UNetConfig:
    """The reference's unconditional architecture (train_unet.py:115-137)."""
    return UNetConfig(sample_size=sample_size, in_channels=in_channels, out_channels=out_channels, **kw)


def conditional_config(sample_size=(256, 256), in_channels=1, out_channels=1, cross_attention_dim=100, **kw) -> UNetConfig:
    """The reference's conditional architecture (train_unet.py:140-159)."""
    return UNetConfig(
        sample_size=sample_size,
        in_channels=in_channels,
        out_channels=out_channels,
        block_out_channels=(128, 256, 512, 512),
        down_block_types=(
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        up_block_types=(
            "UpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
        ),
        cross_attention_dim=cross_attention_dim,
        **kw,
    )


# ----------------------------------------------------------------- embeddings

def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``get_timestep_embedding`` math)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


# --------------------------------------------------------------------- blocks

class FusedGroupNormSiLU(nn.Module):
    """GroupNorm+SiLU via the Pallas kernel; parameter tree matches
    nn.GroupNorm (scale/bias) so checkpoints are interchangeable."""

    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if jax.default_backend() != "tpu" and "axon" not in str(jax.devices()[0]).lower():
            from ..ops.pallas_groupnorm import _reference

            return _reference(x, scale, bias, self.groups, self.eps)
        return fused_group_norm_silu(x, scale, bias, self.groups, self.eps)


class GroupNorm(nn.Module):
    """GroupNorm in the compute dtype with f32 statistics, optionally over the
    channel parts of a virtual concat. Parameter tree matches nn.GroupNorm
    (scale/bias) so checkpoints are interchangeable.

    Single-part path: flax ``nn.GroupNorm(dtype=compute)`` via share_scope —
    flax forces f32 reductions internally (normalization.py
    force_float32_reductions), and XLA fuses its exact graph best (measured:
    34.4 ms/step vs 36.5-37.0 for two hand-written f32-stats formulations on
    the 256x256 UNet). Emitting the compute dtype halves the write+read vs
    the old f32-output path; the only numeric delta is one bf16 rounding
    before SiLU instead of after — the consuming conv quantizes to bf16
    either way.

    Multi-part path (fold_skip_concat): piecewise statistics via
    ops/group_norm.py so the raw concat never materializes."""

    groups: int = 32
    eps: float = 1e-5
    silu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts):
        if isinstance(parts, jnp.ndarray):
            parts = [parts]
        if len(parts) > 1:
            # Exactly one path runs, so the params are created once either way
            # (same names/shapes as nn.GroupNorm's).
            c = sum(p.shape[-1] for p in parts)
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return group_norm_silu(parts, scale, bias, self.groups, self.eps,
                                   apply_silu=self.silu, out_dtype=self.dtype)
        gn = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype)
        nn.share_scope(self, gn)
        y = gn(parts[0])
        if self.silu:
            y = nn.silu(y)
        return y.astype(self.dtype)


class PointwiseConv(nn.Module):
    """1x1 conv that accepts the channel parts of a virtual concat, so the
    raw concat is never materialized: conv(concat(parts)) == sum of per-part
    convs with the kernel sliced along its input axis. Parameter tree matches
    nn.Conv (kernel (1,1,C,out) + bias)."""

    features: int
    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.in_channels, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel[0, 0].astype(self.dtype)  # (C, out)
        acc = None
        off = 0
        for p in parts:
            ci = p.shape[-1]
            y = jnp.einsum("bhwc,co->bhwo", p.astype(self.dtype), k[off : off + ci])
            acc = y if acc is None else acc + y
            off += ci
        return acc + bias.astype(self.dtype)


class ResnetBlock2D(nn.Module):
    """Pre-norm ResNet block. ``skip`` (the UNet up-path skip tensor) is taken
    as a separate argument instead of a pre-concatenated input: norm1 and the
    shortcut consume the parts directly (fold_skip_concat), so the raw
    ``concat([x, skip])`` — a full write+read of the doubled tensor — never
    touches HBM."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    fused_norm: bool = False

    @nn.compact
    def __call__(self, x, temb, skip=None):
        parts = [x] if skip is None else [x, skip]
        in_channels = sum(p.shape[-1] for p in parts)

        if self.fused_norm and skip is None:
            h = FusedGroupNormSiLU(self.groups, self.eps, name="norm1")(x.astype(self.dtype))
        else:
            h = GroupNorm(self.groups, self.eps, silu=True, dtype=self.dtype, name="norm1")(parts)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)

        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]

        if self.fused_norm:
            h = FusedGroupNormSiLU(self.groups, self.eps, name="norm2")(h.astype(self.dtype))
        else:
            h = GroupNorm(self.groups, self.eps, silu=True, dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            res = PointwiseConv(self.out_channels, in_channels, self.dtype, name="conv_shortcut")(parts)
        else:
            res = x if skip is None else jnp.concatenate(parts, axis=-1)
        return res + h


class SelfAttention2D(nn.Module):
    """Spatial self-attention over H*W tokens with a residual connection
    (diffusers ``Attention`` as used by Attn{Down,Up}Block2D / mid blocks)."""

    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        num_heads = max(C // self.head_dim, 1)
        residual = x
        h = GroupNorm(self.groups, self.eps, silu=False, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # (B, heads, N, d) for the Pallas many-small-heads kernel: with the
        # diffusers head convention (64 heads of dim 8 at 512 ch) the logits
        # are the UNet's single biggest HBM interlude (ops/pallas_attention.py).
        hd = C // num_heads
        q = q.reshape(B, H * W, num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, H * W, num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, H * W, num_heads, hd).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return o.reshape(B, H, W, C) + residual


class CrossAttention(nn.Module):
    """Multi-head attention where K/V may come from an encoder sequence."""

    query_dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        B, N, _ = x.shape
        M = context.shape[1]
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        q = q.reshape(B, N, self.num_heads, self.head_dim)
        k = k.reshape(B, M, self.num_heads, self.head_dim)
        v = v.reshape(B, M, self.num_heads, self.head_dim)
        o = jax.nn.dot_product_attention(q, k, v)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(o.reshape(B, N, inner))


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # Exact (erf) gelu: diffusers GEGLU uses torch F.gelu's default, not
        # the tanh approximation (checkpoint-parity; gated by the torch-twin
        # conditional test at atol 1e-4).
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class TransformerBlock(nn.Module):
    """BasicTransformerBlock: self-attn -> cross-attn -> GEGLU FF, pre-LN."""

    dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.dim, self.num_heads, self.head_dim, self.dtype, name="attn1")(
            nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        )
        x = x + CrossAttention(self.dim, self.num_heads, self.head_dim, self.dtype, name="attn2")(
            nn.LayerNorm(dtype=jnp.float32, name="norm2")(x), context
        )
        x = x + FeedForwardGEGLU(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=jnp.float32, name="norm3")(x)
        )
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GroupNorm -> proj_in -> transformer block(s) -> proj_out,
    with a residual connection (diffusers Transformer2DModel, 1 block).
    The input GroupNorm epsilon is fixed at 1e-6 (diffusers hardcodes it;
    UNetConfig.norm_eps intentionally does not apply here)."""

    num_heads: int
    head_dim: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = GroupNorm(self.groups, 1e-6, silu=False, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        h = TransformerBlock(C, self.num_heads, self.head_dim, self.dtype, name="transformer_blocks_0")(h, context)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv")(x)


class _DilatedUpConv(nn.Module):
    """nearest-x2 upsample + 3x3 conv as ONE lhs-dilated conv.

    ``conv3x3(nearest_up2(x))`` reads x, writes the 4x-size broadcast, then
    the conv reads it again — two full passes of the upsampled tensor. The
    same function is exactly a 4x4 conv on the ORIGINAL x with lhs_dilation=2
    and padding (2, 2): even output rows 2m read x[m-1]*K0 + x[m]*(K1+K2),
    odd rows 2m+1 read x[m]*(K0+K1) + x[m+1]*K2, so the 3-tap kernel folds
    into 4 taps ``[K0, K0+K1, K1+K2, K2]`` per axis (equivalence verified
    numerically in tests). Parameter tree matches nn.Conv with the original
    (3, 3, C, out) kernel, so checkpoints are unchanged."""

    features: int
    dtype: jnp.dtype = jnp.float32

    # Tap-combination matrix: k4[r] = sum_u M[r, u] * k3[u].
    _M = np.array([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], np.float32)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        m = jnp.asarray(self._M)
        k4 = jnp.einsum("ru,cv,uvio->rcio", m, m, kernel.astype(jnp.float32)).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k4,
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    dilated: bool = True

    @nn.compact
    def __call__(self, x):
        if self.dilated:
            return _DilatedUpConv(self.out_channels, self.dtype, name="conv")(x)
        B, H, W, C = x.shape
        # Nearest-neighbor x2 as broadcast+reshape (cheaper than generic resize).
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C)).reshape(B, H * 2, W * 2, C)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


@jax.custom_vjp
def _conv3x3_f32_out(x, kernel):
    """3x3 conv over compute-dtype operands that accumulates and emits f32."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv3x3_f32_out_fwd(x, kernel):
    return _conv3x3_f32_out(x, kernel), (x, kernel)


def _conv3x3_f32_out_bwd(res, dy):
    # JAX cannot transpose a mixed-dtype conv (bf16 operands, f32
    # preferred_element_type output): the transpose rule would convolve the
    # f32 cotangent against the bf16 kernel and reject the dtype mix. Round
    # the cotangent to the compute dtype and differentiate the same-dtype
    # conv instead — the forward's f32 accumulation only affects output
    # rounding, so the gradients agree to compute-dtype precision.
    x, kernel = res
    conv = lambda x_, k_: jax.lax.conv_general_dilated(
        x_, k_, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    _, vjp = jax.vjp(conv, x, kernel)
    return vjp(dy.astype(x.dtype))


_conv3x3_f32_out.defvjp(_conv3x3_f32_out_fwd, _conv3x3_f32_out_bwd)


class _F32AccumConv(nn.Module):
    """3x3 conv that reads its input in the compute dtype but accumulates and
    emits f32 (preferred_element_type) — full-precision epsilon prediction at
    half the input traffic of an f32-input conv. Parameter tree matches
    nn.Conv (kernel/bias)."""

    features: int

    @nn.compact
    def __call__(self, x, dtype):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = _conv3x3_f32_out(x.astype(dtype), kernel.astype(dtype))
        return y + bias.astype(jnp.float32)


# ----------------------------------------------------------------------- UNet

class UNet2D(nn.Module):
    """Unified unconditional/conditional UNet; ``config.cross_attention_dim``
    selects CrossAttn block behavior (reference: train_unet.py:115-159)."""

    config: UNetConfig

    def _heads(self, channels: int) -> Tuple[int, int]:
        """Self-attention (UNet2DModel Attention): attention_head_dim is the
        per-head dim -> (channels // head_dim) heads."""
        head_dim = self.config.attention_head_dim
        return max(channels // head_dim, 1), head_dim

    def _cross_heads(self, channels: int) -> Tuple[int, int]:
        """Cross-attention blocks (UNet2DConditionModel quirk, diffusers
        0.12-0.24): ``attention_head_dim`` actually means the NUMBER of heads
        for Transformer2DModel (num_attention_heads = attention_head_dim,
        head dim = channels // heads) — the opposite of the self-attention
        convention. Getting this wrong passes every shape check but changes
        the head partitioning and softmax scale of imported checkpoints."""
        num_heads = self.config.attention_head_dim
        return num_heads, max(channels // num_heads, 1)

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states=None):
        """Args:
            sample: (B, H, W, C) noisy images, NHWC.
            timesteps: scalar or (B,) diffusion timesteps.
            encoder_hidden_states: (B, seq, cross_attention_dim) conditioning
                (reference: pipeline_audio_diffusion.py:107,160-161).
        Returns:
            (B, H, W, out_channels) model prediction (epsilon by default).
        """
        cfg = self.config
        dtype = cfg.compute_dtype
        fused = cfg.fused_groupnorm
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        if cfg.is_conditional and encoder_hidden_states is None:
            raise ValueError("conditional UNet requires encoder_hidden_states")
        factor = 2 ** (len(cfg.block_out_channels) - 1)
        if sample.shape[1] % factor or sample.shape[2] % factor:
            raise ValueError(
                f"sample spatial dims {sample.shape[1:3]} must be divisible by "
                f"{factor} (2^(num_blocks-1)) or the up-path skip shapes break; "
                f"use a shallower UNet or a VAE with fewer downsamples"
            )
        # Attention feasibility: a level attending over N tokens materializes
        # (or at minimum computes) N^2 logits per head. The conditional
        # architecture places cross-attn in the FIRST block (reference:
        # train_unet.py:146-150), which at 256x256 pixel space means
        # 65536^2 logits (~17 GB per head-batch in f32) — the reference only
        # ever trains that architecture over VAE latents (its published
        # conditional models are `conditional-latent-*`, README.md:209-218).
        # Fail with the fix instead of an opaque multi-GB XLA allocation error.
        max_tokens = 16384  # 128x128; the Pallas kernel caps at 1024, the jnp
        # fallback materializes logits — 16k tokens (2 GB logits/head-batch)
        # is the practical HBM limit either way.
        levels = list(zip(cfg.down_block_types, reversed(cfg.up_block_types)))
        deepest = len(cfg.block_out_channels) - 1
        for i, bt in enumerate(levels + [("mid-attention", "mid-attention")]):
            i = min(i, deepest)  # the mid block runs at the deepest level
            if any("ttn" in b for b in bt):
                tokens = (sample.shape[1] >> i) * (sample.shape[2] >> i)
                if tokens > max_tokens:
                    raise ValueError(
                        f"{'/'.join(set(bt))} at level {i} would attend over {tokens} "
                        f"tokens for input {sample.shape[1]}x{sample.shape[2]} — "
                        f"infeasible ({tokens}^2 logits/head). Train this "
                        f"architecture over VAE latents instead (train_unet "
                        f"--vae, the reference's conditional-latent recipe) or "
                        f"reduce the resolution."
                    )
        if encoder_hidden_states is not None:
            encoder_hidden_states = encoder_hidden_states.astype(dtype)

        temb = timestep_embedding(timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype=dtype, name="time_embedding")(temb)

        x = sample.astype(dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dtype, name="conv_in")(x)

        maybe_remat = nn.remat if cfg.remat else (lambda m, **kw: m)
        Res = maybe_remat(ResnetBlock2D)
        Attn = maybe_remat(SelfAttention2D)
        Xfmr = maybe_remat(Transformer2D, static_argnums=())

        skips = [x]
        # ---------------------------------------------------------- down path
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            for j in range(cfg.layers_per_block):
                x = Res(out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype, fused, name=f"down_{i}_res_{j}")(x, temb)
                if block_type == "AttnDownBlock2D":
                    heads, hd = self._heads(out_ch)
                    x = Attn(hd, cfg.norm_num_groups, cfg.norm_eps, dtype, name=f"down_{i}_attn_{j}")(x)
                elif block_type == "CrossAttnDownBlock2D":
                    heads, hd = self._cross_heads(out_ch)
                    x = Xfmr(heads, hd, cfg.norm_num_groups, dtype, name=f"down_{i}_xattn_{j}")(
                        x, encoder_hidden_states
                    )
                skips.append(x)
            if not is_final:
                x = Downsample2D(out_ch, dtype, name=f"down_{i}_downsample")(x)
                skips.append(x)

        # ----------------------------------------------------------- mid block
        mid_ch = cfg.block_out_channels[-1]
        x = Res(mid_ch, cfg.norm_num_groups, cfg.norm_eps, dtype, fused, name="mid_res_0")(x, temb)
        if cfg.is_conditional:
            heads, hd = self._cross_heads(mid_ch)
            x = Xfmr(heads, hd, cfg.norm_num_groups, dtype, name="mid_xattn")(
                x, encoder_hidden_states
            )
        else:
            heads, hd = self._heads(mid_ch)
            x = Attn(hd, cfg.norm_num_groups, cfg.norm_eps, dtype, name="mid_attn")(x)
        x = Res(mid_ch, cfg.norm_num_groups, cfg.norm_eps, dtype, fused, name="mid_res_1")(x, temb)

        # ------------------------------------------------------------ up path
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                if cfg.fold_skip_concat:
                    x = Res(out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype, fused,
                            name=f"up_{i}_res_{j}")(x, temb, skip)
                else:
                    x = jnp.concatenate([x, skip], axis=-1)
                    x = Res(out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype, fused,
                            name=f"up_{i}_res_{j}")(x, temb)
                if block_type == "AttnUpBlock2D":
                    heads, hd = self._heads(out_ch)
                    x = Attn(hd, cfg.norm_num_groups, cfg.norm_eps, dtype, name=f"up_{i}_attn_{j}")(x)
                elif block_type == "CrossAttnUpBlock2D":
                    heads, hd = self._cross_heads(out_ch)
                    x = Xfmr(heads, hd, cfg.norm_num_groups, dtype, name=f"up_{i}_xattn_{j}")(
                        x, encoder_hidden_states
                    )
            if not is_final:
                x = Upsample2D(out_ch, dtype, cfg.dilated_upsample, name=f"up_{i}_upsample")(x)

        # ---------------------------------------------------------------- out
        # Final norm emits compute dtype; the conv reads bf16 but accumulates
        # in f32 (preferred_element_type) so the epsilon prediction keeps full
        # output precision at half the input traffic.
        x = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, silu=True, dtype=dtype, name="conv_norm_out")(x)
        x = _F32AccumConv(cfg.out_channels, name="conv_out")(x, dtype)
        return x.astype(jnp.float32)

    def init_params(self, key: jax.Array, batch_size: int = 1):
        h, w = self.config.sample_hw()
        sample = jnp.zeros((batch_size, h, w, self.config.in_channels))
        t = jnp.zeros((batch_size,), dtype=jnp.int32)
        enc = (
            jnp.zeros((batch_size, 1, self.config.cross_attention_dim))
            if self.config.is_conditional
            else None
        )
        return self.init(key, sample, t, enc)["params"]
