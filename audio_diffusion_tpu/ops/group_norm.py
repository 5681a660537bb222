"""GroupNorm variants tuned for TPU HBM traffic.

The UNet's denoise step is memory-bound between convs (BASELINE.md roofline);
GroupNorm is the biggest interlude. Two observations drive this module:

1. The conv consuming a normalized activation computes in bf16, so the
   normalized tensor is bf16-quantized at the conv input NO MATTER what dtype
   the norm wrote. Writing it in f32 (flax ``nn.GroupNorm(dtype=f32)``) just
   doubles the HBM write+read for bits the conv immediately discards.
   ``group_norm_silu`` computes statistics and the affine in f32 (exactly like
   flax's f32 path, fast-variance E[x^2]-E[x]^2) but emits the activation
   dtype — numerically identical at the consuming conv, half the traffic.

2. The up-path resnets normalize ``concat([x, skip])`` (reference UNet skip
   wiring, scripts/train_unet.py:115-137 architecture). Materializing the
   concatenation costs a full write+read of the doubled tensor per block,
   18 times per UNet step. Group statistics are just per-channel sums, which
   can be computed on the parts and combined — groups that straddle the
   concat boundary included — so ``group_norm_silu`` accepts a LIST of parts
   and returns the normalized virtual concat with the raw concat never
   materialized (VERDICT r1 next-step #2).

Kept as pure jnp: XLA fuses the normalize+silu elementwise pass into one
read-per-part + one write, which a hand-written Pallas kernel measurably
does not beat on this op (BASELINE.md: 458 GB/s XLA vs 302 GB/s Pallas).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp


def group_norm_silu(
    parts: Union[jnp.ndarray, Sequence[jnp.ndarray]],
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float,
    apply_silu: bool = True,
    out_dtype=None,
) -> jnp.ndarray:
    """GroupNorm (+ optional SiLU) over the channel-concatenation of ``parts``.

    Args:
        parts: one (B, H, W, C) array or a sequence of them (same B/H/W);
            normalization is over the virtual ``concat(parts, axis=-1)``.
        scale, bias: (C_total,) affine parameters.
        groups: number of groups; C_total must be divisible by it. Groups may
            straddle part boundaries — statistics are exact either way.
        eps: variance epsilon.
        apply_silu: fuse x*sigmoid(x) into the same pass.
        out_dtype: output dtype; defaults to the parts' dtype.

    Returns:
        (B, H, W, C_total) normalized (and activated) array in ``out_dtype``.
    """
    if isinstance(parts, jnp.ndarray):
        parts = [parts]
    parts = list(parts)
    b, h, w, _ = parts[0].shape
    channels = [p.shape[-1] for p in parts]
    c_total = sum(channels)
    assert c_total % groups == 0, (c_total, groups)
    out_dtype = out_dtype or parts[0].dtype

    # Per-channel sums in f32 (one fused read of each part covers both moments).
    sums = jnp.concatenate(
        [jnp.sum(p.astype(jnp.float32), axis=(1, 2)) for p in parts], axis=-1
    )  # (B, C_total)
    sqs = jnp.concatenate(
        [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=(1, 2)) for p in parts], axis=-1
    )
    gsize = c_total // groups
    count = h * w * gsize
    mean_g = sums.reshape(b, groups, gsize).sum(-1) / count  # (B, G)
    sq_g = sqs.reshape(b, groups, gsize).sum(-1) / count
    var_g = sq_g - jnp.square(mean_g)  # fast variance, like flax use_fast_variance
    rstd_g = jax.lax.rsqrt(var_g + eps)

    # Fold the affine into per-channel a*x + b so the apply pass is one FMA.
    mean_c = jnp.repeat(mean_g, gsize, axis=-1)  # (B, C_total)
    rstd_c = jnp.repeat(rstd_g, gsize, axis=-1)
    scale_f = scale.astype(jnp.float32)
    bias_f = bias.astype(jnp.float32)
    a_c = rstd_c * scale_f  # (B, C_total)
    b_c = bias_f - mean_c * a_c

    outs: List[jnp.ndarray] = []
    off = 0
    for p, ci in zip(parts, channels):
        a = a_c[:, off : off + ci][:, None, None, :]
        bb = b_c[:, off : off + ci][:, None, None, :]
        y = p.astype(jnp.float32) * a + bb
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        outs.append(y.astype(out_dtype))
        off += ci
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
