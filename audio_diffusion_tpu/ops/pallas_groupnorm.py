"""Fused GroupNorm + SiLU as a Pallas TPU kernel.

The UNet's denoise step is ~50% memory-bound interludes between convs at high
resolution (BASELINE.md measurements); GroupNorm+SiLU is the biggest of them.
This kernel reads the activation once per pass in its storage dtype (bf16),
accumulates statistics in f32, and writes the normalized+activated result in
one fused pass.

MEASURED OUTCOME (BASELINE.md): on the v5e this kernel reaches 302 GB/s vs
XLA's fused GroupNorm+SiLU at 458 GB/s — XLA's fusion already saturates the
op at bandwidth, so the kernel stays OPT-IN (``UNetConfig.fused_groupnorm``,
default False). It is kept as the template for future fusions that XLA cannot
express (e.g. folding the following conv's im2col read into the normalize
pass) and as the framework's Pallas reference implementation.

Layout note: the channel axis lives in lanes, and Mosaic cannot split lanes
with a reshape, so per-group reductions are expressed as matmuls against a
static one-hot (C, G) group-membership matrix — they ride the MXU instead.

Two phases over a (batch, row-tile) grid:
1. stats: per-(batch, group) sum / sum-of-squares accumulated across row tiles
   (TPU grids execute sequentially, so accumulating into the output ref is
   race-free);
2. apply: normalize, scale/shift, SiLU.

Falls back to a pure-jnp implementation off-TPU (and under interpret mode in
tests).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=16)
def _group_onehot(c: int, groups: int) -> np.ndarray:
    """(C, G) one-hot group membership matrix (static constant)."""
    m = np.zeros((c, groups), dtype=np.float32)
    cs = c // groups
    for g in range(groups):
        m[g * cs : (g + 1) * cs, g] = 1.0
    return m


def _stats_kernel(x_ref, onehot_ref, sums_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    onehot = onehot_ref[...]  # (C, G)
    s = jnp.sum(x, axis=0, keepdims=True) @ onehot  # (1, G)
    s2 = jnp.sum(x * x, axis=0, keepdims=True) @ onehot
    sums_ref[0, 0:1, :] += s
    sums_ref[0, 1:2, :] += s2


def _apply_kernel(x_ref, sums_ref, onehot_ref, scale_ref, bias_ref, o_ref, *, eps: float, count: int):
    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    onehot = onehot_ref[...]  # (C, G)
    s = sums_ref[0, 0:1, :]  # (1, G)
    s2 = sums_ref[0, 1:2, :]
    mean = s / count
    var = s2 / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    # Broadcast per-group stats back to channels: (1, G) @ (G, C).
    mean_c = mean @ onehot.T
    rstd_c = rstd @ onehot.T
    y = (x - mean_c) * rstd_c
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)  # SiLU
    o_ref[0] = y.astype(o_ref.dtype)


def _reference(x, scale, bias, groups: int, eps: float):
    """Pure-jnp fallback with identical semantics (f32 stats, fused SiLU)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean**2
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def fused_group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm (over H, W and the within-group channels) followed by SiLU.

    Args:
        x: (B, H, W, C) activations, any float dtype (bf16 recommended).
        scale, bias: (C,) affine parameters.
    Returns:
        same shape/dtype as ``x``.
    """
    b, h, w, c = x.shape
    if c % groups != 0 or c % 128 != 0:
        # Lane-misaligned or indivisible channels: keep the fused jnp fallback.
        return _reference(x, scale, bias, groups, eps)

    rows_total = h * w
    x2 = x.reshape(b, rows_total, c)
    # Row tile: keep each block comfortably inside VMEM (<= ~1MB).
    tile = rows_total
    max_elems = 1024 * 1024 // 2  # bf16 elements per ~1MB
    while tile * c > max_elems and tile % 2 == 0:
        tile //= 2
    n_tiles = rows_total // tile
    if n_tiles * tile != rows_total:
        return _reference(x, scale, bias, groups, eps)

    count = rows_total * (c // groups)
    onehot = jnp.asarray(_group_onehot(c, groups))
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)

    sums = pl.pallas_call(
        _stats_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, groups), jnp.float32),
        interpret=interpret,
    )(x2, onehot)

    out = pl.pallas_call(
        partial(_apply_kernel, eps=eps, count=count),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows_total, c), x.dtype),
        interpret=interpret,
    )(x2, sums, onehot, scale2, bias2)
    return out.reshape(b, h, w, c)
