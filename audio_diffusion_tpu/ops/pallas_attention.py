"""Pallas TPU kernel: many-small-heads self-attention without HBM logits.

The reference UNet's attention (diffusers Attention with attention_head_dim=8,
scripts/train_unet.py:115-137) runs 64 heads of dim 8 at 512 channels. The
logits tensor is (B, heads, N, N) — at 256x256 generation that is
8*64*256*256 floats, ~134 MB in f32, written+read twice around the softmax by
any unfused implementation. Measured on the v5e, the attention layers cost
~5 ms of the 35 ms denoise step (ablation: attention->identity saves 14%),
almost all of it this logits traffic.

This kernel keeps the whole (N, N) score matrix per head in VMEM: grid over
(batch, head-tiles), loop heads inside the block, compute QK^T -> softmax ->
PV in registers/VMEM, and write only the (N, d) output. HBM traffic drops
from O(h*N^2) to O(h*N*d) — 16x for d=8 vs N=256.

Applicability: N (tokens) and heads-per-tile such that q/k/v tiles plus one
f32 (N, N) score block fit VMEM. Measured on the v5e: N=1024 (4 MB scores)
compiles and matches the reference; N=2048 (16 MB) fails TPU compilation —
so the dispatch cap is N <= 1024, which covers every resolution this UNet
family attends at (attention sits at /16: 16x16=256 tokens at 256x256,
32x32=1024 at 512x512). Falls back to the jnp reference off-TPU or when
shapes do not qualify.

Training: wrapped in jax.custom_vjp — forward runs the kernel, backward
recomputes with the jnp reference and differentiates through it (attention is
a tiny fraction of the backward FLOPs; correctness gated by tests against
the reference gradient).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One f32 (N, N) score block lives in VMEM per in-flight head. N=1024 (4 MB)
# is the largest measured-working size on the v5e; N=2048 (16 MB) fails to
# compile — larger N dispatches to the jnp reference instead.
MAX_TOKENS = 1024


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain jnp multi-head attention. Layout (B, heads, N, d)."""
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s * (1.0 / np.sqrt(d))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype), v).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    def one_head(i, carry):
        q = q_ref[0, i].astype(jnp.float32)  # (N, d)
        k = k_ref[0, i].astype(jnp.float32)
        v = v_ref[0, i].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (N, N), never leaves VMEM
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o = o / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, i] = o.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, heads, one_head, 0)


def _pick_head_tile(h: int, n: int, d: int, itemsize: int) -> int:
    """Largest head tile (<= 8, dividing h) whose q/k/v/o tiles fit ~4 MB."""
    budget = 4 * 1024 * 1024
    per_head = 4 * n * max(d, 128) * itemsize  # q,k,v,o padded to 128 lanes
    ht = min(h, 8)
    while ht > 1 and (h % ht != 0 or ht * per_head > budget):
        ht -= 1
    return max(ht, 1)


@partial(jax.jit, static_argnames=("interpret",))
def _flash_mha_fwd(q, k, v, interpret=False):
    b, h, n, d = q.shape
    scale = float(1.0 / np.sqrt(d))
    ht = _pick_head_tile(h, n, d, q.dtype.itemsize)
    grid = (b, h // ht)
    spec = pl.BlockSpec((1, ht, n, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_kernel, heads=ht, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


@jax.custom_vjp
def flash_mha(q, k, v):
    """Multi-head attention, layout (B, heads, N, d); softmax scale 1/sqrt(d).
    Off-TPU the kernel runs in interpret mode (tests/debugging)."""
    return _flash_mha_fwd(q, k, v, interpret=not _on_tpu())


def _fwd(q, k, v):
    return _flash_mha_fwd(q, k, v, interpret=not _on_tpu()), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(reference_attention, q, k, v)
    return vjp(g)


flash_mha.defvjp(_fwd, _bwd)


def _on_tpu() -> bool:
    if jax.default_backend() == "tpu":
        return True
    try:
        return "tpu" in str(jax.devices()[0]).lower() or "axon" in str(jax.devices()[0]).lower()
    except Exception:
        return False


def shapes_qualify(n: int, d: int) -> bool:
    """True when the kernel's VMEM budget holds for (N, d) (see MAX_TOKENS)."""
    return n <= MAX_TOKENS and d <= 128 and n % 8 == 0


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU for qualifying shapes, jnp reference
    otherwise. Layout (B, heads, N, d) — same convention and softmax scale as
    ``jax.nn.dot_product_attention`` with (B, N, heads, d) transposed in."""
    b, h, n, d = q.shape
    if _on_tpu() and shapes_qualify(n, d):
        return flash_mha(q, k, v)
    return reference_attention(q, k, v)
