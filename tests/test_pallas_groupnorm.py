"""Fused GroupNorm+SiLU Pallas kernel gates (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from audio_diffusion_tpu.ops.pallas_groupnorm import _reference, fused_group_norm_silu


def _golden(x, scale, bias, groups, eps=1e-5):
    """flax GroupNorm + SiLU in f32 as the independent golden."""
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    y = gn.apply({"params": params}, x.astype(jnp.float32))
    return nn.silu(y)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 32), 4), ((1, 16, 16, 64), 8)])
def test_kernel_matches_flax_groupnorm(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 3 + 1
    scale = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
    ours = fused_group_norm_silu(x, scale, bias, groups, interpret=True)
    golden = _golden(x, scale, bias, groups)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)


def test_kernel_bf16_io_f32_stats():
    rng = np.random.default_rng(1)
    x32 = rng.standard_normal((2, 16, 16, 32)).astype(np.float32)
    x = jnp.asarray(x32, dtype=jnp.bfloat16)
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    ours = fused_group_norm_silu(x, scale, bias, 4, interpret=True)
    assert ours.dtype == jnp.bfloat16
    golden = _golden(jnp.asarray(x32), scale, bias, 4)
    # bf16 I/O but f32 statistics: error bounded by bf16 quantization only.
    np.testing.assert_allclose(
        np.asarray(ours, dtype=np.float32), np.asarray(golden), atol=0.05
    )


def test_row_tiling_consistency():
    """Large spatial extent forces multi-tile accumulation; result must match
    the single-pass reference."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 128)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    ours = fused_group_norm_silu(x, scale, bias, 32, interpret=True)
    golden = _golden(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=3e-5)


def test_jnp_fallback_matches_flax():
    """The pure-jnp fallback path must share semantics with flax GroupNorm."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    ours = _reference(x, scale, bias, 4, 1e-5)
    golden = _golden(x, scale, bias, 4)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)
