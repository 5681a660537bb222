"""LPIPS-style perceptual distance from fixed random convolutional features.

The reference's VAE recipe scores reconstructions with LPIPS
(reference: config/ldm_autoencoder_kl.yaml:10-16 -> ldm's
LPIPSWithDiscriminator, which downloads pretrained VGG16 features). Pretrained
VGG weights cannot be fetched in a zero-egress build, so this module provides
the closest implementable equivalent: the LPIPS *architecture and distance
formula* over a fixed randomly-initialized VGG-style feature stack.

Zhang et al. 2018 ("The Unreasonable Effectiveness of Deep Features as a
Perceptual Metric", the LPIPS paper) measured exactly this ablation: random
networks under the LPIPS formula score 2AFC ~82-83% vs ~69% for plain L2/SSIM
on their human-judgement benchmark. Measured caveat (this repo, round 4): the
random-feature stack does NOT reproduce trained-LPIPS' structure-over-noise
preference — on matched-L1 blur-vs-noise probes the conv stacks average i.i.d.
noise away with depth, so blur and noise score nearly equal (d_blur/d_noise ≈
1.0 across widths/depths/bias variants; NLPD behaved the same). It remains a
multi-scale feature distance option, but the property-gated perceptual metric
in this repo is :func:`dssim` below.

:func:`dssim` — structural dissimilarity (1 - SSIM, Wang et al. 2004) with the
paper's defaults (11x11 Gaussian window, sigma 1.5, K1/K2 = 0.01/0.03) — IS
gated on that property: its structure term is local correlation with the
reference, which blur preserves and i.i.d. noise destroys, so equal-L1 noise
scores several times farther than a mild blur on smooth structured images
(tests/test_vae_training.py::test_perceptual_distance_prefers_structure_over_noise).
SSIM is zero-parameter (nothing to pretrain or fetch), symmetric, and
differentiable — the honest zero-egress stand-in for the reference's LPIPS
term (config/ldm_autoencoder_kl.yaml:10-16), and a standard training loss in
its own right (Zhao et al. 2017, "Loss Functions for Image Restoration").

Distance formula (LPIPS, Zhang et al. eq. 1):

    d(a, b) = sum_l mean_hw || unit_norm_c(f_l(a)) - unit_norm_c(f_l(b)) ||_2^2

with uniform channel weights (the paper's "lin" calibration needs human
judgement data; uniform weights are its published uncalibrated variant).

Everything here is pure-functional: ``init_perceptual_params`` builds the
fixed weight tree from a seed, ``perceptual_distance`` is jittable and
differentiable w.r.t. its image arguments (the features are constants).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# VGG16-like stage widths at the five LPIPS tap points (relu1_2 .. relu5_3).
# Halved from VGG's (64,128,256,512,512) to keep the fixed feature stack cheap
# next to the VAE forward it scores. Width was measured NOT to matter for the
# blur-vs-noise ordering property: full VGG widths, added biases, and fewer
# convs per tap all landed at d_blur/d_noise ≈ 1.0 (r4 experiments) — the
# averaging-away of i.i.d. noise with depth is architectural, not a width
# artifact, so the cheap widths stay.
_STAGE_CHANNELS: Sequence[int] = (32, 64, 128, 256, 256)
_CONVS_PER_STAGE: Sequence[int] = (2, 2, 3, 3, 3)


def init_perceptual_params(key: jax.Array, in_channels: int = 1) -> List[List[jnp.ndarray]]:
    """Fixed random He-initialized 3x3 conv kernels, one list per stage.

    Returned leaves are jnp arrays; treat them as constants (never trained).
    """
    params: List[List[jnp.ndarray]] = []
    c_in = in_channels
    for ch, n_convs in zip(_STAGE_CHANNELS, _CONVS_PER_STAGE):
        stage = []
        for _ in range(n_convs):
            key, sub = jax.random.split(key)
            fan_in = 3 * 3 * c_in
            w = jax.random.normal(sub, (3, 3, c_in, ch), jnp.float32)
            stage.append(w * np.sqrt(2.0 / fan_in))
            c_in = ch
        params.append(stage)
    return params


def _features(params: List[List[jnp.ndarray]], x: jnp.ndarray) -> List[jnp.ndarray]:
    """Five feature maps (NHWC), one per stage, stride-2 pooling between stages."""
    taps = []
    for i, stage in enumerate(params):
        if i > 0:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        for w in stage:
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x)
        taps.append(x)
    return taps


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return f * jax.lax.rsqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True) + eps)


def perceptual_distance(params: Any, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between image batches ``a``/``b`` (NHWC, same shape).

    Scalar: mean over batch of the summed per-layer normalized feature MSE.
    Differentiable in ``a`` and ``b``; ``params`` are constants from
    ``init_perceptual_params``.
    """
    fa = _features(params, a)
    fb = _features(params, b)
    total = jnp.float32(0.0)
    for xa, xb in zip(fa, fb):
        diff = _unit_normalize(xa.astype(jnp.float32)) - _unit_normalize(xb.astype(jnp.float32))
        total = total + jnp.mean(jnp.sum(jnp.square(diff), axis=-1))
    return total


# --------------------------------------------------------------------- SSIM
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-0.5 * np.square(x / sigma))
    g /= g.sum()
    return (g[:, None] * g[None, :]).astype(np.float32)


def _depthwise(x: jnp.ndarray, k2d: np.ndarray) -> jnp.ndarray:
    """Per-channel VALID conv with one 2-D kernel (borders cropped, the
    original SSIM implementation's behavior — no padding artifacts)."""
    c = x.shape[-1]
    k = jnp.asarray(k2d)[:, :, None, None] * jnp.eye(c, dtype=k2d.dtype)[None, None]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def dssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Structural dissimilarity ``1 - mean(SSIM)`` between NHWC batches.

    Wang et al. 2004 defaults: 11x11 Gaussian window (sigma 1.5),
    C1=(0.01*R)^2, C2=(0.03*R)^2 with ``data_range`` R = 2 for [-1, 1] model
    images. Windowed moments use VALID conv (borders cropped). Moments are
    deliberately NOT clamped (same choice as tf.image.ssim): the covariance
    and variance are then the same expression when ``a == b``, so
    ``dssim(a, a)`` is ~0 (within XLA fusion reduction-order noise, measured
    ~1e-7) and symmetry holds to the same tolerance; the price is that f32
    moment cancellation in flat regions can push local SSIM marginally above
    1, so the distance can go slightly negative (~1e-3) for near-identical
    smooth images. Zero-parameter, differentiable in both arguments; requires
    H, W >= 11.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _gaussian_window()
    mu_a = _depthwise(a, k)
    mu_b = _depthwise(b, k)
    var_a = _depthwise(a * a, k) - jnp.square(mu_a)
    var_b = _depthwise(b * b, k) - jnp.square(mu_b)
    cov = _depthwise(a * b, k) - mu_a * mu_b
    lum = (2.0 * mu_a * mu_b + c1) / (jnp.square(mu_a) + jnp.square(mu_b) + c1)
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    return 1.0 - jnp.mean(lum * cs)
