"""Batched mel inversion (NNLS) and Griffin-Lim phase retrieval in JAX.

The reference inverts spectrograms on the host CPU with
``librosa.feature.inverse.mel_to_audio`` (reference: audiodiffusion/mel.py:165-167):
NNLS solve of ``mel_basis @ S_lin = S_mel`` followed by 32 iterations of
momentum Griffin-Lim. Both stages here run fully on device:

* NNLS is a fixed-iteration FISTA (accelerated projected gradient) — a static
  ``lax.scan`` whose body is two large matmuls, so the whole solve rides the
  MXU and is batched over every time-frame of every clip at once;
* Griffin-Lim is a ``lax.scan`` over iterations whose body is one ISTFT + one
  STFT (librosa's momentum recursion, momentum = 0.99).

Randomness uses explicit JAX PRNG keys (librosa's ``init='random'`` phase).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .stft import istft, stft


@lru_cache(maxsize=16)
def _nnls_constants(key: tuple) -> tuple:
    """Precompute pseudo-inverse (for the initial point, matching librosa's
    clipped-lstsq init) and the Lipschitz constant of the NNLS gradient."""
    basis = np.frombuffer(key[0], dtype=np.float32).reshape(key[1])
    pinv = np.linalg.pinv(basis.astype(np.float64)).astype(np.float32)
    # Largest eigenvalue of B^T B == squared largest singular value of B.
    smax = np.linalg.svd(basis.astype(np.float64), compute_uv=False)[0]
    return pinv, float(smax**2)


def nnls(basis: np.ndarray, targets: jnp.ndarray, n_iter: int = 80) -> jnp.ndarray:
    """Solve ``min_{x>=0} ||x @ basis.T - targets||^2`` batched over rows.

    Args:
        basis: static (n_mels, n_freq) mel filterbank (numpy; folded into the
            compiled program as a constant).
        targets: (..., n_mels) mel-power vectors.
    Returns:
        (..., n_freq) non-negative linear-power vectors.
    """
    pinv_np, lipschitz = _nnls_constants((basis.tobytes(), basis.shape))
    B = jnp.asarray(basis)
    pinv = jnp.asarray(pinv_np)
    step = 1.0 / lipschitz

    x0 = jnp.maximum(targets @ pinv.T, 0.0)

    def body(carry, _):
        x, y, t = carry
        grad = (y @ B.T - targets) @ B
        x_new = jnp.maximum(y - step * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, y_new, t_new), None

    (x, _, _), _ = jax.lax.scan(body, (x0, x0, jnp.float32(1.0)), None, length=n_iter)
    return x


def griffin_lim(
    magnitude: jnp.ndarray,
    key: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
) -> jnp.ndarray:
    """Momentum Griffin-Lim phase retrieval (librosa.griffinlim semantics).

    Args:
        magnitude: (..., n_frames, n_freq) linear-magnitude spectrogram
            (frames-major, matching :mod:`.stft`).
        key: PRNG key for the random initial phase.
    Returns:
        real audio, shape (..., length or (n_frames - 1) * hop_length).
    """
    phase = jnp.exp(2j * jnp.pi * jax.random.uniform(key, magnitude.shape))
    angles = phase.astype(jnp.complex64)
    mag = magnitude.astype(jnp.float32)
    beta = momentum / (1.0 + momentum)

    def body(carry, _):
        angles, rebuilt_prev = carry
        inverse = istft(mag * angles, n_fft, hop_length, length=length)
        rebuilt = stft(inverse, n_fft, hop_length)
        new_angles = rebuilt - beta * rebuilt_prev
        new_angles = new_angles / (jnp.abs(new_angles) + 1e-16)
        return (new_angles, rebuilt), None

    init = (angles, jnp.zeros_like(angles))
    (angles, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    return istft(mag * angles, n_fft, hop_length, length=length)


def mel_to_audio(
    mel_power: jnp.ndarray,
    mel_basis: np.ndarray,
    key: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_iter: int = 32,
    nnls_iter: int = 80,
    length: int | None = None,
) -> jnp.ndarray:
    """Full mel-power -> audio inversion (librosa ``mel_to_audio`` equivalent).

    Args:
        mel_power: (..., n_frames, n_mels) mel-power spectrogram (frames-major).
        mel_basis: (n_mels, n_fft//2+1) filterbank.
    """
    linear_power = nnls(mel_basis, mel_power, n_iter=nnls_iter)
    magnitude = jnp.sqrt(jnp.maximum(linear_power, 0.0))  # power=2.0 -> amplitude
    return griffin_lim(magnitude, key, n_fft, hop_length, n_iter, length=length)
