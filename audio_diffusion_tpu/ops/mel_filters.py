"""Slaney mel filterbank and dB conversion, implemented from the definitions.

The reference uses ``librosa.feature.melspectrogram`` / ``power_to_db`` /
``db_to_power`` (reference: audiodiffusion/mel.py:145-164) with librosa
defaults: Slaney-scale mel frequencies (``htk=False``), Slaney area
normalization (``norm='slaney'``), fmin=0, fmax=sr/2. On TPU the filterbank is
a precomputed ``(n_mels, n_fft//2 + 1)`` matrix so mel projection is one
matmul that lands on the MXU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Slaney auditory-toolbox mel scale constants.
_F_SP = 200.0 / 3.0  # Hz per mel below the break
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0

AMIN = 1e-10  # librosa power_to_db amin default


def hz_to_mel(frequencies: np.ndarray) -> np.ndarray:
    f = np.asarray(frequencies, dtype=np.float64)
    mels = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mels = np.where(log_region, _MIN_LOG_MEL + np.log(np.maximum(f, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOGSTEP, mels)
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    m = np.asarray(mels, dtype=np.float64)
    freqs = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    freqs = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (np.maximum(m, _MIN_LOG_MEL) - _MIN_LOG_MEL)), freqs)
    return freqs


@lru_cache(maxsize=16)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular Slaney-normalized mel filterbank, shape (n_mels, n_fft//2 + 1)."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    mel_pts = np.linspace(hz_to_mel(np.array(fmin)), hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization: each filter integrates to ~2/bandwidth.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def power_to_db(S: jnp.ndarray, top_db: float = 80.0, ref=None) -> jnp.ndarray:
    """librosa ``power_to_db(S, ref, top_db)`` over the trailing 2 axes.

    ``ref=None`` means ``ref=np.max`` (the per-spectrogram maximum — the
    reference's default, audiodiffusion/mel.py:135,148): output peaks at 0 dB
    and floors at ``-top_db``. A scalar ``ref`` shifts by ``10*log10(ref)``
    and floors at ``max - top_db``, matching librosa exactly. A CALLABLE
    ``ref`` is applied to each spectrogram's power matrix and its |value|
    used as the reference (librosa's ``ref_value = np.abs(ref(S))``,
    audiodiffusion/mel.py:135 takes ``Union[float, Callable]``); it must
    accept a jax array — numpy reducers like ``np.max``/``np.mean`` duck-type
    through. Batched: reduction axes are the last two (one spectrogram).
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, AMIN))
    if ref is None:
        ref_db = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    elif callable(ref):
        per_spec = jax.vmap(lambda s: jnp.abs(ref(s)))(S.reshape((-1,) + S.shape[-2:]))
        ref_val = per_spec.reshape(S.shape[:-2] + (1, 1))
        ref_db = 10.0 * jnp.log10(jnp.maximum(ref_val, AMIN))
    else:
        ref_db = 10.0 * jnp.log10(jnp.maximum(jnp.float32(abs(ref)), AMIN))
    log_spec = log_spec - ref_db
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    return jnp.maximum(log_spec, peak - top_db)


def db_to_power(S_db: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, 0.1 * S_db)


def db_to_uint8(log_S: jnp.ndarray, top_db: float) -> jnp.ndarray:
    """Exact reference quantization (audiodiffusion/mel.py:149): the uint8 image
    IS the data format the models are trained on, so the ``+0.5``-then-truncate
    rounding must be preserved bit-for-bit."""
    bytedata = jnp.clip((log_S + top_db) * 255.0 / top_db, 0.0, 255.0) + 0.5
    return bytedata.astype(jnp.uint8)


def uint8_to_db(bytedata: jnp.ndarray, top_db: float) -> jnp.ndarray:
    """Exact reference dequantization (audiodiffusion/mel.py:163)."""
    return bytedata.astype(jnp.float32) * top_db / 255.0 - top_db
