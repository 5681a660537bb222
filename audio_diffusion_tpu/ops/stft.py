"""Batched STFT / ISTFT in pure JAX, following librosa conventions.

The reference delegates all spectrogram math to librosa on the host CPU
(reference: audiodiffusion/mel.py:145-167). Here the transform is a batched,
jit-compiled device computation:

* framing is a single gather with a precomputed static index matrix — no
  data-dependent shapes, so XLA tiles it freely;
* the FFT runs as ``jnp.fft.rfft`` over the last axis (XLA-native on TPU);
* overlap-add in the inverse is a scatter-add (``.at[].add``) which XLA lowers
  to an efficient dynamic-update loop on TPU.

Conventions matched to librosa 0.10 (the pinned reference dependency):
``center=True`` zero-padding (``pad_mode="constant"``), periodic Hann window,
``win_length == n_fft``, one-sided FFT, and squared-window-sum normalization
in the inverse with librosa's tiny-threshold guard.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window, identical to scipy ``get_window('hann', n, fftbins=True)``."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


@lru_cache(maxsize=32)
def _frame_indices(num_samples: int, n_fft: int, hop_length: int) -> np.ndarray:
    """Static (n_frames, n_fft) gather indices into the center-padded signal."""
    padded = num_samples + 2 * (n_fft // 2)
    n_frames = 1 + (padded - n_fft) // hop_length
    starts = np.arange(n_frames, dtype=np.int32) * hop_length
    return starts[:, None] + np.arange(n_fft, dtype=np.int32)[None, :]


def num_frames(num_samples: int, n_fft: int, hop_length: int) -> int:
    """Number of STFT frames for a centered transform of ``num_samples`` samples."""
    return 1 + (num_samples + 2 * (n_fft // 2) - n_fft) // hop_length


def frame(audio: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-pad and frame a batch of signals: (B, T) -> (B, n_frames, n_fft).

    When ``hop_length`` divides ``n_fft`` (the reference's 2048/512 case),
    framing is R = n_fft/hop stacked contiguous slices of a hop-chunked view —
    no gather, so XLA lowers it to plain copies that fuse with the window
    multiply. Falls back to a static-index gather otherwise.
    """
    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)])
    n_frames = num_frames(audio.shape[-1], n_fft, hop_length)
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        need = (n_frames + r - 1) * hop_length
        if x.shape[-1] < need:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - x.shape[-1])])
        chunks = x[..., :need].reshape(*x.shape[:-1], -1, hop_length)  # (..., n_chunks, hop)
        parts = [chunks[..., i : i + n_frames, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = jnp.asarray(_frame_indices(audio.shape[-1], n_fft, hop_length))
    return jnp.take(x, idx, axis=-1)


def stft(
    audio: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched short-time Fourier transform.

    Args:
        audio: real signal, shape (..., T).
    Returns:
        complex64 spectrogram, shape (..., n_frames, n_fft // 2 + 1).
        NOTE: frames-major layout (time, freq) — the transpose of librosa's
        (freq, time) — because the FFT axis must be the minor axis on TPU.
    """
    if window is None:
        window = jnp.asarray(hann_window(n_fft), dtype=audio.dtype)
    frames = frame(audio, n_fft, hop_length) * window
    return jnp.fft.rfft(frames, axis=-1)


def overlap_add_normalize(
    frames: jnp.ndarray,
    hop_length: int,
    length: int | None = None,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """Windowed ISTFT frames -> signal: overlap-add, squared-window-sum
    normalization, center-crop — the transform-independent tail of
    :func:`istft`, shared by the DFT-matmul synthesis path
    (:func:`windowed_dft_matrices`, used in ops.griffin_lim).

    Args:
        frames: already-windowed time-domain frames (..., n_frames, n_fft).
        length: output length; defaults to librosa's ``(n_frames - 1) * hop``.
    Returns:
        real signal, shape (..., length).
    """
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    window_np = hann_window(n_fft) if window is None else np.asarray(window, dtype=np.float64)

    pad = n_fft // 2
    full = (n_frames - 1) * hop_length + n_fft
    starts = np.arange(n_frames, dtype=np.int32) * hop_length

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))
    if n_fft % hop_length == 0:
        # Overlap-add as R shifted adds of contiguous hop-chunks (no scatter):
        # frame f's chunk r lands at output chunk f + r.
        r_factor = n_fft // hop_length
        chunked = flat.reshape(flat.shape[0], n_frames, r_factor, hop_length)
        acc = jnp.zeros((flat.shape[0], n_frames + r_factor - 1, hop_length), dtype=frames.dtype)
        for r in range(r_factor):
            acc = acc.at[:, r : r + n_frames, :].add(chunked[:, :, r, :])
        out = acc.reshape(flat.shape[0], -1)[:, :full]
    else:
        idx = jnp.asarray(starts[:, None] + np.arange(n_fft, dtype=np.int32)[None, :])
        out = jnp.zeros((flat.shape[0], full), dtype=frames.dtype)
        out = out.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))

    # Squared-window sum normalization (librosa.filters.window_sumsquare), with
    # librosa's guard: only divide where the sum exceeds float tiny.
    wss = np.zeros((full,), dtype=np.float64)
    w2 = window_np ** 2  # normalize by the window actually applied
    for s in starts:
        wss[s : s + n_fft] += w2
    tiny = np.finfo(np.float32).tiny
    inv_wss = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0).astype(np.float32)
    out = out * jnp.asarray(inv_wss)

    if length is None:
        length = (n_frames - 1) * hop_length
    out = out[:, pad : pad + length]
    return out.reshape(batch_shape + (length,))


def istft(
    spec: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    length: int | None = None,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """Batched inverse STFT with squared-window overlap-add normalization.

    Args:
        spec: complex spectrogram, shape (..., n_frames, n_fft // 2 + 1)
            (frames-major, matching :func:`stft`).
        length: output length; defaults to librosa's ``(n_frames - 1) * hop``.
    Returns:
        real signal, shape (..., length).
    """
    window_np = hann_window(n_fft) if window is None else np.asarray(window, dtype=np.float64)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * jnp.asarray(window_np, dtype=jnp.float32)
    return overlap_add_normalize(frames, hop_length, length=length, window=window_np)


@lru_cache(maxsize=8)
def windowed_dft_matrices(n_fft: int) -> tuple:
    """Real one-sided DFT synthesis/analysis matrices with the periodic Hann
    window folded in, for running ISTFT/STFT per-frame transforms as plain
    matmuls on the MXU.

    Rationale (measured on TPU v5e, n_fft=2048): XLA's native FFT lowering
    costs ~6 ms per (16, 512, 1025) irfft+rfft pair, while the mathematically
    identical dense DFT matmul costs ~1.7 ms — the systolic array beats the
    FFT's O(N log N) advantage at this size. Griffin-Lim's projection loop
    (32 such pairs per inversion; reference: audiodiffusion/mel.py:165-167)
    uses these for its inner iterations; see ops.griffin_lim.griffin_lim.

    Returns (IRr, IRi, FWr, FWi) float32 numpy arrays such that, for a
    one-sided spectrum split into real/imag parts (r, i) of shape
    (..., n_fft//2+1):

    * ``r @ IRr + i @ IRi``  == ``irfft(r + 1j*i, n_fft) * hann``  (windowed
      synthesis frames), and for time frames ``x`` (..., n_fft):
    * ``x @ FWr + 1j * (x @ FWi)``  == ``rfft(x * hann)``  (windowed analysis).
    """
    k = np.arange(n_fft)
    f = np.arange(n_fft // 2 + 1)
    W = np.exp(2j * np.pi * np.outer(f, k) / n_fft)  # (n_freq, n_fft)
    # irfft doubles every bin except DC and (for even n) Nyquist.
    dbl = np.where((f == 0) | (f == n_fft // 2), 1.0, 2.0)[:, None]
    w = hann_window(n_fft)
    ir_r = (np.real(W) * dbl / n_fft * w).astype(np.float32)
    ir_i = (-np.imag(W) * dbl / n_fft * w).astype(np.float32)
    fw_r = (np.real(W) * w).T.astype(np.float32)
    fw_i = (-np.imag(W) * w).T.astype(np.float32)
    return ir_r, ir_i, fw_r, fw_i
