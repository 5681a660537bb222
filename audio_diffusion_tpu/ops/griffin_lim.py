"""Batched mel inversion (NNLS) and Griffin-Lim phase retrieval in JAX.

The reference inverts spectrograms on the host CPU with
``librosa.feature.inverse.mel_to_audio`` (reference: audiodiffusion/mel.py:165-167):
NNLS solve of ``mel_basis @ S_lin = S_mel`` followed by 32 iterations of
momentum Griffin-Lim. Both stages here run fully on device:

* NNLS is a fixed-iteration FISTA (accelerated projected gradient) — a static
  ``lax.scan`` whose body is two large matmuls, so the whole solve rides the
  MXU and is batched over every time-frame of every clip at once;
* Griffin-Lim is a ``lax.scan`` over iterations whose body is one ISTFT + one
  STFT (librosa's momentum recursion, momentum = 0.99). On accelerators the
  per-iteration transforms run as windowed-DFT **matmuls on the MXU** rather
  than XLA's FFT lowering — measured 2-3.5x faster at n_fft=2048 on a TPU
  v5e with the roundtrip-MAE goldens unchanged (see :func:`griffin_lim`).

Randomness uses explicit JAX PRNG keys (librosa's ``init='random'`` phase).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .stft import frame, istft, overlap_add_normalize, stft, windowed_dft_matrices


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
    projection: str = "auto",
    dft_mats: tuple | None = None,
) -> jnp.ndarray:
    """Momentum Griffin-Lim phase retrieval (librosa.griffinlim semantics).

    ``projection`` selects how the per-iteration consistency projection
    (ISTFT followed by STFT) runs:

    * ``"fft"`` — ``jnp.fft.irfft``/``rfft`` (exact transform).
    * ``"matmul"`` — the mathematically identical windowed-DFT matmuls
      (:func:`..ops.stft.windowed_dft_matrices`), which ride the MXU.
      Measured on the v5e: the GL stage drops 104 -> 53 ms per batch-16 at
      256x256 and 244 -> 85 ms at 512x512, with roundtrip mel-image MAE
      within +-0.03 uint8 of the fft path (the frozen-golden gates in
      bench.py and tests/test_mel.py hold unchanged). TPU matmuls round
      operands to bf16 per pass, so results differ from fft at ~1e-3
      relative — the magnitude reset each iteration keeps that drift from
      accumulating.
    * ``"auto"`` (default) — ``"fft"`` on CPU (where FFT wins and tests/
      goldens run), ``"matmul"`` on accelerators.

    The final synthesis after the loop always uses the exact fft ISTFT.

    Args:
        magnitude: (..., n_frames, n_freq) linear-magnitude spectrogram
            (frames-major, matching :mod:`.stft`).
        key: PRNG key for the random initial phase.
        dft_mats: the four :func:`..ops.stft.windowed_dft_matrices` arrays for
            the matmul projection, passed through as ARGUMENTS of the caller's
            jitted program. When None they are materialized at trace time,
            which bakes ~33 MB (n_fft=2048) of f32 constants into every HLO
            module containing Griffin-Lim — bloating each cached program and
            risking the remote-compile upload limit (CLAUDE.md; ADVICE r4).
            Callers on the hot path (Mel, the fused pipeline program) thread
            :meth:`Mel.gl_matrices` here instead.
    Returns:
        real audio, shape (..., length or (n_frames - 1) * hop_length).
    """
    if projection == "auto":
        projection = "fft" if jax.default_backend() == "cpu" else "matmul"
    mag = magnitude.astype(jnp.float32)
    beta = momentum / (1.0 + momentum)
    phase_angle = 2.0 * jnp.pi * jax.random.uniform(key, magnitude.shape)

    if projection == "fft":
        angles = jnp.exp(1j * phase_angle).astype(jnp.complex64)

        def body(carry, _):
            angles, rebuilt_prev = carry
            inverse = istft(mag * angles, n_fft, hop_length, length=length)
            rebuilt = stft(inverse, n_fft, hop_length)
            new_angles = rebuilt - beta * rebuilt_prev
            new_angles = new_angles / (jnp.abs(new_angles) + 1e-16)
            return (new_angles, rebuilt), None

        init = (angles, jnp.zeros_like(angles))
        (angles, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    else:
        # Same recursion over (real, imag) float pairs; the windowed DFT
        # matmuls replace irfft/rfft (window folded into the matrices, so
        # the body is: synthesize -> overlap-add -> reframe -> analyze).
        if dft_mats is not None:
            ir_r, ir_i, fw_r, fw_i = dft_mats
        else:
            ir_r, ir_i, fw_r, fw_i = (jnp.asarray(m) for m in windowed_dft_matrices(n_fft))
        n_frames = magnitude.shape[-2]
        out_len = length if length is not None else (n_frames - 1) * hop_length
        a_r, a_i = jnp.cos(phase_angle), jnp.sin(phase_angle)

        def body(carry, _):
            a_r, a_i, prev_r, prev_i = carry
            frames = (mag * a_r) @ ir_r + (mag * a_i) @ ir_i
            inverse = overlap_add_normalize(frames, hop_length, length=out_len)
            reframed = frame(inverse, n_fft, hop_length)
            reb_r, reb_i = reframed @ fw_r, reframed @ fw_i
            new_r, new_i = reb_r - beta * prev_r, reb_i - beta * prev_i
            denom = jnp.sqrt(new_r * new_r + new_i * new_i) + 1e-16
            return (new_r / denom, new_i / denom, reb_r, reb_i), None

        init = (a_r, a_i, jnp.zeros_like(a_r), jnp.zeros_like(a_i))
        (a_r, a_i, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
        angles = jax.lax.complex(a_r, a_i)
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
    projection: str = "auto",
    dft_mats: tuple | None = None,
) -> jnp.ndarray:
    """Full mel-power -> audio inversion (librosa ``mel_to_audio`` equivalent).

    Args:
        mel_power: (..., n_frames, n_mels) mel-power spectrogram (frames-major).
        mel_basis: (n_mels, n_fft//2+1) filterbank.
        projection: Griffin-Lim projection implementation (see
            :func:`griffin_lim`; "auto" = MXU matmuls on accelerators).
        dft_mats: windowed-DFT matrices threaded as jit arguments (see
            :func:`griffin_lim`).
    """
    linear_power = nnls(mel_basis, mel_power, n_iter=nnls_iter)
    magnitude = jnp.sqrt(jnp.maximum(linear_power, 0.0))  # power=2.0 -> amplitude
    return griffin_lim(magnitude, key, n_fft, hop_length, n_iter, length=length,
                       projection=projection, dft_mats=dft_mats)
