"""Host-side audio I/O: decode, resample, and WAV writing.

The reference decodes with ``librosa.load`` (audioread/soundfile backends,
reference: audiodiffusion/mel.py:100) — mono, resampled to the target rate.
Decode stays on the host here (it is inherently file I/O); resampling uses a
polyphase filter. MP3/M4A decode goes through an ``ffmpeg`` binary when one is
present; otherwise only WAV is supported and other formats raise a clear error.

A native multithreaded decoder (C++, see ``native/``) is used automatically
for batch dataset preparation when built; this module is the portable path.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import wave
from typing import Tuple

import numpy as np
from scipy.signal import resample_poly


def _read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM/float WAV into float32 in [-1, 1], shape (channels, T)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    else:
        audio = audio.T
    return audio, int(sr)


def _read_via_ffmpeg(path: str, sample_rate: int) -> Tuple[np.ndarray, int]:
    cmd = [
        "ffmpeg", "-v", "error", "-i", path,
        "-f", "f32le", "-acodec", "pcm_f32le", "-ac", "1", "-ar", str(sample_rate), "-",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    audio = np.frombuffer(out, dtype=np.float32)
    return audio[None, :], sample_rate


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis (librosa uses soxr; polyphase is
    the standard alias-free equivalent and passes the same roundtrip gates)."""
    if orig_sr == target_sr:
        return audio
    g = np.gcd(int(orig_sr), int(target_sr))
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def load_audio(path: str, sample_rate: int = 22050, mono: bool = True) -> np.ndarray:
    """Decode an audio file to float32 mono at ``sample_rate`` (librosa.load parity).

    Uses the native C++ decoder+resampler (native/audioio.cpp) when built;
    falls back to scipy otherwise.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav" and mono:
        from ..data import native_audio

        native = native_audio.load_wav(path, sample_rate)
        if native is not None:
            return native
    if ext == ".wav":
        audio, sr = _read_wav(path)
    else:
        if not mono:
            raise ValueError("compressed formats decode with a mono downmix; "
                             "mono=False is only supported for WAV files")
        from ..data import native_audio

        decoded = native_audio.load_media(path, sample_rate)
        if decoded is not None:
            return decoded
        if shutil.which("ffmpeg"):
            audio, sr = _read_via_ffmpeg(path, sample_rate)
        else:
            raise ValueError(
                f"Cannot decode {path!r}: the native media decoder "
                "(native/mediadec.cpp, needs the system libavformat/libavcodec) "
                "could not be built and no ffmpeg binary was found. Install the "
                "ffmpeg libraries or convert to WAV."
            )
    if mono and audio.shape[0] > 1:
        audio = audio.mean(axis=0, keepdims=True)
    audio = resample(audio, sr, sample_rate)
    return audio[0] if mono else audio


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write mono/stereo float audio as 16-bit PCM WAV (no soundfile dependency)."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as fh:
        fh.setnchannels(pcm.shape[0])
        fh.setsampwidth(2)
        fh.setframerate(sample_rate)
        fh.writeframes(pcm.T.tobytes())


def normalize(audio: np.ndarray) -> np.ndarray:
    """Peak-normalize (librosa.util.normalize default: inf-norm along axis 0 /
    full vector for 1-D), used before logging audio (reference: train_unet.py:345)."""
    peak = np.max(np.abs(audio))
    return audio / peak if peak > 0 else audio
