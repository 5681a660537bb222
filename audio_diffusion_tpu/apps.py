"""UI-independent app logic shared by app.py (gradio) and streamlit_app.py.

The reference keeps this logic inline in its UI callbacks (reference:
app.py:26-43, streamlit_app.py:30-45); factored here so the behavior is unit
tested without gradio/streamlit installed (the UIs are optional deps).
"""

from __future__ import annotations

from io import BytesIO
from typing import Dict, Tuple

import numpy as np

from .audio_diffusion import AudioDiffusion
from .ops.audio_io import normalize

# The published model ids (Hugging Face Hub). Ids resolve through the local HF
# cache first, then the network (utils/hub.py) — in a zero-egress environment,
# download each repository elsewhere or substitute local paths.
MODELS = [
    "teticio/audio-diffusion-256",
    "teticio/audio-diffusion-breaks-256",
    "teticio/audio-diffusion-instrumental-hiphop-256",
    "teticio/audio-diffusion-ddim-256",
    "teticio/latent-audio-diffusion-256",
    "teticio/latent-audio-diffusion-ddim-256",
]

_cache: Dict[str, AudioDiffusion] = {}


def get_model(model_id: str, factory=AudioDiffusion) -> AudioDiffusion:
    """Per-process model cache (reference: app.py caches via audio_diffusion
    global; streamlit via st.cache_resource)."""
    if model_id not in _cache:
        _cache[model_id] = factory(model_id=model_id)
    return _cache[model_id]


def generate_spectrogram_audio_and_loop(model_id: str, factory=AudioDiffusion):
    """The gradio callback (reference: app.py:26-43): generate one sample and
    return (image, (sr, audio), (sr, loop)); the loop falls back to the raw
    audio when beat tracking finds no usable bar structure."""
    audio_diffusion = get_model(model_id, factory)
    image, (sample_rate, audio) = audio_diffusion.generate_spectrogram_and_audio()
    loop = AudioDiffusion.loop_it(audio, sample_rate)
    if loop is None:
        loop = audio
    return image, (sample_rate, np.asarray(audio)), (sample_rate, np.asarray(loop))


def wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    """Peak-normalized 16-bit WAV bytes (reference: streamlit_app.py:36-45,
    which used soundfile; plain stdlib wave here). int16 input (the serving
    pcm16 path — already device-quantized) passes through untouched, so the
    wav and raw-PCM delivery paths return identical samples."""
    import wave

    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        pcm = np.ascontiguousarray(audio)
    else:
        pcm = np.clip(normalize(audio) * 32767.0, -32768, 32767).astype(np.int16)
    buf = BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(sample_rate)
        fh.writeframes(pcm.tobytes())
    return buf.getvalue()
