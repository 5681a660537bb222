"""Gradio demo app (reference: app.py): pick a model, generate spectrogram +
audio + a beat-tracked loop. Requires `pip install gradio` (not bundled)."""

import argparse

import numpy as np

from audio_diffusion_tpu.audio_diffusion import AudioDiffusion

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - optional dependency
    raise SystemExit(
        "gradio is not installed in this environment; `pip install gradio` to run the demo app"
    ) from e


# NOTE: these are Hugging Face Hub IDs; download each repository locally first
# (this framework loads local directories only) or replace with your own paths.
MODELS = [
    "teticio/audio-diffusion-256",
    "teticio/audio-diffusion-breaks-256",
    "teticio/audio-diffusion-instrumental-hiphop-256",
    "teticio/audio-diffusion-ddim-256",
    "teticio/latent-audio-diffusion-256",
    "teticio/latent-audio-diffusion-ddim-256",
]

_cache = {}


def generate_spectrogram_audio_and_loop(model_id: str):
    if model_id not in _cache:
        _cache[model_id] = AudioDiffusion(model_id=model_id)
    audio_diffusion = _cache[model_id]
    image, (sample_rate, audio) = audio_diffusion.generate_spectrogram_and_audio()
    loop = AudioDiffusion.loop_it(audio, sample_rate)
    if loop is None:
        loop = audio
    return image, (sample_rate, np.asarray(audio)), (sample_rate, np.asarray(loop))


demo = gr.Interface(
    fn=generate_spectrogram_audio_and_loop,
    title="Audio Diffusion (TPU)",
    description="Generate audio using TPU-native diffusion. The models "
    "are trained on spectrogram images of slices of audio.",
    inputs=[gr.Dropdown(label="Model", choices=MODELS, value=MODELS[0])],
    outputs=[
        gr.Image(label="Mel spectrogram", image_mode="L"),
        gr.Audio(label="Audio"),
        gr.Audio(label="Loop"),
    ],
    allow_flagging="never",
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int)
    parser.add_argument("--server", type=str)
    args = parser.parse_args()
    demo.launch(server_name=args.server or "0.0.0.0", server_port=args.port)
