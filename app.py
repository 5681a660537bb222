"""Gradio demo app (reference: app.py): pick a model, generate spectrogram +
audio + a beat-tracked loop. Requires `pip install gradio` (not bundled)."""

import argparse

from audio_diffusion_tpu.apps import MODELS, generate_spectrogram_audio_and_loop

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - optional dependency
    raise SystemExit(
        "gradio is not installed in this environment; `pip install gradio` to run the demo app"
    ) from e


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
