"""Streamlit demo app (reference: streamlit_app.py). Requires
`pip install streamlit` (not bundled)."""

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover - optional dependency
    raise SystemExit(
        "streamlit is not installed in this environment; `pip install streamlit` to run"
    ) from e

from audio_diffusion_tpu.apps import MODELS, wav_bytes
from audio_diffusion_tpu.audio_diffusion import AudioDiffusion


@st.cache_resource
def load_model(model_id: str) -> AudioDiffusion:
    return AudioDiffusion(model_id=model_id)


if __name__ == "__main__":
    st.header("Audio Diffusion (TPU)")
    st.markdown("Generate audio using TPU-native diffusion over mel spectrograms.")

    # All six published model ids (reference: streamlit_app.py:18-28 lists a
    # subset; apps.MODELS carries the full README list).
    model_id = st.selectbox("Model", MODELS)
    if st.button("Generate"):
        audio_diffusion = load_model(model_id)
        image, (sample_rate, audio) = audio_diffusion.generate_spectrogram_and_audio()
        st.image(image, caption="Mel spectrogram")
        st.audio(wav_bytes(audio, sample_rate), format="audio/wav")
        loop = AudioDiffusion.loop_it(audio, sample_rate)
        if loop is not None:
            st.markdown("Loop")
            st.audio(wav_bytes(loop, sample_rate), format="audio/wav")
