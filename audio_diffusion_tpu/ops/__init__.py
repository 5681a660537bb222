from . import audio_io, griffin_lim, mel_filters, stft  # noqa: F401
