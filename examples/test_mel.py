#!/usr/bin/env python
"""Mel roundtrip walkthrough (reference: notebooks/test_mel.ipynb).

Audio -> 256x256 mel image -> Griffin-Lim audio, plus dataset-image -> audio.
Run: PYTHONPATH=. python examples/test_mel.py [audio.wav]
"""

import sys

import numpy as np

from audio_diffusion_tpu import Mel
from audio_diffusion_tpu.ops.audio_io import load_audio, normalize, write_wav

mel = Mel()  # x_res=256, y_res=256, sr=22050, hop=512 — reference defaults

if len(sys.argv) > 1:
    audio = load_audio(sys.argv[1], mel.get_sample_rate())
else:  # synthetic chord
    t = np.arange(3 * mel.slice_size) / mel.get_sample_rate()
    audio = sum(a * np.sin(2 * np.pi * f * t) for f, a in [(220, .5), (330, .3), (440, .2)])
    audio = (audio / np.abs(audio).max() * 0.8).astype(np.float32)

mel.load_audio(raw_audio=audio)
print(f"{mel.get_number_of_slices()} slices of {mel.slice_size} samples "
      f"(~{mel.slice_size / mel.get_sample_rate():.2f}s each)")

image = mel.audio_slice_to_image(0)
image.save("slice0.png")
print("wrote slice0.png", image.size)

reconstructed = mel.image_to_audio(image)
write_wav("slice0_roundtrip.wav", normalize(reconstructed), mel.get_sample_rate())
print("wrote slice0_roundtrip.wav", reconstructed.shape)

# Batched API: all slices at once on-device.
batch = np.stack([mel.get_audio_slice(i) for i in range(mel.get_number_of_slices())])
images = mel.spectrogram_images_from_audio(batch)
audios = mel.images_to_audio(images)
print("batched:", np.asarray(images).shape, "->", np.asarray(audios).shape)
