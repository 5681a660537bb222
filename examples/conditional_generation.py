#!/usr/bin/env python
"""Conditional generation from audio-encoder embeddings
(reference: notebooks/conditional_generation.ipynb, audio_encoder.ipynb).

Run: PYTHONPATH=. python examples/conditional_generation.py model-dir some.wav
"""

import sys

import jax
import numpy as np

from audio_diffusion_tpu.models.audio_encoder import AudioEncoder
from audio_diffusion_tpu.ops.audio_io import normalize, write_wav
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline

model_dir, audio_file = sys.argv[1], sys.argv[2]

encoder = AudioEncoder()
variables = encoder.init_variables(jax.random.key(0))  # or torch_import.load_audio_encoder(dir)
encoding = encoder.encode(variables, [audio_file], pool="average")  # (1, 100)

pipe = AudioDiffusionPipeline.from_pretrained(model_dir)
out = pipe(batch_size=1, encoding=np.asarray(encoding)[:, None, :], key=jax.random.key(0))
write_wav("conditional.wav", normalize(out.audios[0]), out.sample_rate)
print("wrote conditional.wav")
