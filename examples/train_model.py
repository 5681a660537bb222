#!/usr/bin/env python
"""End-to-end smoke: build a dataset from audio, train a few epochs, generate
(reference: notebooks/train_model.ipynb).

Run: PYTHONPATH=. python examples/train_model.py path-to-audio-dir out-dir
"""

import sys

import jax

from audio_diffusion_tpu.data.prepare import audio_to_images
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
from audio_diffusion_tpu.training.loop import RunConfig, run_training
from audio_diffusion_tpu.training.train_unet import TrainConfig

audio_dir, out_dir = sys.argv[1], sys.argv[2]

audio_to_images(audio_dir, f"{out_dir}/data", resolution=(64, 64), hop_length=1024)

result = run_training(
    RunConfig(dataset=f"{out_dir}/data", output_dir=f"{out_dir}/model", num_epochs=10,
              train_batch_size=2, eval_batch_size=2, hop_length=1024,
              save_model_epochs=5, save_images_epochs=5),
    TrainConfig(lr_warmup_steps=50),
)
print(result)

pipe = AudioDiffusionPipeline.from_pretrained(f"{out_dir}/model")
out = pipe(batch_size=1, steps=50, key=jax.random.key(42))
out.images[0].save(f"{out_dir}/sample.png")
print("wrote", f"{out_dir}/sample.png")
