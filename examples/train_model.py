#!/usr/bin/env python
"""End-to-end smoke: build a dataset from audio, train a few epochs, generate
(reference: notebooks/train_model.ipynb).

Run: PYTHONPATH=. python examples/train_model.py path-to-audio-dir out-dir

Optional flags keep the notebook-scale defaults but let CI smoke the same
path on a tiny model (tests/test_examples.py): --epochs/--resolution/--hop
shrink the run; --from_pretrained seeds from a saved (small) pipeline instead
of the reference architecture.
"""

import argparse

import jax

from audio_diffusion_tpu.data.prepare import audio_to_images
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
from audio_diffusion_tpu.training.loop import RunConfig, run_training
from audio_diffusion_tpu.training.train_unet import TrainConfig

p = argparse.ArgumentParser(description=__doc__)
p.add_argument("audio_dir")
p.add_argument("out_dir")
p.add_argument("--epochs", type=int, default=10)
p.add_argument("--resolution", type=int, default=64)
p.add_argument("--hop", type=int, default=1024)
p.add_argument("--steps", type=int, default=50, help="generation steps at the end")
p.add_argument("--from_pretrained", type=str, default=None)
a = p.parse_args()

audio_to_images(a.audio_dir, f"{a.out_dir}/data",
                resolution=(a.resolution, a.resolution), hop_length=a.hop)

result = run_training(
    RunConfig(dataset=f"{a.out_dir}/data", output_dir=f"{a.out_dir}/model",
              num_epochs=a.epochs, train_batch_size=2, eval_batch_size=2,
              hop_length=a.hop, save_model_epochs=min(5, a.epochs),
              save_images_epochs=min(5, a.epochs),
              from_pretrained=a.from_pretrained),
    TrainConfig(lr_warmup_steps=50),
)
print(result)

pipe = AudioDiffusionPipeline.from_pretrained(f"{a.out_dir}/model")
out = pipe(batch_size=1, steps=a.steps, key=jax.random.key(42))
out.images[0].save(f"{a.out_dir}/sample.png")
print("wrote", f"{a.out_dir}/sample.png")
