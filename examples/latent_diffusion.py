#!/usr/bin/env python
"""Full latent-diffusion workflow (reference: README.md latent section +
notebooks/test_vae.ipynb): train a KL-VAE, train a UNet over its latents,
generate through VAE decode.

Run: PYTHONPATH=. python examples/latent_diffusion.py dataset-dir out-dir
(dataset from scripts/audio_to_images.py; dims must keep latents divisible by
2^(num_unet_blocks - 1) — e.g. 256x256 images with the default VAE -> 32x32
latents). --quick shrinks both trainings to a few steps on a small VAE for CI
smoke (tests/test_examples.py) — same pipeline, same scripts, tiny budget;
it expects a 64x64 dataset (small VAE: 1 downsample -> 32x32 latents).
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

p = argparse.ArgumentParser(description=__doc__)
p.add_argument("dataset")
p.add_argument("out")
p.add_argument("--quick", action="store_true")
a = p.parse_args()
# Training subprocesses run with cwd=REPO; pin user paths to the caller's CWD.
a.dataset, a.out = os.path.abspath(a.dataset), os.path.abspath(a.out)

vae_args = ["--max_epochs", "50"]
unet_args = ["--train_batch_size", "2", "--gradient_accumulation_steps", "8",
             "--num_epochs", "100"]
if a.quick:
    vae_args = ["--max_steps", "2", "--base_channels", "32", "--ch_mult", "1,2",
                "--norm_num_groups", "8", "--disc_start", "1000000"]
    unet_args = ["--train_batch_size", "2", "--num_epochs", "1", "--max_steps", "2",
                 "--lr_warmup_steps", "1", "--save_images_epochs", "100000",
                 "--save_model_epochs", "100000"]

# Scripts resolve relative to the REPO, not the caller's CWD.
# 1. adversarial KL-VAE (reference: scripts/train_vae.py recipe)
subprocess.run([sys.executable, os.path.join(REPO, "scripts/train_vae.py"),
                "-d", a.dataset, "-b", "2",
                "--hf_checkpoint_dir", f"{a.out}/vae", *vae_args],
               cwd=REPO, check=True)

# 2. UNet over the VAE's latents (reference: train_unet.py --vae)
subprocess.run([sys.executable, os.path.join(REPO, "scripts/train_unet.py"),
                "--dataset", a.dataset,
                "--vae", f"{a.out}/vae", "--output_dir", f"{a.out}/model",
                *unet_args], cwd=REPO, check=True)

# 3. generate (the saved pipeline carries the vqvae)
import jax

sys.path.insert(0, REPO)
from audio_diffusion_tpu.ops.audio_io import normalize, write_wav
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline

pipe = AudioDiffusionPipeline.from_pretrained(f"{a.out}/model")
assert pipe.is_latent
result = pipe(batch_size=1, steps=5 if a.quick else 50, key=jax.random.key(42))
result.images[0].save(f"{a.out}/latent_sample.png")
write_wav(f"{a.out}/latent_sample.wav", normalize(result.audios[0]), result.sample_rate)
print("wrote", f"{a.out}/latent_sample.png", f"{a.out}/latent_sample.wav")
