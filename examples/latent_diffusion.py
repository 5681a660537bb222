#!/usr/bin/env python
"""Full latent-diffusion workflow (reference: README.md latent section +
notebooks/test_vae.ipynb): train a KL-VAE, train a UNet over its latents,
generate through VAE decode.

Run: PYTHONPATH=. python examples/latent_diffusion.py dataset-dir out-dir
(dataset from scripts/audio_to_images.py; dims must keep latents divisible by
2^(num_unet_blocks - 1) — e.g. 256x256 images with the default VAE -> 32x32 latents)
"""

import subprocess
import sys

dataset, out = sys.argv[1], sys.argv[2]

# 1. adversarial KL-VAE (reference: scripts/train_vae.py recipe)
subprocess.run([sys.executable, "scripts/train_vae.py", "-d", dataset, "-b", "2",
                "--hf_checkpoint_dir", f"{out}/vae", "--max_epochs", "50"], check=True)

# 2. UNet over the VAE's latents (reference: train_unet.py --vae)
subprocess.run([sys.executable, "scripts/train_unet.py", "--dataset", dataset,
                "--vae", f"{out}/vae", "--output_dir", f"{out}/model",
                "--train_batch_size", "2", "--gradient_accumulation_steps", "8",
                "--num_epochs", "100"], check=True)

# 3. generate (the saved pipeline carries the vqvae)
import jax

sys.path.insert(0, ".")
from audio_diffusion_tpu.ops.audio_io import normalize, write_wav
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline

pipe = AudioDiffusionPipeline.from_pretrained(f"{out}/model")
assert pipe.is_latent
result = pipe(batch_size=1, steps=50, key=jax.random.key(42))
result.images[0].save(f"{out}/latent_sample.png")
write_wav(f"{out}/latent_sample.wav", normalize(result.audios[0]), result.sample_rate)
print("wrote", f"{out}/latent_sample.png", f"{out}/latent_sample.wav")
