#!/usr/bin/env python
"""VAE reconstruct / random sample / latent slerp
(reference: notebooks/test_vae.ipynb).

Run: PYTHONPATH=. python examples/test_vae.py vae-dir dataset-dir
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from PIL import Image

from audio_diffusion_tpu.data.dataset import ImageSliceDataset
from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from audio_diffusion_tpu.pipelines.pipeline import AudioDiffusionPipeline

vae_dir, dataset_dir = sys.argv[1], sys.argv[2]

cfg = VAEConfig.from_pretrained(vae_dir)
vae = AutoencoderKL(cfg)
template = vae.init_params(jax.random.key(0))
with open(f"{vae_dir}/params.msgpack", "rb") as fh:
    params = serialization.from_bytes(template, fh.read())

ds = ImageSliceDataset(dataset_dir)
img = ds.get(0)["image"].astype(np.float32) / 255.0 * 2 - 1
x = jnp.asarray(img)[None, ..., None]

# Reconstruct.
rec, posterior = vae.apply({"params": params}, x, jax.random.key(1))
Image.fromarray((np.clip(np.asarray(rec)[0, ..., 0] / 2 + 0.5, 0, 1) * 255).astype(np.uint8)).save("vae_rec.png")

# Random sample from the prior.
z = jax.random.normal(jax.random.key(2), posterior.mean.shape)
sample = vae.apply({"params": params}, z, method=vae.decode)
Image.fromarray((np.clip(np.asarray(sample)[0, ..., 0] / 2 + 0.5, 0, 1) * 255).astype(np.uint8)).save("vae_sample.png")

# Latent slerp between two images.
img2 = ds.get(min(1, len(ds) - 1))["image"].astype(np.float32) / 255.0 * 2 - 1
x2 = jnp.asarray(img2)[None, ..., None]
z1 = vae.apply({"params": params}, x, method=vae.encode).sample(jax.random.key(3))
z2 = vae.apply({"params": params}, x2, method=vae.encode).sample(jax.random.key(4))
zmix = AudioDiffusionPipeline.slerp(z1, z2, 0.5)
mix = vae.apply({"params": params}, zmix, method=vae.decode)
Image.fromarray((np.clip(np.asarray(mix)[0, ..., 0] / 2 + 0.5, 0, 1) * 255).astype(np.uint8)).save("vae_slerp.png")
print("wrote vae_rec.png vae_sample.png vae_slerp.png")
