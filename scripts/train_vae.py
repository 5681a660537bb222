#!/usr/bin/env python
"""Train an AutoencoderKL on spectrogram images (reference: scripts/train_vae.py,
which delegated to CompVis ldm + pytorch-lightning; here the adversarial
KL-VAE recipe is native — see audio_diffusion_tpu/training/train_vae.py)."""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, ".")

from audio_diffusion_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--dataset_name", type=str, required=True)
    p.add_argument("-b", "--batch_size", type=int, default=1)
    p.add_argument("--hf_checkpoint_dir", type=str, default="models/autoencoder-kl")
    p.add_argument("-g", "--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--hop_length", type=int, default=512)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--n_fft", type=int, default=2048)
    p.add_argument("--save_images_batches", type=int, default=1000)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--latent_channels", type=int, default=1)
    p.add_argument("--base_channels", type=int, default=128)
    p.add_argument("--ch_mult", type=str, default="1,2,4,4")
    p.add_argument("--norm_num_groups", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=4.5e-6)
    p.add_argument("--disc_start", type=int, default=50001)
    p.add_argument("--kl_weight", type=float, default=1.0e-6)
    p.add_argument("--disc_weight", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mixed_precision", type=str, default="no", choices=["no", "bf16"])
    p.add_argument("--perceptual", type=str, default="pyramid",
                   choices=["pyramid", "ssim", "lpips_rf", "none"],
                   help="perceptual reconstruction term: avg-pool pyramid L1, "
                        "structural dissimilarity (the structure-gated option), "
                        "LPIPS over fixed random conv features, or none")
    p.add_argument("--perceptual_weight", type=float, default=1.0)
    a = p.parse_args(argv)

    from flax import serialization

    from audio_diffusion_tpu.data.dataset import ImageSliceDataset, epoch_batches, prefetch
    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from audio_diffusion_tpu.training.train_vae import (
        VAETrainConfig,
        init_vae_train_state,
        make_vae_train_steps,
    )

    dataset = ImageSliceDataset(a.dataset_name)
    resolution = dataset.resolution
    ch_mult = [int(x) for x in a.ch_mult.split(",")]

    vae_cfg = VAEConfig(
        block_out_channels=tuple(a.base_channels * m for m in ch_mult),
        latent_channels=a.latent_channels,
        sample_size=resolution[0],
        norm_num_groups=a.norm_num_groups,
        dtype="bfloat16" if a.mixed_precision == "bf16" else "float32",
    )
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init_params(jax.random.key(a.seed), sample_hw=resolution)

    # CompVis scales the base LR by accum * batch (train_vae.py heritage).
    lr = a.learning_rate * a.gradient_accumulation_steps * a.batch_size
    cfg = VAETrainConfig(learning_rate=lr, disc_start=a.disc_start,
                         kl_weight=a.kl_weight, disc_weight=a.disc_weight,
                         perceptual_kind=a.perceptual,
                         perceptual_weight=a.perceptual_weight)
    state, disc = init_vae_train_state(cfg, vae, vae_params, resolution)
    gen_step, disc_step = make_vae_train_steps(cfg, vae, disc)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(a.hf_checkpoint_dir, "logs"))
    except ImportError:
        pass
    mel = Mel(x_res=resolution[1], y_res=resolution[0], hop_length=a.hop_length,
              sample_rate=a.sample_rate, n_fft=a.n_fft)

    rng = np.random.default_rng(a.seed)
    step = 0
    t0 = time.time()
    for epoch in range(a.max_epochs):
        for batch in prefetch(
            epoch_batches(dataset, a.batch_size, a.gradient_accumulation_steps, rng),
            # (accum, micro, H, W, C): grads average over microbatches; the
            # prefetch thread stages decode + H2D off the step critical path.
            transform=lambda b: jax.numpy.asarray(b[0]),
        ):
            key = jax.random.fold_in(jax.random.key(a.seed), step)
            # Before disc_start the discriminator loss is zero-weighted, so a
            # disc step would be a zero-gradient no-op — spend every step on
            # the generator until then, alternating only once the adversarial
            # phase begins (reference recipe: disc_factor gates at disc_start,
            # config/ldm_autoencoder_kl.yaml:13).
            if step < a.disc_start or step % 2 == 0:
                state, gen_metrics = gen_step(state, batch, key)
                metrics = dict(gen_metrics)
            else:
                state, disc_metrics = disc_step(state, batch, key)
                # Merge so gen metrics stay visible in the every-50 logs once
                # the phases alternate (multiples of 50 always land on disc
                # steps post-disc_start otherwise).
                metrics = {**gen_metrics, **disc_metrics}
            step += 1
            if step % 50 == 0 or step == 1:
                logs = {k: float(v) for k, v in metrics.items()}
                logging.info("epoch %d step %d: %s", epoch, step, logs)
                if writer:
                    for k, v in logs.items():
                        writer.add_scalar(f"vae/{k}", v, step)
            if writer and step % a.save_images_batches == 0:
                rec, _ = vae.apply({"params": state.params["vae"]}, batch[0][:4], jax.random.key(0))
                grid = np.clip(np.asarray(rec)[..., 0] / 2 + 0.5, 0, 1)
                writer.add_images("vae/reconstructions", (grid * 255).astype(np.uint8)[:, None], step)
                from audio_diffusion_tpu.ops.audio_io import normalize

                img_uint8 = (grid[0] * 255).astype(np.uint8)
                audio = np.asarray(mel.images_to_audio(img_uint8[None]))[0]
                try:
                    writer.add_audio("vae/reconstruction_audio", normalize(audio)[None, :], step,
                                     sample_rate=a.sample_rate)
                except ImportError:  # tensorboardX add_audio needs soundfile
                    pass
            if a.max_steps and step >= a.max_steps:
                break
        # Save each epoch (reference: HFModelCheckpoint on_train_epoch_end).
        os.makedirs(a.hf_checkpoint_dir, exist_ok=True)
        vae_cfg.save_config(a.hf_checkpoint_dir)
        from audio_diffusion_tpu.pipelines.pipeline import AudioDiffusionPipeline

        AudioDiffusionPipeline._write_atomic(
            os.path.join(a.hf_checkpoint_dir, "params.msgpack"),
            serialization.to_bytes(jax.device_get(state.params["vae"])),
        )
        if a.max_steps and step >= a.max_steps:
            break
    print({"steps": step, "seconds": time.time() - t0, "output": a.hf_checkpoint_dir})


if __name__ == "__main__":
    main()
