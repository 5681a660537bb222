"""Conditioning SELECTIVITY gate (VERDICT r2 weak #3): cross-attention
encodings must STEER generation, not merely perturb it.

Two mirror-image spectral classes (class 1 is the exact negative of class 0,
so no unconditional shortcut exists — the model must read the encoding to
predict epsilon near pure noise), fixed per-class encodings, a few hundred
training steps of the real conditional train step, then generation with each
encoding. Gates: the class-defining statistic (top-minus-bottom brightness)
shifts sign with the encoding, and each condition's samples are closer to
their own class prototype than to the other's.

The reference demonstrates steering only through its published pretrained
conditional models (reference: README.md:209-218, trained with Deej-AI
encodings, scripts/train_unet.py:140-159); this is the in-repo, from-scratch
proof that the mechanism itself trains to selectivity. The matching
256x256 conditional-latent evidence lives in BASELINE.md.

Training dynamics note (why mirror classes + few train timesteps): class
identity is readable from x_t at low noise, so gradient signal on the
conditioning path comes almost entirely from high-t samples; a short
timestep table concentrates training there, which is what makes this
convergence feasible in ~600 CPU steps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_diffusion_tpu.mel import Mel
from audio_diffusion_tpu.models import UNet2D, UNetConfig
from audio_diffusion_tpu.parallel import make_mesh
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
from audio_diffusion_tpu.schedulers import DDIMScheduler, SchedulerConfig
from audio_diffusion_tpu.training import (
    TrainConfig,
    batch_shardings,
    init_train_state,
    make_train_step,
    shard_train_state,
)

RES, DIM = 8, 8


def test_conditioning_steers_generation():
    rng = np.random.default_rng(0)

    base = np.full((RES, RES), -0.9, np.float32)
    base[: RES // 2, :] = 0.9
    protos = np.stack([base, -base])  # mirror classes

    def sample_class(k, n):
        return np.clip(protos[k] + 0.05 * rng.standard_normal((n, RES, RES)).astype(np.float32), -1, 1)

    encs = rng.standard_normal((2, 1, DIM)).astype(np.float32)

    cfg_u = UNetConfig(
        sample_size=(RES, RES), block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, norm_num_groups=8, attention_head_dim=8,
        cross_attention_dim=DIM,
    )
    unet = UNet2D(cfg_u)
    params = unet.init_params(jax.random.key(0))
    scheduler = DDIMScheduler(SchedulerConfig(num_train_timesteps=20))

    mesh = make_mesh(num_data=1, devices=[jax.devices()[0]])
    tcfg = TrainConfig(learning_rate=2e-3, lr_schedule="constant", lr_warmup_steps=10,
                       total_steps=700, use_ema=False)
    state = shard_train_state(init_train_state(tcfg, params), mesh, tcfg)
    step_fn = make_train_step(tcfg, unet, scheduler, conditional=True)
    img_sh, enc_sh = batch_shardings(mesh)

    for i in range(600):
        ks = rng.integers(0, 2, 8)
        imgs = np.stack([sample_class(k, 1)[0] for k in ks])[None, ..., None]
        enc = encs[ks][None]
        state, metrics = step_fn(state, jax.device_put(imgs, img_sh),
                                 jax.device_put(enc, enc_sh), jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))

    pipe = AudioDiffusionPipeline(unet, jax.device_get(state.params),
                                  Mel(x_res=RES, y_res=RES, n_iter=2), scheduler)
    proto_u8 = (protos / 2 + 0.5) * 255

    stats, own_mae, other_mae, raws = [], [], [], []
    for k in range(2):
        enc = np.broadcast_to(encs[k], (4, 1, DIM))
        raw = pipe(batch_size=4, steps=20, key=jax.random.key(42), encoding=enc,
                   return_images_only=True)
        raws.append(raw)
        stats.append(float(raw[:, : RES // 2].astype(float).mean()
                           - raw[:, RES // 2 :].astype(float).mean()))
        d = [np.abs(raw.astype(float) - proto_u8[c][None]).mean() for c in range(2)]
        own_mae.append(d[k])
        other_mae.append(d[1 - k])

    # Same key, different encoding -> different samples (the wires are live).
    assert not np.array_equal(raws[0], raws[1])
    # The class statistic SHIFTS with the encoding: top-bright under enc 0,
    # bottom-bright under enc 1, with a clear margin.
    assert stats[0] > 10.0, f"cond-0 samples not top-bright: {stats}"
    assert stats[1] < -10.0, f"cond-1 samples not bottom-bright: {stats}"
    # Own-class proximity beats other-class for BOTH conditions — the
    # selectivity property round 2 could not demonstrate.
    assert own_mae[0] < other_mae[0] - 5.0, (own_mae, other_mae)
    assert own_mae[1] < other_mae[1] - 5.0, (own_mae, other_mae)
