"""Driver-contract gates: __graft_entry__.entry and dryrun_multichip must work
exactly as the harness invokes them (virtual CPU devices)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, ".")

import __graft_entry__ as graft


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)


def test_dryrun_multichip_reexec_fallback():
    """The driver invokes dryrun_multichip under a 1-chip backend
    (MULTICHIP_r01.json failure mode). When the initialized backend has
    fewer devices than requested, the entry must re-exec onto a virtual
    CPU mesh of the right size. Here the backend is already up with 8 CPU
    devices, so asking for 16 exercises exactly that fallback."""
    graft.dryrun_multichip(16)


def test_entry_is_jittable_on_tiny_variant():
    """entry() returns the full 256x256 flagship (slow to compile on CPU);
    validate the contract shape with the same code path at a smaller size by
    jitting the returned fn with sliced inputs is NOT possible (shapes are
    baked into params), so spot-check the callable contract instead."""
    fn, args = graft.entry()
    assert callable(fn) and len(args) == 3
    params, sample, timesteps = args
    assert sample.shape == (1, 256, 256, 1)
    assert timesteps.shape == (1,)
    assert len(jax.tree_util.tree_leaves(params)) > 100


def test_latent_conditional_512_shape_contract():
    """BASELINE.json config 5: conditional UNet over the latents of a 512 VAE
    (512 -> 64 latent with ch_mult [1,2,4,4]) runs end-to-end at tiny scale."""
    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDIMScheduler

    # Tiny stand-in with the same structure: image 32 -> latent 16, cross-attn.
    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                        latent_channels=1, sample_size=32, norm_num_groups=4)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(32, 32))
    assert vae_cfg.latent_hw(32, 32) == (16, 16)

    unet_cfg = UNetConfig(
        sample_size=(16, 16), in_channels=1, out_channels=1,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, norm_num_groups=4, attention_head_dim=4,
        cross_attention_dim=100,
    )
    unet = UNet2D(unet_cfg)
    pipe = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(1)),
        Mel(x_res=32, y_res=32, n_iter=2), DDIMScheduler(),
        vqvae=vae, vqvae_params=vae_params,
    )
    encoding = jnp.ones((2, 1, 100))
    out = pipe(batch_size=2, steps=3, key=jax.random.key(2), encoding=encoding)
    assert out.raw_images.shape == (2, 32, 32)
    assert len(out.audios) == 2


def test_step_timer():
    from audio_diffusion_tpu.utils.profiling import StepTimer

    t = StepTimer(window=3)
    for _ in range(5):
        t.tick()
    assert t.mean >= 0.0
    assert t.rate(8) > 0
