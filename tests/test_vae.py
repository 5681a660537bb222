"""AutoencoderKL gates (SURVEY.md §7 stage 7): shapes, distribution semantics,
latent pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu.models.vae import AutoencoderKL, DiagonalGaussian, VAEConfig


def tiny_vae_config(**kw):
    base = dict(
        block_out_channels=(8, 16),
        layers_per_block=1,
        latent_channels=2,
        sample_size=16,
        norm_num_groups=4,
    )
    base.update(kw)
    return VAEConfig(**base)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = AutoencoderKL(tiny_vae_config())
    params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))
    return vae, params


def test_encode_decode_shapes(vae_and_params):
    vae, params = vae_and_params
    x = jnp.ones((2, 16, 16, 1))
    dist = vae.apply({"params": params}, x, method=vae.encode)
    # 1 downsample -> 8x8 latents with latent_channels=2.
    assert dist.mean.shape == (2, 8, 8, 2)
    z = dist.sample(jax.random.key(1))
    rec = vae.apply({"params": params}, z, method=vae.decode)
    assert rec.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(rec)).all()


def test_latent_resolution_probe():
    """The reference probes latent resolution with a zeros forward
    (train_unet.py:103-104); config must predict it statically."""
    cfg = tiny_vae_config()
    assert cfg.latent_hw(16, 16) == (8, 8)
    assert VAEConfig().latent_hw(256, 256) == (32, 32)  # 3 downsamples, ch_mult [1,2,4,4]


def test_sample_reparameterization(vae_and_params):
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 1))
    dist = vae.apply({"params": params}, x, method=vae.encode)
    a = np.asarray(dist.sample(jax.random.key(3)))
    b = np.asarray(dist.sample(jax.random.key(3)))
    c = np.asarray(dist.sample(jax.random.key(4)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.asarray(dist.mode()), np.asarray(dist.mean))


def test_kl_nonnegative_and_zero_at_standard_normal():
    mean = jnp.zeros((2, 4, 4, 1))
    logvar = jnp.zeros((2, 4, 4, 1))
    d = DiagonalGaussian(mean, logvar)
    np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)
    d2 = DiagonalGaussian(mean + 1.0, logvar)
    assert (np.asarray(d2.kl()) > 0).all()


def test_full_forward_and_grad(vae_and_params):
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.key(5), (2, 16, 16, 1))

    @jax.jit
    def loss_fn(p):
        rec, posterior = vae.apply({"params": p}, x, jax.random.key(0))
        return jnp.mean((rec - x) ** 2) + 1e-6 * jnp.mean(posterior.kl())

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_latent_pipeline_end_to_end():
    """Latent diffusion path (BASELINE.json config 4): VAE encode -> denoise in
    latent space -> VAE decode, with masking in latent columns."""
    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDIMScheduler

    from conftest import synth_audio

    vae = AutoencoderKL(tiny_vae_config(latent_channels=1))
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))

    unet_cfg = UNetConfig(
        sample_size=(8, 8),
        in_channels=1,
        out_channels=1,
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
    )
    unet = UNet2D(unet_cfg)
    unet_params = unet.init_params(jax.random.key(1))

    mel = Mel(x_res=16, y_res=16, hop_length=512, n_iter=2)
    pipe = AudioDiffusionPipeline(unet, unet_params, mel, DDIMScheduler(), vqvae=vae, vqvae_params=vae_params)
    assert pipe.is_latent

    out = pipe(batch_size=1, steps=3, key=jax.random.key(2))
    assert out.raw_images.shape == (1, 16, 16)
    assert len(out.audios) == 1

    # audio2audio through the VAE with latent-column masking.
    audio = synth_audio(16 * 512 - 1)
    raw = pipe(
        batch_size=1, raw_audio=audio, steps=3, start_step=1,
        mask_start_secs=0.05, key=jax.random.key(3), return_images_only=True,
    )
    assert raw.shape == (1, 16, 16)


def test_latent_encode_inverts_in_latent_space():
    """pipeline.encode() on a latent pipeline VAE-encodes (posterior mode)
    and runs DDIM inversion over LATENTS: the returned noise has the latent
    shape, and feeding it back through noise= reproduces the VAE decode of
    the mode latent (exact-linear UNet makes the inversion an exact inverse;
    the reference runs its UNet on raw pixels here — shape-wrong for latent
    models, pipeline:207-242 — which this framework fixes)."""
    from PIL import Image

    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.pipelines.pipeline import LATENT_SCALE, postprocess_images
    from audio_diffusion_tpu.schedulers import DDIMScheduler, SchedulerConfig
    from test_pipeline import _TimestepOnlyUNet

    vae = AutoencoderKL(tiny_vae_config(latent_channels=1))
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))

    cfg = UNetConfig(sample_size=(8, 8), block_out_channels=(8, 16))
    pattern = np.random.default_rng(3).standard_normal((8, 8, 1)).astype(np.float32) * 0.3
    unet = _TimestepOnlyUNet(cfg, pattern)
    sched = DDIMScheduler(SchedulerConfig(clip_sample=False))
    mel = Mel(x_res=16, y_res=16, hop_length=512, n_iter=2)
    pipe = AudioDiffusionPipeline(unet, {}, mel, sched, vqvae=vae, vqvae_params=vae_params)

    img = Image.fromarray(np.random.default_rng(4).integers(0, 256, (16, 16), dtype=np.uint8))
    noise = pipe.encode([img], steps=5)
    assert noise.shape == (1, 8, 8, 1), "latent encode must return latent-shaped noise"

    # Reproduction target: decode of the deterministic mode latent.
    x = (jnp.asarray(np.asarray(img), dtype=jnp.float32)[None, ..., None] / 255.0) * 2.0 - 1.0
    z = LATENT_SCALE * vae.apply({"params": vae_params}, x, method=vae.encode).mode()
    expected = np.asarray(postprocess_images(
        vae.apply({"params": vae_params}, z / LATENT_SCALE, method=vae.decode)
    ))

    raw = pipe(batch_size=1, steps=5, noise=noise, return_images_only=True)
    mae = np.abs(raw.astype(float) - expected.astype(float)).mean()
    assert mae < 3.0, f"latent inversion roundtrip MAE {mae}"


def test_latent_slerp_workflow():
    """Latent slerp (reference test_model.ipynb cells 39-47): slerp two
    latent-encoded noises, generate — output is valid and differs from both
    endpoints' reconstructions."""
    from PIL import Image

    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDIMScheduler, SchedulerConfig
    from test_pipeline import _TimestepOnlyUNet

    vae = AutoencoderKL(tiny_vae_config(latent_channels=1))
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))
    cfg = UNetConfig(sample_size=(8, 8), block_out_channels=(8, 16))
    pattern = np.random.default_rng(5).standard_normal((8, 8, 1)).astype(np.float32) * 0.3
    pipe = AudioDiffusionPipeline(
        _TimestepOnlyUNet(cfg, pattern), {},
        Mel(x_res=16, y_res=16, hop_length=512, n_iter=2),
        DDIMScheduler(SchedulerConfig(clip_sample=False)),
        vqvae=vae, vqvae_params=vae_params,
    )
    rng = np.random.default_rng(6)
    img_a = Image.fromarray(rng.integers(0, 256, (16, 16), dtype=np.uint8))
    img_b = Image.fromarray(rng.integers(0, 256, (16, 16), dtype=np.uint8))
    na = pipe.encode([img_a], steps=4)
    nb = pipe.encode([img_b], steps=4)
    mid = AudioDiffusionPipeline.slerp(na, nb, 0.5)
    a = pipe(batch_size=1, steps=4, noise=na, return_images_only=True)
    b = pipe(batch_size=1, steps=4, noise=nb, return_images_only=True)
    m = pipe(batch_size=1, steps=4, noise=mid, return_images_only=True)
    assert m.shape == (1, 16, 16)
    assert not np.array_equal(m, a) and not np.array_equal(m, b)


def test_from_pretrained_dtype_override(tmp_path):
    """Serving-time compute-dtype override: an f32-saved latent pipeline loads
    with dtype='bfloat16' (params stay f32, activations run bf16) and
    generates output close to the f32 run — the knob that takes the f32-
    trained rebuild artifact from 58.4 to 70.3 samples/s (BASELINE.md)."""
    import jax.numpy as jnp

    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDIMScheduler

    vae = AutoencoderKL(tiny_vae_config(latent_channels=1))
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))
    cfg = UNetConfig(sample_size=(8, 8), block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     layers_per_block=1, norm_num_groups=4)
    unet = UNet2D(cfg)
    pipe = AudioDiffusionPipeline(unet, unet.init_params(jax.random.key(1)),
                                  Mel(x_res=16, y_res=16, n_iter=2), DDIMScheduler(),
                                  vqvae=vae, vqvae_params=vae_params)
    pipe.save_pretrained(str(tmp_path))

    bf16 = AudioDiffusionPipeline.from_pretrained(str(tmp_path), dtype="bfloat16")
    assert bf16.unet.config.dtype == "bfloat16"
    assert bf16.vqvae.config.dtype == "bfloat16"
    # params stay f32
    leaf = jax.tree_util.tree_leaves(bf16.unet_params)[0]
    assert leaf.dtype == jnp.float32

    a = pipe(batch_size=1, steps=3, key=jax.random.key(5), return_images_only=True)
    b = bf16(batch_size=1, steps=3, key=jax.random.key(5), return_images_only=True)
    assert b.shape == a.shape
    # bf16 rounding, not divergence
    assert np.abs(a.astype(float) - b.astype(float)).mean() < 16.0


def test_vae_config_roundtrip(tmp_path):
    cfg = tiny_vae_config()
    cfg.save_config(str(tmp_path))
    assert VAEConfig.from_pretrained(str(tmp_path)) == cfg


def test_latent_batched_audio_input_batch_invariant():
    """Batched per-sample raw_audio on a LATENT pipeline encodes to the
    posterior MODE: a row's spectrogram is bit-identical whether it runs in
    a batch of 1 or padded among others (the serving contract — a batch-
    shaped posterior .sample() would give row i different noise per tier)."""
    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDIMScheduler

    import numpy as np

    vae = AutoencoderKL(tiny_vae_config(latent_channels=1))
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))
    unet_cfg = UNetConfig(
        sample_size=(8, 8), in_channels=1, out_channels=1,
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4,
    )
    unet = UNet2D(unet_cfg)
    mel = Mel(x_res=16, y_res=16, hop_length=512, n_iter=2)
    pipe = AudioDiffusionPipeline(unet, unet.init_params(jax.random.key(1)), mel,
                                  DDIMScheduler(), vqvae=vae, vqvae_params=vae_params)

    rng = np.random.default_rng(0)
    rows = (rng.standard_normal((3, 16 * 512)) * 0.1).astype(np.float32)
    noise = np.asarray(jax.random.normal(jax.random.key(9), (3, 8, 8, 1)))

    batched = pipe(raw_audio=rows, noise=noise, start_step=2, steps=4,
                   return_images_only=True)
    for i in range(3):
        solo = pipe(raw_audio=rows[i : i + 1], noise=noise[i : i + 1],
                    start_step=2, steps=4, return_images_only=True)
        np.testing.assert_array_equal(batched[i], solo[0])
