"""End-to-end pipeline gates (SURVEY.md §7 stage 4, BASELINE.json configs 2-3):
tiny UNet, full generation matrix under jit on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu.mel import Mel
from audio_diffusion_tpu.models import UNet2D, UNetConfig
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
from audio_diffusion_tpu.schedulers import DDIMScheduler, DDPMScheduler, SchedulerConfig

from conftest import synth_audio

RES = 16


def tiny_unet(cross_attention_dim=None):
    cfg = UNetConfig(
        sample_size=(RES, RES),
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D") if cross_attention_dim else ("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D") if cross_attention_dim else ("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
        attention_head_dim=4,
        cross_attention_dim=cross_attention_dim,
    )
    unet = UNet2D(cfg)
    return unet, unet.init_params(jax.random.key(0))


def tiny_mel():
    return Mel(x_res=RES, y_res=RES, hop_length=512, n_iter=4)


@pytest.fixture(scope="module")
def ddim_pipe():
    unet, params = tiny_unet()
    return AudioDiffusionPipeline(unet, params, tiny_mel(), DDIMScheduler())


def test_unconditional_ddim_generation(ddim_pipe):
    out = ddim_pipe(batch_size=2, steps=3, key=jax.random.key(1))
    assert len(out.images) == 2
    assert out.images[0].size == (RES, RES)
    assert out.raw_images.shape == (2, RES, RES) and out.raw_images.dtype == np.uint8
    assert len(out.audios) == 2
    assert out.audios[0].shape == ((RES - 1) * 512,)
    assert out.sample_rate == 22050
    assert np.isfinite(out.audios[0]).all()


def test_generation_deterministic_with_key(ddim_pipe):
    a = ddim_pipe(batch_size=1, steps=3, key=jax.random.key(7), return_images_only=True)
    b = ddim_pipe(batch_size=1, steps=3, key=jax.random.key(7), return_images_only=True)
    np.testing.assert_array_equal(a, b)
    c = ddim_pipe(batch_size=1, steps=3, key=jax.random.key(8), return_images_only=True)
    assert not np.array_equal(a, c)


def test_return_tuple_matches_reference_contract(ddim_pipe):
    images, (sr, audios) = ddim_pipe(batch_size=1, steps=2, return_dict=False)
    assert sr == 22050 and len(images) == 1 and len(audios) == 1


def test_ddpm_generation():
    unet, params = tiny_unet()
    pipe = AudioDiffusionPipeline(unet, params, tiny_mel(), DDPMScheduler(SchedulerConfig(num_train_timesteps=20)))
    assert pipe.get_default_steps() == 20
    raw = pipe(batch_size=1, steps=5, key=jax.random.key(0), return_images_only=True)
    assert raw.shape == (1, RES, RES)


def test_audio_to_audio_with_start_step(ddim_pipe):
    audio = synth_audio(RES * 512 - 1)
    raw = ddim_pipe(
        batch_size=1, raw_audio=audio, start_step=2, steps=4, key=jax.random.key(3), return_images_only=True
    )
    assert raw.shape == (1, RES, RES)


def test_mask_freezes_columns(ddim_pipe):
    """Outpainting semantics: masked columns must equal the (t=0-noised) input
    columns at the end of the loop (reference: pipeline:181-185)."""
    audio = synth_audio(RES * 512 - 1)
    mel = ddim_pipe.mel
    input_img = np.asarray(mel.spectrogram_images_from_audio(audio[None]))[0]

    pixels_per_second = RES * 22050 / RES / 512  # = 43.07
    mask_secs = 4 / pixels_per_second  # exactly 4 columns
    raw = ddim_pipe(
        batch_size=1,
        raw_audio=audio,
        steps=4,
        key=jax.random.key(3),
        mask_start_secs=mask_secs,
        return_images_only=True,
    )[0]
    # Final mask overwrite is add_noise at t=0 ~= input itself (alpha_0 ~ 1).
    diff = np.abs(raw[:, :4].astype(float) - input_img[:, :4].astype(float)).mean()
    other = np.abs(raw[:, 4:].astype(float) - input_img[:, 4:].astype(float)).mean()
    assert diff < 10.0, f"masked columns deviate: {diff}"
    assert other > diff, "unmasked columns should differ more than masked ones"


def test_mask_end_columns(ddim_pipe):
    audio = synth_audio(RES * 512 - 1)
    mel = ddim_pipe.mel
    input_img = np.asarray(mel.spectrogram_images_from_audio(audio[None]))[0]
    pixels_per_second = RES * 22050 / RES / 512
    raw = ddim_pipe(
        batch_size=1, raw_audio=audio, steps=4, key=jax.random.key(3),
        mask_end_secs=4 / pixels_per_second, return_images_only=True,
    )[0]
    diff = np.abs(raw[:, -4:].astype(float) - input_img[:, -4:].astype(float)).mean()
    assert diff < 10.0


class _TimestepOnlyUNet:
    """Duck-typed UNet whose output depends only on t — makes the DDIM maps
    exactly linear so inversion must be an exact inverse. (DDIM inversion is
    approximate for real nets — the model is re-evaluated at a different point
    on the trajectory — in the reference too; pipeline:228-240.)"""

    def __init__(self, cfg, pattern):
        self.config = cfg
        self.pattern = jnp.asarray(pattern)

    def apply(self, variables, x, t, enc=None):
        tt = jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32) / 1000.0
        return self.pattern[None] * (0.3 + tt[:, None, None, None])


def test_encode_inverts_generation():
    """Generate -> encode -> regenerate reproduces the image up to uint8
    quantization (BASELINE gate for the DDIM-encode feature)."""
    cfg = UNetConfig(sample_size=(RES, RES), block_out_channels=(8, 16))
    pattern = np.random.default_rng(0).standard_normal((RES, RES, 1)).astype(np.float32) * 0.3
    unet = _TimestepOnlyUNet(cfg, pattern)
    sched = DDIMScheduler(SchedulerConfig(clip_sample=False))
    pipe = AudioDiffusionPipeline(unet, {}, tiny_mel(), sched)

    out = pipe(batch_size=1, steps=5, key=jax.random.key(11))
    noise2 = pipe.encode(out.images, steps=5)
    assert noise2.shape == (1, RES, RES, 1)
    raw2 = pipe(batch_size=1, steps=5, noise=noise2, return_images_only=True)
    mae = np.abs(out.raw_images.astype(float) - raw2.astype(float)).mean()
    assert mae < 3.0, f"inversion roundtrip MAE {mae}"


def test_encode_requires_ddim():
    unet, params = tiny_unet()
    pipe = AudioDiffusionPipeline(unet, params, tiny_mel(), DDPMScheduler())
    with pytest.raises(AssertionError):
        pipe.encode([])


def test_eta_stochastic_ddim(ddim_pipe):
    a = ddim_pipe(batch_size=1, steps=3, key=jax.random.key(5), eta=1.0,
                  step_key=jax.random.key(1), return_images_only=True)
    b = ddim_pipe(batch_size=1, steps=3, key=jax.random.key(5), eta=1.0,
                  step_key=jax.random.key(2), return_images_only=True)
    assert not np.array_equal(a, b), "eta=1 must inject per-step noise"


def test_slerp_endpoints_and_midpoint():
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)))
    x1 = jnp.asarray(np.random.default_rng(1).standard_normal((4, 4)))
    np.testing.assert_allclose(np.asarray(AudioDiffusionPipeline.slerp(x0, x1, 0.0)), np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(AudioDiffusionPipeline.slerp(x0, x1, 1.0)), np.asarray(x1), atol=1e-6)
    mid = AudioDiffusionPipeline.slerp(x0, x1, 0.5)
    assert np.isfinite(np.asarray(mid)).all()


def test_conditional_pipeline():
    unet, params = tiny_unet(cross_attention_dim=12)
    pipe = AudioDiffusionPipeline(unet, params, tiny_mel(), DDIMScheduler())
    enc_a = jnp.zeros((1, 1, 12))
    enc_b = jnp.ones((1, 1, 12))
    a = pipe(batch_size=1, steps=3, key=jax.random.key(0), encoding=enc_a, return_images_only=True)
    b = pipe(batch_size=1, steps=3, key=jax.random.key(0), encoding=enc_b, return_images_only=True)
    assert not np.array_equal(a, b)


def test_encoding_shape_guards():
    """Serving-side encoding validation: 2-D (B, dim) — the AudioEncoder's
    pooled output — promotes to a length-1 sequence exactly like the training
    batcher (data/dataset.py); wrong dim / wrong batch / unconditional UNet
    raise actionable errors instead of an opaque attention reshape failure
    (reference requires the caller to know the 3-D contract, pipeline:107)."""
    unet, params = tiny_unet(cross_attention_dim=12)
    pipe = AudioDiffusionPipeline(unet, params, tiny_mel(), DDIMScheduler())

    enc3 = jnp.ones((1, 1, 12))
    a = pipe(batch_size=1, steps=3, key=jax.random.key(0), encoding=enc3, return_images_only=True)
    b = pipe(batch_size=1, steps=3, key=jax.random.key(0), encoding=jnp.ones((1, 12)),
             return_images_only=True)
    np.testing.assert_array_equal(a, b)  # 2-D promotes to the same (1, 1, 12)

    with pytest.raises(ValueError, match="cross_attention_dim"):
        pipe(batch_size=1, steps=3, encoding=jnp.ones((1, 7)))
    with pytest.raises(ValueError, match="batch axis"):
        pipe(batch_size=2, steps=3, encoding=jnp.ones((1, 1, 12)))

    # User-supplied noise sets the EFFECTIVE batch (the encode()->slerp
    # workflow leaves batch_size at its default 1): the check must compare
    # against the noise batch, not the batch_size argument.
    noise4 = jax.random.normal(jax.random.key(3), (4, RES, RES, 1))
    out4 = pipe(steps=3, noise=noise4, encoding=jnp.ones((4, 1, 12)),
                return_images_only=True)
    assert out4.shape[0] == 4
    with pytest.raises(ValueError, match="batch"):
        pipe(steps=3, noise=noise4, encoding=jnp.ones((2, 1, 12)))

    uncond, uparams = tiny_unet()
    upipe = AudioDiffusionPipeline(uncond, uparams, tiny_mel(), DDIMScheduler())
    with pytest.raises(ValueError, match="unconditional"):
        upipe(batch_size=1, steps=3, encoding=jnp.ones((1, 1, 12)))


def test_user_supplied_noise_nchw_compat(ddim_pipe):
    noise_nhwc = np.asarray(jax.random.normal(jax.random.key(2), (1, RES, RES, 1)))
    noise_nchw = np.transpose(noise_nhwc, (0, 3, 1, 2))
    a = ddim_pipe(batch_size=1, steps=3, noise=noise_nhwc, return_images_only=True)
    b = ddim_pipe(batch_size=1, steps=3, noise=noise_nchw, return_images_only=True)
    np.testing.assert_array_equal(a, b)


def test_save_load_roundtrip(tmp_path, ddim_pipe):
    ddim_pipe.save_pretrained(str(tmp_path))
    loaded = AudioDiffusionPipeline.from_pretrained(str(tmp_path))
    a = ddim_pipe(batch_size=1, steps=3, key=jax.random.key(4), return_images_only=True)
    b = loaded(batch_size=1, steps=3, key=jax.random.key(4), return_images_only=True)
    np.testing.assert_array_equal(a, b)
    assert isinstance(loaded.scheduler, DDIMScheduler)
    assert loaded.mel.config == ddim_pipe.mel.config


def test_sharded_inference_over_mesh():
    """Multi-chip serving: pipeline.shard(mesh) runs the full generation SPMD
    with the batch sharded along 'data' (8 virtual devices)."""
    from audio_diffusion_tpu.parallel import make_mesh

    unet, params = tiny_unet()
    pipe = AudioDiffusionPipeline(unet, params, tiny_mel(), DDIMScheduler())
    a = pipe(batch_size=8, steps=3, key=jax.random.key(5), return_images_only=True)

    mesh = make_mesh()
    pipe_sharded = AudioDiffusionPipeline(unet, params, tiny_mel(), DDIMScheduler()).shard(mesh)
    b1 = pipe_sharded(batch_size=8, steps=3, key=jax.random.key(5), return_images_only=True)
    b2 = pipe_sharded(batch_size=8, steps=3, key=jax.random.key(5), return_images_only=True)
    assert b1.shape == (8, RES, RES)
    np.testing.assert_array_equal(b1, b2)  # deterministic under sharding
    # Same RNG + sharded layout must give the same values as single-device.
    np.testing.assert_array_equal(a, b1)
    # Full outputs path works too.
    out = pipe_sharded(batch_size=8, steps=2, key=jax.random.key(6))
    assert len(out.audios) == 8


def test_postprocess_rgb_matches_pil_convert_l():
    """The 3-channel-VAE postprocess path must be bit-exact with
    PIL.Image.convert("L") (reference: pipeline:198) — including the
    16.16 fixed-point round-half-up, which float round() gets wrong
    at .5 ties (VERDICT r1 weak #5a)."""
    from PIL import Image

    from audio_diffusion_tpu.pipelines.pipeline import postprocess_images

    rng = np.random.default_rng(7)
    # Model-space inputs in [-1, 1] covering the tie-prone grid densely.
    x = rng.uniform(-1.1, 1.1, (3, 32, 32, 3)).astype(np.float32)
    out = np.asarray(postprocess_images(jnp.asarray(x)))

    uint8 = np.asarray(jnp.round(jnp.clip(jnp.asarray(x) / 2 + 0.5, 0, 1) * 255).astype(jnp.uint8))
    expected = np.stack([np.asarray(Image.fromarray(img).convert("L")) for img in uint8])
    np.testing.assert_array_equal(out, expected)


def test_postprocess_single_channel_roundtrip():
    from audio_diffusion_tpu.pipelines.pipeline import postprocess_images

    x = jnp.linspace(-1, 1, 256, dtype=jnp.float32).reshape(1, 16, 16, 1)
    out = np.asarray(postprocess_images(x))
    assert out.shape == (1, 16, 16)
    assert out.min() == 0 and out.max() == 255


def test_pcm16_delivery_path():
    """pcm16=True returns peak-normalized int16 PCM device arrays (the WAV
    delivery format the apps produce; used by bench.py serving loop)."""
    cfg = UNetConfig(sample_size=(16, 16), block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     layers_per_block=1, norm_num_groups=4)
    unet = UNet2D(cfg)
    pipe = AudioDiffusionPipeline(unet, unet.init_params(jax.random.key(0)),
                                  Mel(x_res=16, y_res=16, n_iter=2), DDIMScheduler())
    raw, audio = pipe(batch_size=2, steps=2, key=jax.random.key(1),
                      return_arrays=True, pcm16=True)
    audio = np.asarray(audio)
    assert audio.dtype == np.int16
    assert audio.shape[0] == 2
    # peak normalization puts each clip at (close to) full scale
    assert (np.abs(audio).max(axis=-1) >= 32700).all()


def test_sharded_conditional_inference_over_mesh():
    """Sharded serving with cross-attention conditioning: the (B, seq, dim)
    encodings shard along 'data' with the batch and outputs match the
    single-device run bit-for-bit."""
    from audio_diffusion_tpu.parallel import make_mesh

    unet, params = tiny_unet(cross_attention_dim=12)
    enc = np.asarray(
        jax.random.normal(jax.random.key(3), (8, 1, 12)), dtype=np.float32
    )
    pipe = AudioDiffusionPipeline(unet, params, tiny_mel(), DDIMScheduler())
    a = pipe(batch_size=8, steps=3, key=jax.random.key(5), encoding=enc,
             return_images_only=True)

    mesh = make_mesh()
    sharded = AudioDiffusionPipeline(unet, params, tiny_mel(), DDIMScheduler()).shard(mesh)
    b = sharded(batch_size=8, steps=3, key=jax.random.key(5), encoding=enc,
                return_images_only=True)
    np.testing.assert_array_equal(a, b)


def test_fused_path_matches_staged_bitwise(ddim_pipe):
    """The fused single-program serving path (pipe.fuse, default on) computes
    the SAME math as the staged multi-dispatch path — same key split order,
    traced from the same inner functions. Spectrograms must be BIT-identical
    (the uint8 data contract); Griffin-Lim audio is allowed 1 int16 LSB —
    fusing the GL scan into the larger program changes XLA's f32 reduction
    order (float associativity), measured ±1 LSB on ~2% of samples. Covers
    generated-noise + pcm16, user-supplied noise, and explicit step_key."""
    raw_f, audio_f = ddim_pipe(batch_size=2, steps=3, key=jax.random.key(11),
                               return_arrays=True, pcm16=True)
    ddim_pipe.fuse = False
    try:
        raw_s, audio_s = ddim_pipe(batch_size=2, steps=3, key=jax.random.key(11),
                                   return_arrays=True, pcm16=True)
    finally:
        ddim_pipe.fuse = True
    np.testing.assert_array_equal(np.asarray(raw_f), np.asarray(raw_s))
    np.testing.assert_allclose(np.asarray(audio_f), np.asarray(audio_s), atol=1)

    # user noise + explicit step_key + eta
    noise = np.asarray(jax.random.normal(jax.random.key(1), (2, RES, RES, 1)))
    out_f = ddim_pipe(noise=noise, steps=3, key=jax.random.key(2),
                      step_key=jax.random.key(3), eta=0.5)
    ddim_pipe.fuse = False
    try:
        out_s = ddim_pipe(noise=noise, steps=3, key=jax.random.key(2),
                          step_key=jax.random.key(3), eta=0.5)
    finally:
        ddim_pipe.fuse = True
    np.testing.assert_array_equal(out_f.raw_images, out_s.raw_images)
    for a, b in zip(out_f.audios, out_s.audios):
        np.testing.assert_allclose(a, b, atol=1e-4)

    # and the fused path must agree with return_images_only (always staged)
    raw_only = ddim_pipe(batch_size=2, steps=3, key=jax.random.key(11),
                         return_images_only=True)
    np.testing.assert_array_equal(np.asarray(raw_f), raw_only)


def test_fused_path_matches_staged_latent_conditional():
    """Fused-vs-staged parity on the latent + cross-attention shape (the
    benched/served configuration class)."""
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                        latent_channels=1, sample_size=16, norm_num_groups=4)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(RES, RES))
    unet_cfg = UNetConfig(
        sample_size=(8, 8), block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, norm_num_groups=4, attention_head_dim=4,
        cross_attention_dim=12)
    unet = UNet2D(unet_cfg)
    pipe = AudioDiffusionPipeline(unet, unet.init_params(jax.random.key(1)),
                                  tiny_mel(), DDIMScheduler(),
                                  vqvae=vae, vqvae_params=vae_params)
    enc = np.asarray(jax.random.normal(jax.random.key(3), (2, 12)), np.float32)
    raw_f, audio_f = pipe(batch_size=2, steps=3, key=jax.random.key(4),
                          encoding=enc, return_arrays=True, pcm16=True)
    pipe.fuse = False
    raw_s, audio_s = pipe(batch_size=2, steps=3, key=jax.random.key(4),
                          encoding=enc, return_arrays=True, pcm16=True)
    np.testing.assert_array_equal(np.asarray(raw_f), np.asarray(raw_s))
    # ±1 int16 LSB: XLA reduction-order drift from fusing GL into the program
    np.testing.assert_allclose(np.asarray(audio_f), np.asarray(audio_s), atol=1)


def test_fused_audio_to_audio_matches_staged(ddim_pipe):
    """The fused single-program path now covers the audio-to-audio hot loop
    (start_step re-noise + mask overwrite — the reference's staged loop,
    pipeline_audio_diffusion.py:135-185): mel forward, [VAE encode,] re-noise,
    denoise, decode all trace into ONE program. Must match the staged
    multi-dispatch path bitwise on spectrograms for every input mode."""
    full = ddim_pipe.mel.x_res * ddim_pipe.mel.hop_length
    rng = np.random.default_rng(7)

    # single clip broadcast across the batch + start_step + masks
    audio = (rng.standard_normal(full - 1) * 0.1).astype(np.float32)
    kw = dict(batch_size=2, raw_audio=audio, start_step=2, steps=4,
              key=jax.random.key(13), mask_start_secs=0.05, mask_end_secs=0.05)
    raw_f, audio_f = ddim_pipe(return_arrays=True, pcm16=True, **kw)
    ddim_pipe.fuse = False
    try:
        raw_s, audio_s = ddim_pipe(return_arrays=True, pcm16=True, **kw)
    finally:
        ddim_pipe.fuse = True
    np.testing.assert_array_equal(np.asarray(raw_f), np.asarray(raw_s))
    np.testing.assert_allclose(np.asarray(audio_f), np.asarray(audio_s), atol=1)

    # batched per-sample clips (the serving tier shape)
    rows = (rng.standard_normal((2, full)) * 0.1).astype(np.float32)
    kw = dict(raw_audio=rows, noise=np.asarray(
        jax.random.normal(jax.random.key(21), (2, RES, RES, 1))),
        start_step=1, steps=3, key=jax.random.key(22),
        step_key=jax.random.key(23))
    raw_f, _ = ddim_pipe(return_arrays=True, **kw)
    ddim_pipe.fuse = False
    try:
        raw_s, _ = ddim_pipe(return_arrays=True, **kw)
    finally:
        ddim_pipe.fuse = True
    np.testing.assert_array_equal(np.asarray(raw_f), np.asarray(raw_s))


def test_fused_audio_to_audio_latent_matches_staged():
    """Same gate on the latent pipeline: the fused program's inline VAE
    encode must reproduce the staged path for both posterior modes —
    SAMPLE under vae_key (single clip, the reference's semantics,
    pipeline:143-147) and deterministic MODE (batched per-sample rows, the
    serving contract)."""
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                        latent_channels=1, sample_size=16, norm_num_groups=4)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(RES, RES))
    unet_cfg = UNetConfig(sample_size=(8, 8), block_out_channels=(8, 16),
                          down_block_types=("DownBlock2D", "DownBlock2D"),
                          up_block_types=("UpBlock2D", "UpBlock2D"),
                          layers_per_block=1, norm_num_groups=4)
    unet = UNet2D(unet_cfg)
    pipe = AudioDiffusionPipeline(unet, unet.init_params(jax.random.key(1)),
                                  tiny_mel(), DDIMScheduler(),
                                  vqvae=vae, vqvae_params=vae_params)
    full = pipe.mel.x_res * pipe.mel.hop_length
    rng = np.random.default_rng(3)

    audio = (rng.standard_normal(full - 1) * 0.1).astype(np.float32)
    kw = dict(batch_size=2, raw_audio=audio, start_step=2, steps=4,
              key=jax.random.key(31))
    raw_f, _ = pipe(return_arrays=True, **kw)
    pipe.fuse = False
    raw_s, _ = pipe(return_arrays=True, **kw)
    pipe.fuse = True
    np.testing.assert_array_equal(np.asarray(raw_f), np.asarray(raw_s))

    rows = (rng.standard_normal((2, full)) * 0.1).astype(np.float32)
    kw = dict(batch_size=2, raw_audio=rows, start_step=1, steps=3,
              key=jax.random.key(32))
    raw_f, _ = pipe(return_arrays=True, **kw)
    pipe.fuse = False
    raw_s, _ = pipe(return_arrays=True, **kw)
    pipe.fuse = True
    np.testing.assert_array_equal(np.asarray(raw_f), np.asarray(raw_s))


def test_batched_per_sample_audio_input(ddim_pipe):
    """(B, samples) raw_audio conditions each row on ITS OWN clip — bitwise
    equal to B separate single-input calls (the reference broadcasts one clip
    across the batch, pipeline:150-151, costing a serial call per clip)."""
    full = ddim_pipe.mel.x_res * ddim_pipe.mel.hop_length
    rng = np.random.default_rng(0)
    rows = (rng.standard_normal((2, full)) * 0.1).astype(np.float32)
    noise = np.asarray(jax.random.normal(jax.random.key(9), (2, RES, RES, 1)))

    batched = ddim_pipe(raw_audio=rows, noise=noise, start_step=2, steps=4,
                        return_images_only=True)
    for i in range(2):
        solo = ddim_pipe(raw_audio=rows[i], noise=noise[i:i + 1], start_step=2,
                         steps=4, return_images_only=True)
        np.testing.assert_array_equal(batched[i], solo[0])

    with pytest.raises(ValueError, match="raw_audio batch"):
        ddim_pipe(raw_audio=rows, noise=noise[:1], steps=4)


def test_start_step_beyond_schedule_raises_actionable(ddim_pipe):
    """start_step indexes the INFERENCE schedule: the reference's notebook
    value 500 assumes the 1000-step DDPM schedule and overruns a 50-step DDIM
    one with a bare IndexError (pipeline_audio_diffusion.py:149-150). Here it
    must be an actionable ValueError naming the rescale rule."""
    audio = np.zeros(((RES - 1) * 512,), np.float32)
    with pytest.raises(ValueError, match="start_step .* must be < steps"):
        ddim_pipe(batch_size=1, raw_audio=audio, start_step=500, steps=3,
                  key=jax.random.key(0))
    # Without input audio too (ADVICE r4): an out-of-range start_step used to
    # silently slice an empty schedule and return un-denoised noise.
    with pytest.raises(ValueError, match="start_step .* must be < steps"):
        ddim_pipe(batch_size=1, start_step=500, steps=3, key=jax.random.key(0))
