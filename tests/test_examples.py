"""Examples smoke gates (VERDICT r3 #8): `examples/*.py` encode the
reference's notebook matrix (test_mel / test_model / test_vae / train_model /
latent_diffusion / conditional_generation .ipynb) as runnable scripts — these
tests actually RUN each one at toy scale so a rotted example fails CI instead
of rotting as documentation.

Each example runs as a real subprocess (its own interpreter, CWD = a tmp dir)
on the CPU backend: the child env sets JAX_PLATFORMS=cpu and rebuilds
PYTHONPATH to the repo root only, deliberately dropping any site dir that
registers an accelerator backend (same recipe as CPU-only user scripts)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_example(script, args, cwd, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}"
    )
    return proc


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    """Two short synthetic clips on disk (what every notebook starts from)."""
    from audio_diffusion_tpu.ops.audio_io import write_wav

    from conftest import synth_audio

    d = tmp_path_factory.mktemp("audio")
    for i in range(2):
        write_wav(str(d / f"clip{i}.wav"),
                  synth_audio(3 * 16 * 512, seed=i), 22050)
    return str(d)


@pytest.fixture(scope="module")
def tiny_pipe_dir(tmp_path_factory):
    """A saved tiny DDPM pipeline standing in for a published model id."""
    import jax

    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDPMScheduler, SchedulerConfig

    cfg = UNetConfig(sample_size=(16, 16), block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     layers_per_block=1, norm_num_groups=4)
    unet = UNet2D(cfg)
    pipe = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(0)),
        Mel(x_res=16, y_res=16, hop_length=512, n_iter=4),
        # 1000 train timesteps: examples/test_model.py uses the notebook's
        # start_step=500 (valid for the published DDPM models it documents)
        DDPMScheduler(SchedulerConfig(num_train_timesteps=1000)),
    )
    d = tmp_path_factory.mktemp("pipe")
    pipe.save_pretrained(str(d))
    return str(d)


def test_example_mel(tmp_path):
    """examples/test_mel.py (test_mel.ipynb): synthetic-chord roundtrip at the
    reference 256x256 geometry; writes slice0.png + roundtrip wav."""
    run_example("test_mel.py", [], str(tmp_path))
    assert (tmp_path / "slice0.png").exists()
    assert (tmp_path / "slice0_roundtrip.wav").exists()


def test_example_model(tmp_path, tiny_pipe_dir, audio_dir):
    """examples/test_model.py (test_model.ipynb): the full inference matrix —
    generate/loop/variation/outpaint/remix/inpaint/eta/encode/slerp — against
    a tiny saved pipeline."""
    wav = os.path.join(audio_dir, "clip0.wav")
    proc = run_example("test_model.py", [tiny_pipe_dir, wav], str(tmp_path))
    for f in ("generated.wav", "variation.wav", "outpainted.wav",
              "remixed.wav", "inpainted.wav", "eta1.wav", "slerp_mix.wav"):
        assert (tmp_path / f).exists(), f
    assert "encode->reconstruct image MAE" in proc.stdout


def test_example_train_model(tmp_path, audio_dir, tiny_pipe_dir):
    """examples/train_model.py (train_model.ipynb): dataset build -> training
    -> saved pipeline -> generation, shrunk via the documented smoke flags."""
    out = tmp_path / "out"
    run_example("train_model.py",
                [audio_dir, str(out), "--epochs", "1", "--resolution", "16",
                 "--hop", "512", "--steps", "2",
                 "--from_pretrained", tiny_pipe_dir],
                str(tmp_path))
    assert (out / "sample.png").exists()
    assert (out / "model" / "model_index.json").exists()


@pytest.fixture(scope="module")
def dataset64_dir(tmp_path_factory, audio_dir):
    """64x64 mel dataset (the smallest the default UNet's 6 blocks accept as
    32x32 latents under a 1-downsample VAE)."""
    from audio_diffusion_tpu.data.prepare import audio_to_images

    d = tmp_path_factory.mktemp("ds64")
    audio_to_images(audio_dir, str(d), resolution=(64, 64), hop_length=1024)
    return str(d)


def test_example_latent_diffusion(tmp_path, dataset64_dir):
    """examples/latent_diffusion.py (README latent section): VAE training ->
    latent UNet training -> generation through VAE decode, at --quick scale."""
    out = tmp_path / "latent"
    run_example("latent_diffusion.py", [dataset64_dir, str(out), "--quick"],
                str(tmp_path), timeout=1500)
    assert (out / "latent_sample.png").exists()
    assert (out / "latent_sample.wav").exists()


def test_example_vae(tmp_path, dataset64_dir):
    """examples/test_vae.py (test_vae.ipynb): reconstruct / prior sample /
    latent slerp from a saved VAE dir + dataset."""
    import jax

    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    vae_dir = tmp_path / "vae"
    vae_dir.mkdir()
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    latent_channels=1, sample_size=64, norm_num_groups=4)
    vae = AutoencoderKL(cfg)
    params = vae.init_params(jax.random.key(0), sample_hw=(64, 64))
    cfg.save_config(str(vae_dir))
    from flax import serialization
    with open(vae_dir / "params.msgpack", "wb") as fh:
        fh.write(serialization.to_bytes(params))

    run_example("test_vae.py", [str(vae_dir), dataset64_dir], str(tmp_path))
    for f in ("vae_rec.png", "vae_sample.png", "vae_slerp.png"):
        assert (tmp_path / f).exists(), f


def test_example_conditional(tmp_path, audio_dir):
    """examples/conditional_generation.py (conditional_generation.ipynb):
    AudioEncoder embedding -> conditional pipeline -> wav."""
    import jax

    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDIMScheduler, SchedulerConfig

    cfg = UNetConfig(sample_size=(16, 16), block_out_channels=(8, 16),
                     down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                     layers_per_block=1, norm_num_groups=4,
                     attention_head_dim=4, cross_attention_dim=100)
    unet = UNet2D(cfg)
    pipe = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(0)),
        Mel(x_res=16, y_res=16, hop_length=512, n_iter=4),
        DDIMScheduler(SchedulerConfig(num_train_timesteps=100)),
    )
    d = tmp_path / "cond_pipe"
    pipe.save_pretrained(str(d))

    wav = os.path.join(audio_dir, "clip1.wav")
    run_example("conditional_generation.py", [str(d), wav], str(tmp_path))
    assert (tmp_path / "conditional.wav").exists()
