"""Flax -> torch export gates (utils/torch_export.py): exported state dicts
load strict=True into the hand-written diffusers-layout torch twins with
forward parity, invert exactly through torch_import, and the full pipeline
round-trips through the torch on-disk layout bit-for-bit."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from torch_twins import TorchAutoencoderKL, TorchUNet2D

from audio_diffusion_tpu.mel import Mel
from audio_diffusion_tpu.models import UNet2D, UNetConfig
from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from audio_diffusion_tpu.pipelines.pipeline import AudioDiffusionPipeline
from audio_diffusion_tpu.schedulers import DDIMScheduler
from audio_diffusion_tpu.utils.torch_export import (
    export_unet,
    export_vae,
    save_pipeline_torch,
    unet_config_to_diffusers,
    vae_config_to_diffusers,
)
from audio_diffusion_tpu.utils.torch_import import (
    _check_structure,
    convert_unet,
    convert_vae,
)

UNCOND_CFG = UNetConfig(
    sample_size=(16, 16),
    block_out_channels=(8, 16, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=2,
    norm_num_groups=4,
    attention_head_dim=4,
)

COND_CFG = UNetConfig(
    sample_size=(16, 16),
    block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    attention_head_dim=4,
    cross_attention_dim=12,
)


def _tree_allclose(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0), a, b
    )


def test_export_import_roundtrip_unconditional():
    """export_unet is the exact inverse of convert_unet (same tree, same values)."""
    unet = UNet2D(UNCOND_CFG)
    params = unet.init_params(jax.random.key(1))
    sd = export_unet(params, UNCOND_CFG)
    back = _check_structure(params, convert_unet(sd, UNCOND_CFG))
    _tree_allclose(params, back)


def test_export_loads_twin_strict_and_matches_forward_unconditional():
    """The exported state dict IS a valid diffusers-layout checkpoint: it
    loads strict=True into the torch twin and the twin's forward matches the
    flax model that produced it."""
    unet = UNet2D(UNCOND_CFG)
    params = unet.init_params(jax.random.key(2))
    sd = export_unet(params, UNCOND_CFG)

    twin = TorchUNet2D(UNCOND_CFG)
    twin.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    twin.eval()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([11, 479], dtype=np.int64)
    with torch.no_grad():
        golden = twin(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = unet.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_export_loads_twin_strict_and_matches_forward_conditional():
    """Same gate for the cross-attention UNet (Transformer2D projections,
    GEGLU, the 0.12-0.24 head convention)."""
    unet = UNet2D(COND_CFG)
    params = unet.init_params(jax.random.key(4))
    sd = export_unet(params, COND_CFG)

    twin = TorchUNet2D(COND_CFG)
    twin.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    twin.eval()

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    enc = rng.standard_normal((2, 3, 12)).astype(np.float32)
    t = np.array([42, 999], dtype=np.int64)
    with torch.no_grad():
        golden = twin(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(enc)).numpy()
    ours = unet.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), jnp.asarray(enc)
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_export_vae_roundtrip_and_twin_parity():
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=2,
                    latent_channels=2, sample_size=32, norm_num_groups=4)
    vae = AutoencoderKL(cfg)
    params = vae.init_params(jax.random.key(6), sample_hw=(32, 32))
    sd = export_vae(params, cfg)

    back = _check_structure(params, convert_vae(sd, cfg))
    _tree_allclose(params, back)

    twin = TorchAutoencoderKL(cfg)
    twin.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    twin.eval()

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments_golden = twin.encode_moments(torch.from_numpy(x)).numpy()
    posterior = vae.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), method=vae.encode)
    ours = np.concatenate([np.asarray(posterior.mean), np.asarray(posterior.logvar)], axis=-1)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), moments_golden, atol=1e-4)


def test_exported_configs_are_diffusers_shaped():
    cfg = unet_config_to_diffusers(COND_CFG)
    assert cfg["_class_name"] == "UNet2DConditionModel"
    assert cfg["cross_attention_dim"] == 12
    assert cfg["use_linear_projection"] is True
    assert unet_config_to_diffusers(UNCOND_CFG)["_class_name"] == "UNet2DModel"

    vcfg = vae_config_to_diffusers(VAEConfig(block_out_channels=(8, 16)))
    assert vcfg["_class_name"] == "AutoencoderKL"
    assert vcfg["down_block_types"] == ["DownEncoderBlock2D"] * 2
    assert vcfg["scaling_factor"] == 0.18215


def test_pipeline_torch_roundtrip_bitexact(tmp_path):
    """save_pipeline_torch -> pipeline_from_torch_pretrained reproduces the
    original pipeline's generations exactly (unet + vqvae + scheduler + mel
    all survive the torch on-disk layout)."""
    from audio_diffusion_tpu.utils.torch_import import pipeline_from_torch_pretrained

    unet_cfg = UNetConfig(
        sample_size=(16, 16), block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4, attention_head_dim=4,
    )
    vae_cfg = VAEConfig(block_out_channels=(4, 8), layers_per_block=1,
                        latent_channels=1, sample_size=32, norm_num_groups=4)
    unet = UNet2D(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    mel = Mel(x_res=32, y_res=32)
    pipe = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(8)), mel, DDIMScheduler(),
        vae, vae.init_params(jax.random.key(9), sample_hw=(32, 32)),
    )

    out_dir = os.path.join(str(tmp_path), "torch_pipe")
    save_pipeline_torch(pipe, out_dir)
    # The on-disk layout is the diffusers one.
    assert os.path.exists(os.path.join(out_dir, "unet", "diffusion_pytorch_model.bin"))
    assert os.path.exists(os.path.join(out_dir, "scheduler", "scheduler_config.json"))
    assert os.path.exists(os.path.join(out_dir, "vqvae", "diffusion_pytorch_model.bin"))
    with open(os.path.join(out_dir, "model_index.json")) as fh:
        index = json.load(fh)
    assert index["unet"] == ["diffusers", "UNet2DModel"]
    assert index["mel"] == ["diffusers", "Mel"]

    pipe2 = pipeline_from_torch_pretrained(out_dir)
    a = pipe(batch_size=1, steps=2, key=jax.random.key(10), return_arrays=True)
    b = pipe2(batch_size=1, steps=2, key=jax.random.key(10), return_arrays=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_convert_checkpoint_cli_to_torch(tmp_path):
    """scripts/convert_checkpoint.py --to torch round-trips native -> torch
    layout -> native load with identical generations."""
    import sys

    sys.path.insert(0, ".")
    from scripts.convert_checkpoint import main as convert_main

    unet_cfg = UNetConfig(
        sample_size=(16, 16), block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4, attention_head_dim=4,
    )
    unet = UNet2D(unet_cfg)
    pipe = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(11)), Mel(x_res=16, y_res=16), DDIMScheduler()
    )
    native_dir = os.path.join(str(tmp_path), "native")
    pipe.save_pretrained(native_dir)

    torch_dir = os.path.join(str(tmp_path), "torch")
    convert_main(["--input", native_dir, "--output", torch_dir, "--to", "torch"])
    assert os.path.exists(os.path.join(torch_dir, "unet", "diffusion_pytorch_model.bin"))

    pipe2 = AudioDiffusionPipeline.from_pretrained(torch_dir)  # auto-detects torch
    a = pipe(batch_size=1, steps=2, key=jax.random.key(12), return_images_only=True)
    b = pipe2(batch_size=1, steps=2, key=jax.random.key(12), return_images_only=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_config_to_diffusers_int_sample_size():
    """UNetConfig accepts an int sample_size everywhere (sample_hw normalizes);
    export must not crash on the int form."""
    from audio_diffusion_tpu.models import UNetConfig
    from audio_diffusion_tpu.utils.torch_export import unet_config_to_diffusers

    cfg = UNetConfig(sample_size=64, block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     layers_per_block=1, norm_num_groups=4)
    out = unet_config_to_diffusers(cfg)
    assert out["sample_size"] == [64, 64]
