"""Torch->Flax weight-import gates: functional equivalence of every layout
rule against torch itself, plus a full AudioEncoder numeric parity check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from flax import linen as fnn

from audio_diffusion_tpu.utils.torch_import import (
    _SD,
    conv1x1_as_dense,
    conv_kernel,
    convert_audio_encoder,
    convert_unet,
    dense_kernel,
    unet_config_from_diffusers,
)


def test_conv_kernel_functional_equivalence():
    torch_conv = nn.Conv2d(3, 8, 3, padding=1)
    x = np.random.default_rng(0).standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        golden = torch_conv(torch.from_numpy(x)).numpy()

    flax_conv = fnn.Conv(8, (3, 3), padding=1)
    params = {
        "kernel": jnp.asarray(conv_kernel(torch_conv.weight.detach().numpy())),
        "bias": jnp.asarray(torch_conv.bias.detach().numpy()),
    }
    ours = flax_conv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-5)


def test_depthwise_conv_equivalence():
    torch_conv = nn.Conv2d(4, 4, 3, groups=4, bias=False, padding=1)
    x = np.random.default_rng(1).standard_normal((1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        golden = torch_conv(torch.from_numpy(x)).numpy()
    flax_conv = fnn.Conv(4, (3, 3), padding=1, feature_group_count=4, use_bias=False)
    params = {"kernel": jnp.asarray(conv_kernel(torch_conv.weight.detach().numpy()))}
    ours = flax_conv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-5)


def test_dense_and_conv1x1_projection_equivalence():
    lin = nn.Linear(6, 10)
    x = np.random.default_rng(2).standard_normal((5, 6)).astype(np.float32)
    with torch.no_grad():
        golden = lin(torch.from_numpy(x)).numpy()
    dense = fnn.Dense(10)
    params = {"kernel": jnp.asarray(dense_kernel(lin.weight.detach().numpy())),
              "bias": jnp.asarray(lin.bias.detach().numpy())}
    ours = dense.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-5)

    # A 1x1 conv applied tokenwise == Dense with the squeezed kernel.
    conv = nn.Conv2d(6, 10, 1)
    with torch.no_grad():
        golden2 = conv(torch.from_numpy(x[:, :, None, None])).numpy()[:, :, 0, 0]
    params2 = {"kernel": jnp.asarray(conv1x1_as_dense(conv.weight.detach().numpy())),
               "bias": jnp.asarray(conv.bias.detach().numpy())}
    ours2 = dense.apply({"params": params2}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours2), golden2, atol=1e-5)


def test_old_attention_block_aliases():
    sd = _SD({"attn.query.weight": np.eye(4, dtype=np.float32),
              "attn.proj_attn.weight": np.eye(4, dtype=np.float32),
              "attn.proj_attn.bias": np.zeros(4, np.float32)})
    scoped = sd.scope("attn")
    assert scoped.has("to_q.weight")
    assert scoped.get("to_q.weight").shape == (4, 4)
    assert scoped.has("to_out.0.bias")


# ---------------------------------------------------------- AudioEncoder e2e

class _TorchSepConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.depthwise = nn.Conv2d(cin, cin, 3, groups=cin, bias=False, padding=1)
        self.pointwise = nn.Conv2d(cin, cout, 1, bias=True)

    def forward(self, x):
        return self.pointwise(self.depthwise(x))


class _TorchConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.sep_conv = _TorchSepConv(cin, cout)
        self.batch_norm = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01)

    def forward(self, x):
        x = F.leaky_relu(self.sep_conv(x), 0.2)
        x = self.batch_norm(x)
        return F.max_pool2d(x, 2)


class _TorchAudioEncoder(nn.Module):
    """Torch twin of the documented reference architecture
    (reference: audio_encoder.py:62-82), built for parity testing."""

    def __init__(self):
        super().__init__()
        self.conv_blocks = nn.ModuleList([_TorchConvBlock(1, 32), _TorchConvBlock(32, 64), _TorchConvBlock(64, 128)])
        self.dense_block = nn.ModuleDict({
            "dense": nn.Linear(41472, 1024),
            "batch_norm": nn.BatchNorm1d(1024, eps=1e-3, momentum=0.01),
        })
        self.embedding = nn.Linear(1024, 100)

    def forward(self, x):
        for blk in self.conv_blocks:
            x = blk(x)
        x = torch.flatten(x.permute(0, 2, 3, 1), 1)
        x = F.leaky_relu(self.dense_block["dense"](x), 0.2)
        x = self.dense_block["batch_norm"](x)
        return self.embedding(x)


def test_audio_encoder_torch_parity():
    """Full-network numeric parity: convert a torch AudioEncoder's weights and
    compare eval-mode outputs (validates depthwise convs, batchnorm stats,
    flatten order, dense layers all at once)."""
    torch.manual_seed(0)
    tmodel = _TorchAudioEncoder().eval()
    # Perturb running stats so parity actually exercises them.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.3)

    x = np.random.default_rng(3).standard_normal((2, 1, 96, 216)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x)).numpy()

    from audio_diffusion_tpu.models.audio_encoder import AudioEncoder

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_audio_encoder(sd)
    encoder = AudioEncoder()
    ours = encoder.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-3)


# ------------------------------------------------------------- UNet structure

def _emit_torch_keys_from_template(template, config):
    """Inverse-enumerate a diffusers-style state dict with correct shapes from
    our module template (structural coverage check for convert_unet)."""
    sd = {}

    def put_conv(tname, p):
        sd[f"{tname}.weight"] = np.transpose(p["kernel"], (3, 2, 0, 1)).copy()
        if "bias" in p:
            sd[f"{tname}.bias"] = np.asarray(p["bias"])

    def put_dense(tname, p):
        sd[f"{tname}.weight"] = np.transpose(p["kernel"], (1, 0)).copy()
        if "bias" in p:
            sd[f"{tname}.bias"] = np.asarray(p["bias"])

    def put_norm(tname, p):
        sd[f"{tname}.weight"] = np.asarray(p["scale"])
        sd[f"{tname}.bias"] = np.asarray(p["bias"])

    def put_resnet(tname, p):
        put_norm(f"{tname}.norm1", p["norm1"])
        put_conv(f"{tname}.conv1", p["conv1"])
        if "time_emb_proj" in p:
            put_dense(f"{tname}.time_emb_proj", p["time_emb_proj"])
        put_norm(f"{tname}.norm2", p["norm2"])
        put_conv(f"{tname}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_conv(f"{tname}.conv_shortcut", p["conv_shortcut"])

    def put_attn(tname, p):
        put_norm(f"{tname}.group_norm", p["group_norm"])
        for k in ("to_q", "to_k", "to_v"):
            put_dense(f"{tname}.{k}", p[k])
        put_dense(f"{tname}.to_out.0", p["to_out"])

    put_dense("time_embedding.linear_1", template["time_embedding"]["linear_1"])
    put_dense("time_embedding.linear_2", template["time_embedding"]["linear_2"])
    put_conv("conv_in", template["conv_in"])
    put_norm("conv_norm_out", template["conv_norm_out"])
    put_conv("conv_out", template["conv_out"])
    n = len(config.block_out_channels)
    for i, bt in enumerate(config.down_block_types):
        for j in range(config.layers_per_block):
            put_resnet(f"down_blocks.{i}.resnets.{j}", template[f"down_{i}_res_{j}"])
            if bt == "AttnDownBlock2D":
                put_attn(f"down_blocks.{i}.attentions.{j}", template[f"down_{i}_attn_{j}"])
        if i != n - 1:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv", template[f"down_{i}_downsample"]["conv"])
    put_resnet("mid_block.resnets.0", template["mid_res_0"])
    put_resnet("mid_block.resnets.1", template["mid_res_1"])
    put_attn("mid_block.attentions.0", template["mid_attn"])
    for i, bt in enumerate(config.up_block_types):
        for j in range(config.layers_per_block + 1):
            put_resnet(f"up_blocks.{i}.resnets.{j}", template[f"up_{i}_res_{j}"])
            if bt == "AttnUpBlock2D":
                put_attn(f"up_blocks.{i}.attentions.{j}", template[f"up_{i}_attn_{j}"])
        if i != n - 1:
            put_conv(f"up_blocks.{i}.upsamplers.0.conv", template[f"up_{i}_upsample"]["conv"])
    return sd


def test_convert_unet_structure_roundtrip():
    from audio_diffusion_tpu.models import UNet2D, UNetConfig

    cfg = UNetConfig(
        sample_size=(16, 16),
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=2,
        norm_num_groups=4,
        attention_head_dim=4,
    )
    unet = UNet2D(cfg)
    template = jax.tree_util.tree_map(np.asarray, unet.init_params(jax.random.key(0)))
    sd = _emit_torch_keys_from_template(template, cfg)
    converted = convert_unet(sd, cfg)

    t_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]}
    c_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert t_paths == c_paths
    # Numeric roundtrip: converting back and forth preserves values.
    np.testing.assert_allclose(
        converted["conv_in"]["kernel"], template["conv_in"]["kernel"], atol=0
    )
    np.testing.assert_allclose(
        converted["down_1_attn_0"]["to_q"]["kernel"], template["down_1_attn_0"]["to_q"]["kernel"], atol=0
    )


def test_unet_config_from_diffusers_json():
    cfg = unet_config_from_diffusers({
        "_class_name": "UNet2DModel",
        "sample_size": 256,
        "in_channels": 1,
        "out_channels": 1,
        "block_out_channels": [128, 128, 256, 256, 512, 512],
        "down_block_types": ["DownBlock2D"] * 4 + ["AttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "AttnUpBlock2D"] + ["UpBlock2D"] * 4,
        "layers_per_block": 2,
        "attention_head_dim": None,
        "freq_shift": 1,
        "flip_sin_to_cos": False,
    })
    assert cfg.sample_size == (256, 256)
    assert cfg.attention_head_dim == 8  # None -> diffusers default
    assert cfg.freq_shift == 1 and cfg.flip_sin_to_cos is False
    assert not cfg.is_conditional


def test_pipeline_from_torch_pretrained(tmp_path):
    """End-to-end import of a torch diffusers pipeline directory: synthetic
    checkpoint with the exact on-disk layout (config.json + .bin state dicts +
    scheduler/mel configs) loads and generates."""
    import json

    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline

    cfg = UNetConfig(
        sample_size=(16, 16),
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=2,
        norm_num_groups=4,
        attention_head_dim=4,
    )
    unet = UNet2D(cfg)
    template = jax.tree_util.tree_map(np.asarray, unet.init_params(jax.random.key(0)))
    sd_np = _emit_torch_keys_from_template(template, cfg)

    root = tmp_path / "torch_pipe"
    (root / "unet").mkdir(parents=True)
    (root / "scheduler").mkdir()
    (root / "mel").mkdir()

    json.dump({"_class_name": "AudioDiffusionPipeline"}, open(root / "model_index.json", "w"))
    json.dump({
        "_class_name": "UNet2DModel",
        "sample_size": [16, 16],
        "in_channels": 1,
        "out_channels": 1,
        "layers_per_block": 2,
        "block_out_channels": [8, 16],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
        "norm_num_groups": 4,
        "attention_head_dim": 4,
    }, open(root / "unet" / "config.json", "w"))
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd_np.items()},
               root / "unet" / "diffusion_pytorch_model.bin")
    json.dump({"_class_name": "DDIMScheduler", "num_train_timesteps": 1000,
               "beta_start": 0.0001, "beta_end": 0.02, "beta_schedule": "linear",
               "clip_sample": True, "_diffusers_version": "0.24.0"},
              open(root / "scheduler" / "scheduler_config.json", "w"))
    json.dump({"_class_name": "Mel", "x_res": 16, "y_res": 16, "sample_rate": 22050,
               "n_fft": 2048, "hop_length": 512, "top_db": 80, "n_iter": 2,
               "_diffusers_version": "0.24.0"},
              open(root / "mel" / "mel_config.json", "w"))

    pipe = AudioDiffusionPipeline.from_pretrained(str(root))
    # Weights made it through the conversion byte-exact.
    np.testing.assert_array_equal(
        np.asarray(pipe.unet_params["conv_in"]["kernel"]), template["conv_in"]["kernel"]
    )
    raw = pipe(batch_size=1, steps=2, key=jax.random.key(0), return_images_only=True)
    assert raw.shape == (1, 16, 16)


def test_convert_checkpoint_cli(tmp_path):
    """scripts/convert_checkpoint.py converts a torch pipeline dir to native
    format that from_pretrained loads without the torch path."""
    import json
    import os
    import sys

    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline

    cfg = UNetConfig(sample_size=(16, 16), block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                     up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                     layers_per_block=2, norm_num_groups=4, attention_head_dim=4)
    unet = UNet2D(cfg)
    template = jax.tree_util.tree_map(np.asarray, unet.init_params(jax.random.key(0)))
    sd_np = _emit_torch_keys_from_template(template, cfg)

    root = tmp_path / "torch_pipe"
    (root / "unet").mkdir(parents=True)
    (root / "scheduler").mkdir()
    (root / "mel").mkdir()
    json.dump({"_class_name": "AudioDiffusionPipeline"}, open(root / "model_index.json", "w"))
    json.dump({"_class_name": "UNet2DModel", "sample_size": [16, 16], "in_channels": 1,
               "out_channels": 1, "layers_per_block": 2, "block_out_channels": [8, 16],
               "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
               "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
               "norm_num_groups": 4, "attention_head_dim": 4},
              open(root / "unet" / "config.json", "w"))
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd_np.items()},
               root / "unet" / "diffusion_pytorch_model.bin")
    json.dump({"_class_name": "DDIMScheduler", "num_train_timesteps": 1000},
              open(root / "scheduler" / "scheduler_config.json", "w"))
    json.dump({"_class_name": "Mel", "x_res": 16, "y_res": 16, "sample_rate": 22050,
               "n_fft": 2048, "hop_length": 512, "top_db": 80, "n_iter": 2},
              open(root / "mel" / "mel_config.json", "w"))

    sys.path.insert(0, ".")
    from scripts.convert_checkpoint import main as convert_main

    out_dir = str(tmp_path / "native")
    convert_main(["--input", str(root), "--output", out_dir])
    assert os.path.exists(os.path.join(out_dir, "unet", "params.msgpack"))
    pipe = AudioDiffusionPipeline.from_pretrained(out_dir)
    raw = pipe(batch_size=1, steps=2, return_images_only=True)
    assert raw.shape == (1, 16, 16)


# ----------------------------------------------- full-model torch-twin parity

def _import_unet_from_twin(cfg, twin):
    from audio_diffusion_tpu.models import UNet2D
    from audio_diffusion_tpu.utils.torch_import import _check_structure

    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    unet = UNet2D(cfg)
    template = unet.init_params(jax.random.key(0))
    return unet, _check_structure(template, convert_unet(sd, cfg))


def test_full_unet_torch_parity_unconditional():
    """Forward parity of the complete unconditional stack (ResNet + self-attn
    + down/up/skip wiring + timestep embedding) against an independently
    written torch twin, through the real weight converter (VERDICT r1 #3)."""
    from torch_twins import TorchUNet2D
    from audio_diffusion_tpu.models import UNetConfig

    cfg = UNetConfig(
        sample_size=(16, 16),
        block_out_channels=(8, 16, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=2,
        norm_num_groups=4,
        attention_head_dim=4,
    )
    torch.manual_seed(11)
    twin = TorchUNet2D(cfg).eval()
    unet, params = _import_unet_from_twin(cfg, twin)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([7, 613], dtype=np.int64)
    with torch.no_grad():
        golden = twin(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = unet.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_full_unet_torch_parity_conditional():
    """Same gate for the cross-attention UNet — exercises the diffusers
    0.12-0.24 head convention (attention_head_dim == NUM heads in
    Transformer2D), GEGLU split order, and context projections."""
    from torch_twins import TorchUNet2D
    from audio_diffusion_tpu.models import UNetConfig

    cfg = UNetConfig(
        sample_size=(16, 16),
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
        attention_head_dim=4,
        cross_attention_dim=12,
    )
    torch.manual_seed(13)
    twin = TorchUNet2D(cfg).eval()
    unet, params = _import_unet_from_twin(cfg, twin)

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    enc = rng.standard_normal((2, 3, 12)).astype(np.float32)
    t = np.array([42, 999], dtype=np.int64)
    with torch.no_grad():
        golden = twin(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(enc)).numpy()
    ours = unet.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), jnp.asarray(enc)
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_full_unet_torch_parity_flagship_64():
    """The flagship gate: the reference's EXACT unconditional architecture
    (train_unet.py:115-137 — 6 blocks, 128..512 channels, attn in 5th down /
    2nd up) at 64x64, random weights, forward parity <= 1e-4. De-risks
    published-checkpoint import end to end."""
    from torch_twins import TorchUNet2D
    from audio_diffusion_tpu.models import unconditional_config

    cfg = unconditional_config(sample_size=(64, 64))
    torch.manual_seed(17)
    twin = TorchUNet2D(cfg).eval()
    unet, params = _import_unet_from_twin(cfg, twin)

    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    t = np.array([250], dtype=np.int64)
    with torch.no_grad():
        golden = twin(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = unet.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_full_vae_torch_parity():
    """AutoencoderKL twin parity: encoder moments (quant_conv output) and
    decoder reconstruction, incl. the LDM asymmetric downsample padding."""
    from torch_twins import TorchAutoencoderKL
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from audio_diffusion_tpu.utils.torch_import import _check_structure, convert_vae

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=2,
                    latent_channels=2, sample_size=32, norm_num_groups=4)
    torch.manual_seed(19)
    twin = TorchAutoencoderKL(cfg).eval()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    vae = AutoencoderKL(cfg)
    template = vae.init_params(jax.random.key(0), sample_hw=(32, 32))
    params = _check_structure(template, convert_vae(sd, cfg))

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments_golden = twin.encode_moments(torch.from_numpy(x)).numpy()
        z = moments_golden[:, : cfg.latent_channels]  # mean half
        dec_golden = twin.decode(torch.from_numpy(z)).numpy()

    posterior = vae.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), method=vae.encode)
    ours_moments = np.concatenate(
        [np.asarray(posterior.mean), np.asarray(posterior.logvar)], axis=-1
    )
    np.testing.assert_allclose(ours_moments.transpose(0, 3, 1, 2), moments_golden, atol=1e-4)

    ours_dec = vae.apply({"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)), method=vae.decode)
    np.testing.assert_allclose(np.asarray(ours_dec).transpose(0, 3, 1, 2), dec_golden, atol=1e-4)


# -------------------------------------------------- CompVis LDM VAE converter

def _diffusers_vae_sd_to_ldm(sd, cfg):
    """Test helper: rewrite a diffusers-layout VAE state dict into the CompVis
    LDM checkpoint layout — the inverse of ldm_vae_to_diffusers, so the two
    compose to identity. Attention projections go back to 1x1 convs, decoder
    up-block indices flip, conv_shortcut -> nin_shortcut."""
    n_up = len(cfg.block_out_channels)
    mid_inv = {
        "resnets.0": "block_1",
        "resnets.1": "block_2",
    }
    attn_inv = {"group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v", "to_out.0": "proj_out"}
    out = {}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("quant_conv", "post_quant_conv"):
            out[key] = val
            continue
        side, rest = parts[0], parts[1:]
        if rest[0] == "conv_norm_out":
            new = "norm_out." + ".".join(rest[1:])
        elif rest[0] == "down_blocks":
            i, kind = rest[1], rest[2]
            if kind == "resnets":
                new = f"down.{i}.block.{rest[3]}." + ".".join(rest[4:])
            else:  # downsamplers.0.conv
                new = f"down.{i}.downsample." + ".".join(rest[4:])
        elif rest[0] == "up_blocks":
            i = n_up - 1 - int(rest[1])
            kind = rest[2]
            if kind == "resnets":
                new = f"up.{i}.block.{rest[3]}." + ".".join(rest[4:])
            else:  # upsamplers.0.conv
                new = f"up.{i}.upsample." + ".".join(rest[4:])
        elif rest[0] == "mid_block":
            if rest[1] == "resnets":
                new = f"mid.{mid_inv['resnets.' + rest[2]]}." + ".".join(rest[3:])
            else:  # attentions.0.<proj>.<w/b>
                tail = ".".join(rest[3:])
                for diff_name, ldm_name in attn_inv.items():
                    if tail.startswith(diff_name + "."):
                        leaf = tail[len(diff_name) + 1:]
                        if leaf == "weight" and val.ndim == 2:
                            val = val[:, :, None, None]  # linear -> 1x1 conv
                        new = f"mid.attn_1.{ldm_name}.{leaf}"
                        break
        else:
            new = ".".join(rest)
        new = new.replace(".conv_shortcut.", ".nin_shortcut.")
        out[f"{side}.{new}"] = val
    return out


def test_ldm_vae_roundtrip_and_prefix():
    """ldm_vae_to_diffusers inverts the LDM rename exactly: converting an
    LDM-layout state dict yields the same native tree as converting the
    diffusers layout directly; loss.* keys drop; the full-LDM
    first_stage_model. prefix is stripped."""
    from torch_twins import TorchAutoencoderKL
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from audio_diffusion_tpu.utils.torch_import import (
        _check_structure, convert_vae, ldm_vae_to_diffusers,
    )

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=2,
                    latent_channels=2, sample_size=32, norm_num_groups=4)
    torch.manual_seed(7)
    twin = TorchAutoencoderKL(cfg).eval()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}

    ldm_sd = _diffusers_vae_sd_to_ldm(sd, cfg)
    ldm_sd["loss.discriminator.main.0.weight"] = np.zeros((4, 1, 4, 4), np.float32)
    ldm_sd["loss.perceptual_loss.net.slice1.0.weight"] = np.zeros((4,), np.float32)

    vae = AutoencoderKL(cfg)
    template = vae.init_params(jax.random.key(0), sample_hw=(32, 32))
    direct = _check_structure(template, convert_vae(sd, cfg))
    via_ldm = _check_structure(template, convert_vae(ldm_vae_to_diffusers(ldm_sd), cfg))
    jax.tree_util.tree_map(np.testing.assert_array_equal, direct, via_ldm)

    # Full-LDM checkpoints store the VAE under first_stage_model.
    prefixed = {f"first_stage_model.{k}": v for k, v in ldm_sd.items()}
    via_prefixed = _check_structure(template, convert_vae(ldm_vae_to_diffusers(prefixed), cfg))
    jax.tree_util.tree_map(np.testing.assert_array_equal, direct, via_prefixed)


def test_vae_config_from_ldm_reference_recipe():
    """The reference's ddconfig (config/ldm_autoencoder_kl.yaml:18-28) maps to
    the LDM VAE architecture: ch*ch_mult channels, z_channels latents."""
    from audio_diffusion_tpu.utils.torch_import import vae_config_from_ldm

    ddconfig = {"double_z": True, "z_channels": 1, "resolution": 256,
                "in_channels": 1, "out_ch": 1, "ch": 128, "ch_mult": [1, 2, 4, 4],
                "num_res_blocks": 2, "attn_resolutions": [], "dropout": 0.0}
    cfg = vae_config_from_ldm(ddconfig)
    assert cfg.block_out_channels == (128, 256, 512, 512)
    assert cfg.latent_channels == 1
    assert cfg.layers_per_block == 2
    assert cfg.in_channels == 1 and cfg.out_channels == 1
    assert cfg.sample_size == 256
    assert cfg.scaling_factor == 0.18215


def test_convert_ldm_checkpoint_cli(tmp_path):
    """End-to-end: a torch-lightning LDM .ckpt + yaml converts to a native
    vqvae dir whose decode matches the torch twin (the reference's
    convert_ldm_to_hf_vae path, utils.py:294-303)."""
    import yaml
    from flax import serialization

    from torch_twins import TorchAutoencoderKL
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                    latent_channels=2, sample_size=32, norm_num_groups=32)
    torch.manual_seed(11)
    twin = TorchAutoencoderKL(cfg).eval()
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    ldm_sd = {k: torch.from_numpy(v.copy()) for k, v in _diffusers_vae_sd_to_ldm(sd, cfg).items()}

    ckpt_path = str(tmp_path / "last.ckpt")
    torch.save({"state_dict": ldm_sd, "epoch": 3}, ckpt_path)
    config_path = str(tmp_path / "ldm_autoencoder_kl.yaml")
    ddconfig = {"double_z": True, "z_channels": 2, "resolution": 32, "in_channels": 1,
                "out_ch": 1, "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                "attn_resolutions": [], "dropout": 0.0}
    with open(config_path, "w") as fh:
        yaml.safe_dump({"model": {"params": {"ddconfig": ddconfig}}}, fh)

    import sys
    sys.path.insert(0, ".")
    from scripts.convert_checkpoint import main as convert_main

    out_dir = str(tmp_path / "vae_native")
    convert_main(["--input", ckpt_path, "--ldm_config", config_path, "--output", out_dir])

    vae_cfg = VAEConfig.from_pretrained(out_dir)
    vae = AutoencoderKL(vae_cfg)
    template = vae.init_params(jax.random.key(0), sample_hw=(32, 32))
    with open(f"{out_dir}/params.msgpack", "rb") as fh:
        params = serialization.from_bytes(template, fh.read())

    rng = np.random.default_rng(3)
    z = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    with torch.no_grad():
        golden = twin.decode(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()
    ours = vae.apply({"params": params}, jnp.asarray(z), method=vae.decode)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=1e-4)


def test_ldm_vae_unmapped_attention_raises():
    """A ddconfig with non-empty attn_resolutions produces down/up-block
    attention keys this VAE family does not have — converting must fail
    loudly, not silently drop layers."""
    from audio_diffusion_tpu.utils.torch_import import ldm_vae_to_diffusers

    sd = {
        "encoder.conv_in.weight": np.zeros((8, 1, 3, 3), np.float32),
        "decoder.up.0.attn.0.q.weight": np.zeros((8, 8, 1, 1), np.float32),
    }
    with pytest.raises(ValueError, match="attn_resolutions"):
        ldm_vae_to_diffusers(sd)
