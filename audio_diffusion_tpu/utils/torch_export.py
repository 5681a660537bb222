"""Flax -> torch (diffusers) checkpoint export — the inverse of torch_import.

Writes the exact diffusers on-disk pipeline layout the reference stack loads
(reference: ``DiffusionPipeline.from_pretrained`` consuming the directory
written by train_unet.py:302-303 — unet/, scheduler/, mel/, optional vqvae/,
model_index.json), so a model trained on TPU here deploys unchanged in the
torch/diffusers ecosystem. This completes the interop loop whose other half
is ``torch_import.py``; the reference's own ``utils.py`` (LDM->diffusers,
utils.py:294-303) plays the same "export into diffusers format" role.

Weight-layout rules are the exact inverses of torch_import's:

* Flax conv kernel HWIO ``(H, W, I, O)`` -> Conv2d ``(O, I, H, W)``;
* Dense ``(I, O)`` -> Linear ``(O, I)``;
* Norm ``scale``/``bias`` -> ``weight``/``bias``;
* self-attention ``to_out`` -> diffusers ``to_out.0`` (Attention wraps the
  projection in a ModuleList with dropout);
* conditional Transformer2D projections export as Linear with
  ``use_linear_projection: true`` in the config — diffusers supports both
  conv1x1 and linear; linear matches this framework's Dense bit-for-bit.

Exported state dicts load strict=True into the hand-written torch twins
(tests/torch_twins.py), which gates both key names and layouts; forward
parity vs the flax model is asserted in tests/test_torch_export.py.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

DIFFUSERS_VERSION = "0.24.0"  # the reference's pinned version (requirements-lock.txt)


# ---------------------------------------------------------------- primitives

def conv_kernel_out(k: np.ndarray) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def dense_kernel_out(k: np.ndarray) -> np.ndarray:
    """(I, O) -> (O, I)."""
    return np.transpose(np.asarray(k), (1, 0))


class _Out:
    """Flat state-dict builder with dotted-prefix scoping."""

    def __init__(self):
        self.sd: Dict[str, np.ndarray] = {}

    def put(self, key: str, value: np.ndarray) -> None:
        self.sd[key] = np.asarray(value, dtype=np.float32)

    def conv(self, name: str, p: dict) -> None:
        self.put(f"{name}.weight", conv_kernel_out(p["kernel"]))
        if "bias" in p:
            self.put(f"{name}.bias", p["bias"])

    def dense(self, name: str, p: dict) -> None:
        self.put(f"{name}.weight", dense_kernel_out(p["kernel"]))
        if "bias" in p:
            self.put(f"{name}.bias", p["bias"])

    def norm(self, name: str, p: dict) -> None:
        self.put(f"{name}.weight", p["scale"])
        self.put(f"{name}.bias", p["bias"])

    def resnet(self, prefix: str, p: dict) -> None:
        self.norm(f"{prefix}.norm1", p["norm1"])
        self.conv(f"{prefix}.conv1", p["conv1"])
        self.norm(f"{prefix}.norm2", p["norm2"])
        self.conv(f"{prefix}.conv2", p["conv2"])
        if "time_emb_proj" in p:
            self.dense(f"{prefix}.time_emb_proj", p["time_emb_proj"])
        if "conv_shortcut" in p:
            self.conv(f"{prefix}.conv_shortcut", p["conv_shortcut"])

    def self_attention(self, prefix: str, p: dict) -> None:
        self.norm(f"{prefix}.group_norm", p["group_norm"])
        self.dense(f"{prefix}.to_q", p["to_q"])
        self.dense(f"{prefix}.to_k", p["to_k"])
        self.dense(f"{prefix}.to_v", p["to_v"])
        self.dense(f"{prefix}.to_out.0", p["to_out"])

    def cross_attention(self, prefix: str, p: dict) -> None:
        self.dense(f"{prefix}.to_q", p["to_q"])
        self.dense(f"{prefix}.to_k", p["to_k"])
        self.dense(f"{prefix}.to_v", p["to_v"])
        self.dense(f"{prefix}.to_out.0", p["to_out"])

    def transformer2d(self, prefix: str, p: dict) -> None:
        self.norm(f"{prefix}.norm", p["norm"])
        self.dense(f"{prefix}.proj_in", p["proj_in"])
        self.dense(f"{prefix}.proj_out", p["proj_out"])
        blk, bp = f"{prefix}.transformer_blocks.0", p["transformer_blocks_0"]
        self.norm(f"{blk}.norm1", bp["norm1"])
        self.cross_attention(f"{blk}.attn1", bp["attn1"])
        self.norm(f"{blk}.norm2", bp["norm2"])
        self.cross_attention(f"{blk}.attn2", bp["attn2"])
        self.norm(f"{blk}.norm3", bp["norm3"])
        self.dense(f"{blk}.ff.net.0.proj", bp["ff"]["proj_in"])
        self.dense(f"{blk}.ff.net.2", bp["ff"]["proj_out"])


# -------------------------------------------------------------------- UNet

def export_unet(params: dict, config) -> Dict[str, np.ndarray]:
    """UNet2D params tree -> diffusers UNet2D(Condition)Model state dict
    (inverse of torch_import.convert_unet)."""
    out = _Out()
    out.dense("time_embedding.linear_1", params["time_embedding"]["linear_1"])
    out.dense("time_embedding.linear_2", params["time_embedding"]["linear_2"])
    out.conv("conv_in", params["conv_in"])
    out.norm("conv_norm_out", params["conv_norm_out"])
    out.conv("conv_out", params["conv_out"])

    n_blocks = len(config.block_out_channels)
    for i, block_type in enumerate(config.down_block_types):
        for j in range(config.layers_per_block):
            out.resnet(f"down_blocks.{i}.resnets.{j}", params[f"down_{i}_res_{j}"])
            if block_type == "AttnDownBlock2D":
                out.self_attention(f"down_blocks.{i}.attentions.{j}", params[f"down_{i}_attn_{j}"])
            elif block_type == "CrossAttnDownBlock2D":
                out.transformer2d(f"down_blocks.{i}.attentions.{j}", params[f"down_{i}_xattn_{j}"])
        if i != n_blocks - 1:
            out.conv(f"down_blocks.{i}.downsamplers.0.conv", params[f"down_{i}_downsample"]["conv"])

    out.resnet("mid_block.resnets.0", params["mid_res_0"])
    out.resnet("mid_block.resnets.1", params["mid_res_1"])
    if config.is_conditional:
        out.transformer2d("mid_block.attentions.0", params["mid_xattn"])
    else:
        out.self_attention("mid_block.attentions.0", params["mid_attn"])

    for i, block_type in enumerate(config.up_block_types):
        for j in range(config.layers_per_block + 1):
            out.resnet(f"up_blocks.{i}.resnets.{j}", params[f"up_{i}_res_{j}"])
            if block_type == "AttnUpBlock2D":
                out.self_attention(f"up_blocks.{i}.attentions.{j}", params[f"up_{i}_attn_{j}"])
            elif block_type == "CrossAttnUpBlock2D":
                out.transformer2d(f"up_blocks.{i}.attentions.{j}", params[f"up_{i}_xattn_{j}"])
        if i != n_blocks - 1:
            out.conv(f"up_blocks.{i}.upsamplers.0.conv", params[f"up_{i}_upsample"]["conv"])
    return out.sd


def unet_config_to_diffusers(config) -> dict:
    cfg = {
        "_class_name": "UNet2DConditionModel" if config.is_conditional else "UNet2DModel",
        "_diffusers_version": DIFFUSERS_VERSION,
        # sample_size may be an int (UNetConfig.sample_hw normalizes both forms)
        "sample_size": list(config.sample_hw()),
        "in_channels": config.in_channels,
        "out_channels": config.out_channels,
        "layers_per_block": config.layers_per_block,
        "block_out_channels": list(config.block_out_channels),
        "down_block_types": list(config.down_block_types),
        "up_block_types": list(config.up_block_types),
        "attention_head_dim": config.attention_head_dim,
        "norm_num_groups": config.norm_num_groups,
        "norm_eps": config.norm_eps,
        "flip_sin_to_cos": config.flip_sin_to_cos,
        "freq_shift": config.freq_shift,
    }
    if config.is_conditional:
        cfg["cross_attention_dim"] = config.cross_attention_dim
        # This framework's Dense projections are Linear, not conv1x1
        # (diffusers supports both; the flag makes the state dict match).
        cfg["use_linear_projection"] = True
        cfg["mid_block_type"] = "UNetMidBlock2DCrossAttn"
    return cfg


# --------------------------------------------------------------------- VAE

def _export_vae_coder(out: _Out, prefix: str, params: dict, config, is_encoder: bool) -> None:
    out.conv(f"{prefix}.conv_in", params["conv_in"])
    out.norm(f"{prefix}.conv_norm_out", params["conv_norm_out"])
    out.conv(f"{prefix}.conv_out", params["conv_out"])
    out.resnet(f"{prefix}.mid_block.resnets.0", params["mid_res_0"])
    out.self_attention(f"{prefix}.mid_block.attentions.0", params["mid_attn"])
    out.resnet(f"{prefix}.mid_block.resnets.1", params["mid_res_1"])

    n_blocks = len(config.block_out_channels)
    if is_encoder:
        for i in range(n_blocks):
            for j in range(config.layers_per_block):
                out.resnet(f"{prefix}.down_blocks.{i}.resnets.{j}", params[f"down_{i}_res_{j}"])
            if i != n_blocks - 1:
                out.conv(f"{prefix}.down_blocks.{i}.downsamplers.0.conv", params[f"down_{i}_downsample"])
    else:
        for i in range(n_blocks):
            for j in range(config.layers_per_block + 1):
                out.resnet(f"{prefix}.up_blocks.{i}.resnets.{j}", params[f"up_{i}_res_{j}"])
            if i != n_blocks - 1:
                out.conv(f"{prefix}.up_blocks.{i}.upsamplers.0.conv", params[f"up_{i}_upsample"])


def export_vae(params: dict, config) -> Dict[str, np.ndarray]:
    """AutoencoderKL params tree -> diffusers state dict (inverse of
    torch_import.convert_vae)."""
    out = _Out()
    _export_vae_coder(out, "encoder", params["encoder"], config, is_encoder=True)
    _export_vae_coder(out, "decoder", params["decoder"], config, is_encoder=False)
    out.conv("quant_conv", params["quant_conv"])
    out.conv("post_quant_conv", params["post_quant_conv"])
    return out.sd


def vae_config_to_diffusers(config) -> dict:
    n = len(config.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "_diffusers_version": DIFFUSERS_VERSION,
        "in_channels": config.in_channels,
        "out_channels": config.out_channels,
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "up_block_types": ["UpDecoderBlock2D"] * n,
        "block_out_channels": list(config.block_out_channels),
        "layers_per_block": config.layers_per_block,
        "latent_channels": config.latent_channels,
        "norm_num_groups": config.norm_num_groups,
        "sample_size": config.sample_size,
        "scaling_factor": config.scaling_factor,
        "act_fn": "silu",
    }


# ------------------------------------------------------------------ pipeline

def _save_state_dict(sd: Dict[str, np.ndarray], model_dir: str) -> None:
    import torch

    os.makedirs(model_dir, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               os.path.join(model_dir, "diffusion_pytorch_model.bin"))


def _write_json(obj: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2, sort_keys=True)


def save_pipeline_torch(pipe, directory: str) -> None:
    """Write ``pipe`` as a torch diffusers AudioDiffusionPipeline directory.

    The result loads in the reference stack via
    ``DiffusionPipeline.from_pretrained(directory)`` (diffusers >= 0.12, which
    bundles AudioDiffusionPipeline/Mel) — and round-trips back into this
    framework through ``torch_import.pipeline_from_torch_pretrained``.
    """
    os.makedirs(directory, exist_ok=True)
    index = {
        "_class_name": "AudioDiffusionPipeline",
        "_diffusers_version": DIFFUSERS_VERSION,
        "mel": ["diffusers", "Mel"],
        "scheduler": ["diffusers", type(pipe.scheduler).__name__],
        "unet": ["diffusers",
                 "UNet2DConditionModel" if pipe.unet.config.is_conditional else "UNet2DModel"],
    }
    if pipe.vqvae is not None:
        index["vqvae"] = ["diffusers", "AutoencoderKL"]
    _write_json(index, os.path.join(directory, "model_index.json"))

    unet_dir = os.path.join(directory, "unet")
    _write_json(unet_config_to_diffusers(pipe.unet.config), os.path.join(unet_dir, "config.json"))
    _save_state_dict(export_unet(pipe.unet_params, pipe.unet.config), unet_dir)

    sched_cfg = pipe.scheduler.config.config_dict()
    sched_cfg["_class_name"] = type(pipe.scheduler).__name__
    sched_cfg["_diffusers_version"] = DIFFUSERS_VERSION
    sched_cfg.pop("_version", None)
    _write_json(sched_cfg, os.path.join(directory, "scheduler", "scheduler_config.json"))

    mel_cfg = pipe.mel.config.config_dict()
    mel_cfg["_class_name"] = "Mel"
    mel_cfg["_diffusers_version"] = DIFFUSERS_VERSION
    mel_cfg.pop("_version", None)
    _write_json(mel_cfg, os.path.join(directory, "mel", "mel_config.json"))

    if pipe.vqvae is not None:
        vae_dir = os.path.join(directory, "vqvae")
        _write_json(vae_config_to_diffusers(pipe.vqvae.config), os.path.join(vae_dir, "config.json"))
        _save_state_dict(export_vae(pipe.vqvae_params, pipe.vqvae.config), vae_dir)
