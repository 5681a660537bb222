"""Torch (diffusers) checkpoint -> Flax parameter import.

The analog of the reference's LDM->diffusers converter (reference:
audiodiffusion/utils.py:294-303) pointed the other way: it maps published
torch diffusers checkpoints (teticio/audio-diffusion-256 et al.) onto this
framework's Flax modules so every parity gate can run against real weights
(SURVEY.md §5.4).

Weight-layout rules:
* Conv2d ``(O, I, H, W)`` -> HWIO ``(H, W, I, O)``;
* depthwise Conv2d ``(C, 1, H, W)`` -> ``(H, W, 1, C)`` (same transpose);
* Linear ``(O, I)`` -> ``(I, O)``;
* 1x1-conv projections used where this framework uses Dense -> squeeze + transpose;
* Norm ``weight``/``bias`` -> ``scale``/``bias``; BatchNorm running stats ->
  ``batch_stats`` collection (torch momentum 0.01 == flax momentum 0.99);
* old-style diffusers ``AttentionBlock`` keys (query/key/value/proj_attn) are
  accepted as aliases for to_q/to_k/to_v/to_out.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np


# ------------------------------------------------------------------- loading

def load_torch_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read diffusion_pytorch_model.{safetensors,bin} into numpy arrays."""
    st_path = os.path.join(model_dir, "diffusion_pytorch_model.safetensors")
    bin_path = os.path.join(model_dir, "diffusion_pytorch_model.bin")
    if os.path.exists(st_path):
        try:
            from safetensors.numpy import load_file

            return dict(load_file(st_path))
        except ImportError:
            pass
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No torch weights found in {model_dir}")


# ---------------------------------------------------------------- primitives

def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def conv1x1_as_dense(w: np.ndarray) -> np.ndarray:
    """(O, I, 1, 1) conv used as a token-wise projection -> (I, O) dense."""
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


class _SD:
    """State-dict view with prefix scoping and old/new attention aliases."""

    ALIASES = {"to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn"}

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def scope(self, name: str) -> "_SD":
        return _SD(self.sd, f"{self.prefix}{name}.")

    def get(self, key: str) -> np.ndarray:
        full = self.prefix + key
        if full in self.sd:
            return np.asarray(self.sd[full])
        # Old AttentionBlock naming.
        for new, old in self.ALIASES.items():
            if key.startswith(new):
                alt = self.prefix + key.replace(new, old, 1)
                if alt in self.sd:
                    return np.asarray(self.sd[alt])
        raise KeyError(full)

    def has(self, key: str) -> bool:
        try:
            self.get(key)
            return True
        except KeyError:
            return False


def _norm(sd: _SD, name: str) -> dict:
    return {"scale": sd.get(f"{name}.weight"), "bias": sd.get(f"{name}.bias")}


def _conv(sd: _SD, name: str) -> dict:
    out = {"kernel": conv_kernel(sd.get(f"{name}.weight"))}
    if sd.has(f"{name}.bias"):
        out["bias"] = sd.get(f"{name}.bias")
    return out


def _dense(sd: _SD, name: str, from_conv1x1: bool = False) -> dict:
    w = sd.get(f"{name}.weight")
    kernel = conv1x1_as_dense(w) if (from_conv1x1 or w.ndim == 4) else dense_kernel(w)
    out = {"kernel": kernel}
    if sd.has(f"{name}.bias"):
        out["bias"] = sd.get(f"{name}.bias")
    return out


def _resnet(sd: _SD, with_temb: bool = True) -> dict:
    out = {
        "norm1": _norm(sd, "norm1"),
        "conv1": _conv(sd, "conv1"),
        "norm2": _norm(sd, "norm2"),
        "conv2": _conv(sd, "conv2"),
    }
    if with_temb and sd.has("time_emb_proj.weight"):
        out["time_emb_proj"] = _dense(sd, "time_emb_proj")
    if sd.has("conv_shortcut.weight"):
        out["conv_shortcut"] = _conv(sd, "conv_shortcut")
    elif sd.has("nin_shortcut.weight"):
        out["conv_shortcut"] = _conv(sd, "nin_shortcut")
    return out


def _self_attention(sd: _SD) -> dict:
    return {
        "group_norm": _norm(sd, "group_norm"),
        "to_q": _dense(sd, "to_q"),
        "to_k": _dense(sd, "to_k"),
        "to_v": _dense(sd, "to_v"),
        "to_out": _dense(sd, "to_out.0"),
    }


def _cross_attention(sd: _SD) -> dict:
    return {
        "to_q": _dense(sd, "to_q"),
        "to_k": _dense(sd, "to_k"),
        "to_v": _dense(sd, "to_v"),
        "to_out": _dense(sd, "to_out.0"),
    }


def _transformer2d(sd: _SD) -> dict:
    blk = sd.scope("transformer_blocks.0")
    return {
        "norm": _norm(sd, "norm"),
        "proj_in": _dense(sd, "proj_in"),  # conv1x1 or linear; both handled
        "proj_out": _dense(sd, "proj_out"),
        "transformer_blocks_0": {
            "norm1": _norm(blk, "norm1"),
            "attn1": _cross_attention(blk.scope("attn1")),
            "norm2": _norm(blk, "norm2"),
            "attn2": _cross_attention(blk.scope("attn2")),
            "norm3": _norm(blk, "norm3"),
            "ff": {
                "proj_in": _dense(blk, "ff.net.0.proj"),
                "proj_out": _dense(blk, "ff.net.2"),
            },
        },
    }


# -------------------------------------------------------------------- UNet

def convert_unet(sd_raw: Dict[str, np.ndarray], config) -> dict:
    """diffusers UNet2D(Condition)Model state dict -> UNet2D params tree."""
    sd = _SD(sd_raw)
    params = {
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }

    n_blocks = len(config.block_out_channels)
    for i, block_type in enumerate(config.down_block_types):
        blk = sd.scope(f"down_blocks.{i}")
        for j in range(config.layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(blk.scope(f"resnets.{j}"))
            if block_type == "AttnDownBlock2D":
                params[f"down_{i}_attn_{j}"] = _self_attention(blk.scope(f"attentions.{j}"))
            elif block_type == "CrossAttnDownBlock2D":
                params[f"down_{i}_xattn_{j}"] = _transformer2d(blk.scope(f"attentions.{j}"))
        if i != n_blocks - 1:
            params[f"down_{i}_downsample"] = {"conv": _conv(blk, "downsamplers.0.conv")}

    mid = sd.scope("mid_block")
    params["mid_res_0"] = _resnet(mid.scope("resnets.0"))
    params["mid_res_1"] = _resnet(mid.scope("resnets.1"))
    if config.is_conditional:
        params["mid_xattn"] = _transformer2d(mid.scope("attentions.0"))
    else:
        params["mid_attn"] = _self_attention(mid.scope("attentions.0"))

    for i, block_type in enumerate(config.up_block_types):
        blk = sd.scope(f"up_blocks.{i}")
        for j in range(config.layers_per_block + 1):
            params[f"up_{i}_res_{j}"] = _resnet(blk.scope(f"resnets.{j}"))
            if block_type == "AttnUpBlock2D":
                params[f"up_{i}_attn_{j}"] = _self_attention(blk.scope(f"attentions.{j}"))
            elif block_type == "CrossAttnUpBlock2D":
                params[f"up_{i}_xattn_{j}"] = _transformer2d(blk.scope(f"attentions.{j}"))
        if i != n_blocks - 1:
            params[f"up_{i}_upsample"] = {"conv": _conv(blk, "upsamplers.0.conv")}
    return params


def unet_config_from_diffusers(config: dict):
    from ..models.unet2d import UNetConfig

    ss = config.get("sample_size", 256)
    if isinstance(ss, int):
        ss = (ss, ss)
    return UNetConfig(
        sample_size=tuple(ss),
        in_channels=config.get("in_channels", 1),
        out_channels=config.get("out_channels", 1),
        layers_per_block=config.get("layers_per_block", 2),
        block_out_channels=tuple(config.get("block_out_channels", (128, 128, 256, 256, 512, 512))),
        down_block_types=tuple(config.get("down_block_types", ())),
        up_block_types=tuple(config.get("up_block_types", ())),
        attention_head_dim=config.get("attention_head_dim", 8) or 8,
        norm_num_groups=config.get("norm_num_groups", 32),
        norm_eps=config.get("norm_eps", 1e-5),
        cross_attention_dim=config.get("cross_attention_dim"),
        flip_sin_to_cos=config.get("flip_sin_to_cos", True),
        freq_shift=config.get("freq_shift", 0),
    )


# --------------------------------------------------------------------- VAE

def _vae_coder(sd: _SD, config, is_encoder: bool) -> dict:
    n_blocks = len(config.block_out_channels)
    out = {
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_res_0": _resnet(sd.scope("mid_block.resnets.0"), with_temb=False),
        "mid_attn": _self_attention(sd.scope("mid_block.attentions.0")),
        "mid_res_1": _resnet(sd.scope("mid_block.resnets.1"), with_temb=False),
    }
    if is_encoder:
        for i in range(n_blocks):
            blk = sd.scope(f"down_blocks.{i}")
            for j in range(config.layers_per_block):
                out[f"down_{i}_res_{j}"] = _resnet(blk.scope(f"resnets.{j}"), with_temb=False)
            if i != n_blocks - 1:
                out[f"down_{i}_downsample"] = _conv(blk, "downsamplers.0.conv")
    else:
        for i in range(n_blocks):
            blk = sd.scope(f"up_blocks.{i}")
            for j in range(config.layers_per_block + 1):
                out[f"up_{i}_res_{j}"] = _resnet(blk.scope(f"resnets.{j}"), with_temb=False)
            if i != n_blocks - 1:
                out[f"up_{i}_upsample"] = _conv(blk, "upsamplers.0.conv")
    return out


def convert_vae(sd_raw: Dict[str, np.ndarray], config) -> dict:
    sd = _SD(sd_raw)
    return {
        "encoder": _vae_coder(sd.scope("encoder"), config, is_encoder=True),
        "decoder": _vae_coder(sd.scope("decoder"), config, is_encoder=False),
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def vae_config_from_diffusers(config: dict):
    from ..models.vae import VAEConfig

    ss = config.get("sample_size", 256)
    if isinstance(ss, (list, tuple)):
        ss = ss[0]
    return VAEConfig(
        in_channels=config.get("in_channels", 1),
        out_channels=config.get("out_channels", 1),
        block_out_channels=tuple(config.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=config.get("layers_per_block", 2),
        latent_channels=config.get("latent_channels", 1),
        sample_size=ss,
        norm_num_groups=config.get("norm_num_groups", 32),
        scaling_factor=config.get("scaling_factor", 0.18215),
    )


# ---------------------------------------- CompVis LDM first-stage VAE ckpts

_LDM_MID = (
    ("mid.block_1.", "mid_block.resnets.0."),
    ("mid.block_2.", "mid_block.resnets.1."),
    ("mid.attn_1.norm.", "mid_block.attentions.0.group_norm."),
    ("mid.attn_1.q.", "mid_block.attentions.0.to_q."),
    ("mid.attn_1.k.", "mid_block.attentions.0.to_k."),
    ("mid.attn_1.v.", "mid_block.attentions.0.to_v."),
    ("mid.attn_1.proj_out.", "mid_block.attentions.0.to_out.0."),
)


def ldm_vae_to_diffusers(sd_raw: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rewrite a CompVis LDM ``AutoencoderKL`` state dict into the diffusers
    key layout that :func:`convert_vae` reads.

    The native analog of the reference's torch-side rename
    (reference: audiodiffusion/utils.py:156-291). Mapping rules:
    training-only state (``loss.*`` — LPIPS net + discriminator) is dropped;
    decoder up-block indices flip (LDM counts ``up.{i}`` from the bottom,
    diffusers ``up_blocks.{i}`` from the top, utils.py:243); ``nin_shortcut``
    becomes ``conv_shortcut`` (utils.py:25); mid-block attention q/k/v/proj
    are stored as 1x1 convs and squeeze to linear weights (utils.py:120-129).
    """
    strip = "first_stage_model."  # full-LDM checkpoints prefix the VAE
    sd = {(k[len(strip):] if k.startswith(strip) else k): v for k, v in sd_raw.items()}
    n_up = 1 + max((int(k.split(".")[2]) for k in sd if k.startswith("decoder.up.")), default=-1)
    out: Dict[str, np.ndarray] = {}
    unmapped: List[str] = []
    for key, val in sd.items():
        if not key.startswith(("encoder.", "decoder.", "quant_conv.", "post_quant_conv.")):
            continue
        orig = key
        parts = key.split(".")
        if len(parts) > 3 and parts[1] == "down":
            rest = ".".join(parts[4:])
            if parts[3] == "block":
                key = f"encoder.down_blocks.{parts[2]}.resnets.{rest}"
            elif parts[3] == "downsample":
                key = f"encoder.down_blocks.{parts[2]}.downsamplers.0.{rest}"
            else:
                # e.g. down.{i}.attn.{j} from a non-empty attn_resolutions —
                # an architecture this VAE family does not have; dropping it
                # silently would "convert" to a numerically different model.
                unmapped.append(orig)
                continue
        elif len(parts) > 3 and parts[1] == "up":
            i = n_up - 1 - int(parts[2])
            rest = ".".join(parts[4:])
            if parts[3] == "block":
                key = f"decoder.up_blocks.{i}.resnets.{rest}"
            elif parts[3] == "upsample":
                key = f"decoder.up_blocks.{i}.upsamplers.0.{rest}"
            else:
                unmapped.append(orig)
                continue
        else:
            for old, new in _LDM_MID:
                prefix = f"{parts[0]}.{old}"
                if key.startswith(prefix):
                    key = f"{parts[0]}.{new}{key[len(prefix):]}"
                    break
            else:
                if len(parts) > 2 and parts[1] in ("mid", "attn"):
                    unmapped.append(orig)
                    continue
        key = key.replace(".nin_shortcut.", ".conv_shortcut.")
        key = key.replace(".norm_out.", ".conv_norm_out.")
        val = np.asarray(val)
        if val.ndim == 4 and any(t in key for t in (".to_q.", ".to_k.", ".to_v.", ".to_out.0.")):
            val = val[:, :, 0, 0]  # 1x1 conv -> linear
        out[key] = val
    if unmapped:
        raise ValueError(
            "LDM VAE checkpoint has layers this converter cannot map (likely a "
            f"non-empty attn_resolutions, which the reference recipe never uses — "
            f"config/ldm_autoencoder_kl.yaml:27): {sorted(unmapped)[:8]}"
        )
    return out


def vae_config_from_ldm(ddconfig: dict, scaling_factor: float = 0.18215):
    """LDM ``ddconfig`` (reference: config/ldm_autoencoder_kl.yaml:18-28) ->
    VAEConfig (the native analog of create_vae_diffusers_config,
    reference: audiodiffusion/utils.py:132-153)."""
    from ..models.vae import VAEConfig

    ch = ddconfig["ch"]
    return VAEConfig(
        in_channels=ddconfig.get("in_channels", 1),
        out_channels=ddconfig.get("out_ch", 1),
        block_out_channels=tuple(ch * m for m in ddconfig["ch_mult"]),
        layers_per_block=ddconfig.get("num_res_blocks", 2),
        latent_channels=ddconfig.get("z_channels", 1),
        sample_size=ddconfig.get("resolution", 256),
        scaling_factor=scaling_factor,
    )


def convert_ldm_vae(sd_raw: Dict[str, np.ndarray], ddconfig: dict):
    """CompVis LDM first-stage checkpoint -> ``(VAEConfig, params)``, the
    native analog of the reference's convert_ldm_to_hf_vae
    (audiodiffusion/utils.py:294-303). ``sd_raw`` is the checkpoint's
    ``state_dict`` as numpy arrays; ``ddconfig`` the LDM model config."""
    config = vae_config_from_ldm(ddconfig)
    params = convert_vae(ldm_vae_to_diffusers(sd_raw), config)
    return config, params


# ------------------------------------------------------------- AudioEncoder

def convert_audio_encoder(sd_raw: Dict[str, np.ndarray]) -> dict:
    """torch AudioEncoder (reference: audio_encoder.py) -> flax variables
    {params, batch_stats}."""
    sd = _SD(sd_raw)
    params, stats = {}, {}
    for i in range(3):
        blk = sd.scope(f"conv_blocks.{i}")
        params[f"conv_block_{i}"] = {
            "sep_conv": {
                "depthwise": {"kernel": conv_kernel(blk.get("sep_conv.depthwise.weight"))},
                "pointwise": _conv(blk, "sep_conv.pointwise"),
            },
            "batch_norm": _norm(blk, "batch_norm"),
        }
        stats[f"conv_block_{i}"] = {
            "batch_norm": {
                "mean": blk.get("batch_norm.running_mean"),
                "var": blk.get("batch_norm.running_var"),
            }
        }
    params["dense"] = _dense(sd, "dense_block.dense")
    params["dense_norm"] = _norm(sd.scope("dense_block"), "batch_norm")
    stats["dense_norm"] = {
        "mean": sd.get("dense_block.batch_norm.running_mean"),
        "var": sd.get("dense_block.batch_norm.running_var"),
    }
    params["embedding"] = _dense(sd, "embedding")
    return {"params": params, "batch_stats": stats}


def load_audio_encoder(model_dir: str):
    """Load a torch AudioEncoder checkpoint dir -> (module, variables)."""
    from ..models.audio_encoder import AudioEncoder

    sd = load_torch_state_dict(model_dir)
    encoder = AudioEncoder()
    variables = convert_audio_encoder(sd)
    import jax

    template = encoder.init_variables(jax.random.key(0))
    return encoder, _check_structure(template, variables)


# ------------------------------------------------------------------ pipeline

def _check_structure(template, converted):
    """Validate converted trees leaf-by-leaf against the module's own init
    (shape mismatches surface immediately with full paths)."""
    import jax

    t_flat = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    c_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    missing = set(t_flat) - set(c_flat)
    extra = set(c_flat) - set(t_flat)
    if missing or extra:
        raise ValueError(f"param tree mismatch: missing={sorted(map(str, missing))[:5]} "
                         f"extra={sorted(map(str, extra))[:5]}")
    for path, t_leaf in t_flat.items():
        c_leaf = c_flat[path]
        if tuple(np.shape(t_leaf)) != tuple(np.shape(c_leaf)):
            raise ValueError(f"shape mismatch at {jax.tree_util.keystr(path)}: "
                             f"{np.shape(c_leaf)} vs expected {np.shape(t_leaf)}")
    return jax.tree_util.tree_map(
        lambda t, c: np.asarray(c, dtype=np.asarray(t).dtype), template, converted
    )


def vae_from_torch_dir(vae_dir: str, dtype: str | None = None):
    """Load a standalone torch diffusers ``AutoencoderKL`` directory (the
    reference hands such dirs/ids straight to ``AutoencoderKL.from_pretrained``
    for latent training, train_unet.py:99). Returns ``(vqvae, params)``."""
    import dataclasses

    import jax

    from ..models.vae import AutoencoderKL

    with open(os.path.join(vae_dir, "config.json")) as fh:
        vae_cfg = vae_config_from_diffusers(json.load(fh))
    if dtype is not None:
        vae_cfg = dataclasses.replace(vae_cfg, dtype=dtype)
    vqvae = AutoencoderKL(vae_cfg)
    template = vqvae.init_params(jax.random.key(0))
    params = _check_structure(template, convert_vae(load_torch_state_dict(vae_dir), vae_cfg))
    return vqvae, params


def pipeline_from_torch_pretrained(directory: str, dtype: str | None = None):
    """Load a torch diffusers AudioDiffusionPipeline directory (the published
    HF checkpoints) into this framework's pipeline.

    ``dtype`` overrides the COMPUTE dtype of the UNet and VAE (params stay in
    their stored precision) — same serving-time override as
    :meth:`AudioDiffusionPipeline.from_pretrained`."""
    import dataclasses

    import jax

    from ..mel import Mel
    from ..models.unet2d import UNet2D
    from ..pipelines.pipeline import AudioDiffusionPipeline
    from ..schedulers import load_scheduler

    unet_dir = os.path.join(directory, "unet")
    with open(os.path.join(unet_dir, "config.json")) as fh:
        unet_cfg_raw = json.load(fh)
    if unet_cfg_raw.get("_class_name") == "UNet2DConditionModel" and "cross_attention_dim" not in unet_cfg_raw:
        unet_cfg_raw["cross_attention_dim"] = 1280
    config = unet_config_from_diffusers(unet_cfg_raw)
    if dtype is not None:
        config = dataclasses.replace(config, dtype=dtype)
    unet = UNet2D(config)
    template = unet.init_params(jax.random.key(0))
    unet_params = _check_structure(template, convert_unet(load_torch_state_dict(unet_dir), config))

    scheduler = load_scheduler(os.path.join(directory, "scheduler"))

    mel_dir = directory if os.path.exists(os.path.join(directory, "mel_config.json")) else os.path.join(directory, "mel")
    mel = Mel.from_pretrained(mel_dir)

    vqvae = vqvae_params = None
    vae_dir = os.path.join(directory, "vqvae")
    if os.path.isdir(vae_dir):
        vqvae, vqvae_params = vae_from_torch_dir(vae_dir, dtype)

    return AudioDiffusionPipeline(unet, unet_params, mel, scheduler, vqvae, vqvae_params)
