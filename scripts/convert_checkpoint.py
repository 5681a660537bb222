#!/usr/bin/env python
"""Convert AudioDiffusionPipeline checkpoints between the torch diffusers
on-disk layout and this framework's native format — both directions.

    # torch (published teticio/* dirs, downloaded) -> native
    python scripts/convert_checkpoint.py --input path/to/torch_dir --output models/native_dir

    # native (trained here) -> torch diffusers layout, loadable by the
    # reference stack via DiffusionPipeline.from_pretrained
    python scripts/convert_checkpoint.py --input models/native_dir --output path/to/torch_dir --to torch

Also converts CompVis latent-diffusion VAE checkpoints (the reference's
train_vae.py output format) into a native vqvae directory, matching the
reference's convert_ldm_to_hf_vae (audiodiffusion/utils.py:294-303):

    python scripts/convert_checkpoint.py --input last.ckpt \\
        --ldm_config config/ldm_autoencoder_kl.yaml --output models/vae_dir
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def convert_ldm_checkpoint(ckpt_path: str, ldm_config_path: str, output: str) -> dict:
    """torch-lightning LDM VAE .ckpt + yaml config -> native vqvae directory
    (config.json + params.msgpack, what train_unet --vae and the pipeline's
    vqvae/ subdir read)."""
    import torch
    import yaml
    from flax import serialization

    from audio_diffusion_tpu.models.vae import AutoencoderKL
    from audio_diffusion_tpu.utils.torch_import import _check_structure, convert_ldm_vae

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    with open(ldm_config_path) as fh:
        conf = yaml.safe_load(fh)
    ddconfig = conf["model"]["params"]["ddconfig"]

    config, params = convert_ldm_vae(sd, ddconfig)
    import jax

    vae = AutoencoderKL(config)
    template = vae.init_params(jax.random.key(0), sample_hw=(64, 64))
    params = _check_structure(template, params)

    config.save_config(output)
    tmp = os.path.join(output, "params.msgpack.tmp")
    with open(tmp, "wb") as fh:
        fh.write(serialization.to_bytes(params))
    os.replace(tmp, os.path.join(output, "params.msgpack"))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {"output": output, "format": "native-vae", "vae_params": n_params}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", type=str, required=True,
                   help="source pipeline directory, or an LDM VAE .ckpt with --ldm_config")
    p.add_argument("--output", type=str, required=True, help="destination directory")
    p.add_argument("--to", type=str, default="native", choices=["native", "torch"],
                   help="output format (default: native; source format is auto-detected)")
    p.add_argument("--ldm_config", type=str, default=None,
                   help="LDM yaml config (model.params.ddconfig) for .ckpt inputs")
    a = p.parse_args(argv)

    if a.ldm_config is not None or a.input.endswith(".ckpt"):
        if a.ldm_config is None:
            p.error("--ldm_config is required for LDM .ckpt inputs")
        print(convert_ldm_checkpoint(a.input, a.ldm_config, a.output))
        return

    import jax

    from audio_diffusion_tpu.pipelines.pipeline import AudioDiffusionPipeline

    pipe = AudioDiffusionPipeline.from_pretrained(a.input)  # auto-detects torch vs native
    if a.to == "torch":
        from audio_diffusion_tpu.utils.torch_export import save_pipeline_torch

        save_pipeline_torch(pipe, a.output)
    else:
        pipe.save_pretrained(a.output)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(pipe.unet_params))
    print({"output": a.output, "format": a.to, "unet_params": n_params, "latent": pipe.is_latent})


if __name__ == "__main__":
    main()
