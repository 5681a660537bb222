#!/usr/bin/env python
"""Convert AudioDiffusionPipeline checkpoints between the torch diffusers
on-disk layout and this framework's native format — both directions.

    # torch (published teticio/* dirs, downloaded) -> native
    python scripts/convert_checkpoint.py --input path/to/torch_dir --output models/native_dir

    # native (trained here) -> torch diffusers layout, loadable by the
    # reference stack via DiffusionPipeline.from_pretrained
    python scripts/convert_checkpoint.py --input models/native_dir --output path/to/torch_dir --to torch

The import direction is the pipeline analog of the reference's LDM->diffusers
converter (reference: audiodiffusion/utils.py:294-303); the export direction
completes the interop loop (train on TPU, deploy in torch).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", type=str, required=True, help="source pipeline directory")
    p.add_argument("--output", type=str, required=True, help="destination directory")
    p.add_argument("--to", type=str, default="native", choices=["native", "torch"],
                   help="output format (default: native; source format is auto-detected)")
    a = p.parse_args(argv)

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
