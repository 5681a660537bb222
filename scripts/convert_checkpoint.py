#!/usr/bin/env python
"""Convert a torch diffusers AudioDiffusionPipeline directory (the published
teticio/* checkpoints, downloaded locally) into this framework's native format
— the pipeline analog of the reference's LDM->diffusers converter
(reference: audiodiffusion/utils.py:294-303).

    python scripts/convert_checkpoint.py --input path/to/torch_dir --output models/native_dir

After conversion, loads skip the torch dependency and the key-mapping pass.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", type=str, required=True, help="torch diffusers pipeline directory")
    p.add_argument("--output", type=str, required=True, help="destination directory (native format)")
    a = p.parse_args(argv)

    from audio_diffusion_tpu.utils.torch_import import pipeline_from_torch_pretrained

    pipe = pipeline_from_torch_pretrained(a.input)
    pipe.save_pretrained(a.output)
    n_params = sum(x.size for x in __import__("jax").tree_util.tree_leaves(pipe.unet_params))
    print({"output": a.output, "unet_params": n_params, "latent": pipe.is_latent})


if __name__ == "__main__":
    main()
