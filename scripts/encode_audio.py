#!/usr/bin/env python
"""Pickle AudioEncoder embeddings for each unique audio file in a dataset
(reference: scripts/encode_audio.py)."""

import argparse
import logging
import sys

sys.path.insert(0, ".")

from audio_diffusion_tpu.data.prepare import encode_audio_dataset


def main(argv=None):
    logging.basicConfig(level=logging.WARN)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="data/audio-encodings")
    p.add_argument("--output_file", type=str, default="data/encodings.p")
    p.add_argument("--pretrained_encoder", type=str, default=None,
                   help="directory with AudioEncoder config + params (optional)")
    a = p.parse_args(argv)

    encoder = variables = None
    if a.pretrained_encoder:
        from audio_diffusion_tpu.utils.torch_import import load_audio_encoder

        encoder, variables = load_audio_encoder(a.pretrained_encoder)
    encode_audio_dataset(a.dataset, a.output_file, encoder, variables)


if __name__ == "__main__":
    main()
