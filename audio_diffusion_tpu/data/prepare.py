"""Dataset preparation: audio directory -> spectrogram-image dataset.

TPU-native rebuild of the reference's dataset builder (reference:
scripts/audio_to_images.py:17-80). The reference renders one slice at a time
through librosa on a single CPU thread; here all slices of each file run as a
single batched on-device mel program, which is the hot loop's whole cost
(SURVEY.md §3.4).

Behavioral parity: walks for .mp3/.wav/.m4a (audio_to_images.py:26-31),
per-file errors are caught and skipped (37-41), fully-silent slices (all
pixels 255 — a silent spectrogram quantizes to 255 because ref=max floors at
its own amin) are skipped (46-48), output features are
{image: PNG, audio_file: str, slice: int16} (67-76).
"""

from __future__ import annotations

import io
import logging
import os
import re
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from ..mel import Mel

logger = logging.getLogger("audio_diffusion_tpu.data")

AUDIO_RE = re.compile(r"\.(mp3|wav|m4a)$", re.IGNORECASE)


def find_audio_files(input_dir: str) -> List[str]:
    files = [
        os.path.join(root, f)
        for root, _, files in os.walk(input_dir)
        for f in sorted(files)
        if AUDIO_RE.search(f)
    ]
    compressed = [f for f in files if not f.lower().endswith(".wav")]
    if compressed:
        import shutil

        from . import native_audio

        if not native_audio.media_available() and not shutil.which("ffmpeg"):
            logger.warning(
                "%d mp3/m4a file(s) found but NO decoder is available (the native "
                "media decoder needs the system libavformat/libavcodec, and no "
                "ffmpeg binary was found) — these files will be SKIPPED. First: %s",
                len(compressed), compressed[0],
            )
    return files


def file_to_examples(mel: Mel, audio_file: str) -> List[dict]:
    """All non-silent slices of one file as dataset examples (batched mel)."""
    mel.load_audio(audio_file)
    n = mel.get_number_of_slices()
    if n == 0:
        return []
    batch = np.stack([mel.get_audio_slice(i) for i in range(n)])
    images = np.asarray(mel.spectrogram_images_from_audio(batch))  # (n, y, x) uint8
    examples = []
    for i in range(n):
        img = images[i]
        assert img.shape == (mel.y_res, mel.x_res), "Wrong resolution"
        if (img == 255).all():  # completely silent slice
            logger.warning("File %s slice %d is completely silent", audio_file, i)
            continue
        with io.BytesIO() as buf:
            Image.fromarray(img).save(buf, format="PNG")
            png = buf.getvalue()
        examples.append({"image": {"bytes": png, "path": None}, "audio_file": audio_file, "slice": i})
    return examples


def audio_to_images(
    input_dir: str,
    output_dir: str,
    resolution: Tuple[int, int] = (256, 256),
    hop_length: int = 512,
    sample_rate: int = 22050,
    n_fft: int = 2048,
    push_to_hub: Optional[str] = None,
):
    """Build and save a HF image dataset from a directory of audio files."""
    import pandas as pd
    from datasets import Dataset, DatasetDict, Features
    from datasets import Image as ImageFeature
    from datasets import Value

    mel = Mel(x_res=resolution[0], y_res=resolution[1], hop_length=hop_length,
              sample_rate=sample_rate, n_fft=n_fft)
    os.makedirs(output_dir, exist_ok=True)
    audio_files = find_audio_files(input_dir)
    examples = []
    for f in audio_files:
        try:
            examples.extend(file_to_examples(mel, f))
        except KeyboardInterrupt:
            raise
        except Exception as e:  # skip undecodable files, like the reference
            logger.warning("skipping %s: %s", f, e)
    if not examples:
        logger.warning("No valid audio files were found.")
        return None
    ds = Dataset.from_pandas(
        pd.DataFrame(examples),
        features=Features({
            "image": ImageFeature(),
            "audio_file": Value(dtype="string"),
            "slice": Value(dtype="int16"),
        }),
    )
    dsd = DatasetDict({"train": ds})
    dsd.save_to_disk(output_dir)
    if push_to_hub:
        dsd.push_to_hub(push_to_hub)
    return dsd


def encode_audio_dataset(dataset_path: str, output_file: str, encoder=None, variables=None) -> dict:
    """Compute AudioEncoder embeddings for each unique audio_file in a dataset
    and pickle {audio_file: encoding} (reference: scripts/encode_audio.py:11-31)."""
    import pickle

    from datasets import load_from_disk
    import datasets as hf_datasets

    from ..models.audio_encoder import AudioEncoder

    if encoder is None:
        encoder = AudioEncoder()
    if variables is None:
        import jax

        variables = encoder.init_variables(jax.random.key(0))

    ds = load_from_disk(dataset_path)
    if isinstance(ds, hf_datasets.DatasetDict):
        ds = ds["train"]
    files = sorted(set(ds["audio_file"]))
    encodings = {}
    for f in files:
        try:
            encodings[f] = np.asarray(encoder.encode(variables, [f]))[0]
        except Exception as e:
            logger.warning("skipping %s: %s", f, e)
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    with open(output_file, "wb") as fh:
        pickle.dump(encodings, fh)
    return encodings
