"""Long-audio generation: overlap-masked outpainting and remix stitching.

The reference handles long audio at the *application* level with notebook
loops (reference: notebooks/test_model.ipynb cells 16 and 20; SURVEY.md §5.7).
Here they are first-class library functions over the pipeline, so users get
continuation/remix without reimplementing the overlap bookkeeping. Sequence
parallelism is deliberately out of scope — the slice-based design bounds the
model's context (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def outpaint(
    pipe,
    initial_audio: np.ndarray,
    num_windows: int,
    overlap_secs: float = 2.0,
    start_step: int = 0,
    steps: Optional[int] = None,
    key: Optional[jax.Array] = None,
    eta: float = 0.0,
) -> np.ndarray:
    """Extend audio by repeatedly generating continuation windows whose first
    ``overlap_secs`` are frozen to the previous window's tail
    (test_model.ipynb cell 16)."""
    sample_rate = pipe.mel.get_sample_rate()
    overlap_samples = int(overlap_secs * sample_rate)
    key = key if key is not None else jax.random.key(0)

    track = np.asarray(initial_audio, dtype=np.float32)
    audio = track
    for i in range(num_windows):
        key, sub = jax.random.split(key)
        _, (_, audios) = pipe(
            batch_size=1,
            raw_audio=audio[-overlap_samples:],
            start_step=start_step,
            steps=steps,
            key=sub,
            mask_start_secs=overlap_secs,
            eta=eta,
            return_dict=False,
        )
        audio = np.asarray(audios[0])
        track = np.concatenate([track, audio[overlap_samples:]])
    return track


def remix(
    pipe,
    track_audio: np.ndarray,
    start_step: int = 500,
    overlap_secs: float = 2.0,
    steps: Optional[int] = None,
    key: Optional[jax.Array] = None,
    eta: float = 0.0,
) -> np.ndarray:
    """Style-transfer a whole track window by window with a pinned key and
    overlap re-insertion (test_model.ipynb cell 20). Each window is re-noised
    to ``start_step`` and denoised; the previous window's generated tail is
    peak-matched and written over the new window's head before generation."""
    mel = pipe.mel
    sample_rate = mel.get_sample_rate()
    overlap_samples = int(overlap_secs * sample_rate)
    slice_size = mel.x_res * mel.hop_length
    stride = slice_size - overlap_samples
    key = key if key is not None else jax.random.key(0)

    track_audio = np.asarray(track_audio, dtype=np.float32)
    track = np.array([], dtype=np.float32)
    prev = None
    for sample in range(len(track_audio) // stride):
        window = np.array(track_audio[sample * stride : sample * stride + slice_size])
        not_first = int(prev is not None)
        if not_first:
            head = window[:overlap_samples]
            tail = prev[-overlap_samples:]
            scale = np.max(np.abs(head)) / max(np.max(np.abs(tail)), 1e-8)
            window[:overlap_samples] = tail * scale
        _, (_, audios) = pipe(
            batch_size=1,
            raw_audio=window,
            start_step=start_step,
            steps=steps,
            key=key,  # pinned: same noise for every window, like the seeded generator
            mask_start_secs=overlap_secs * not_first,
            eta=eta,
            return_dict=False,
        )
        prev = np.asarray(audios[0])
        track = np.concatenate([track, prev[overlap_samples * not_first :]])
    return track
