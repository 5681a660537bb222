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


def _check_overlap(mel, overlap_samples: int, overlap_secs: float) -> None:
    """An overlap that doesn't fit inside one generation window would silently
    produce empty or non-advancing output (negative stride / empty tail
    slices) — caught in CI by the examples smoke on a tiny model. Fail with
    the model's actual window length instead."""
    slice_size = mel.x_res * mel.hop_length
    if not 0 <= overlap_samples < slice_size:
        raise ValueError(
            f"overlap_secs={overlap_secs} is {overlap_samples} samples, but this "
            f"model's generation window is only {slice_size} samples "
            f"({slice_size / mel.get_sample_rate():.2f}s at {mel.get_sample_rate()} Hz) "
            "— choose an overlap shorter than one window."
        )


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
    _check_overlap(pipe.mel, overlap_samples, overlap_secs)
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
    parallel: bool = False,
) -> np.ndarray:
    """Style-transfer a whole track window by window with a pinned key and
    overlap re-insertion (test_model.ipynb cell 20). Each window is re-noised
    to ``start_step`` and denoised; the previous window's generated tail is
    peak-matched and written over the new window's head before generation.

    ``parallel=True`` trades the serial tail re-insertion for one BATCHED
    device call over all windows (TPU-first: batch-32 throughput is ~12x
    batch-1, BASELINE.md): every window re-noises from the SAME pinned
    initial noise — the serial mode's continuity mechanism — and overlaps
    stitch by linear crossfade instead of tail rewriting. The window batch
    pads to the next power of two so tracks of different lengths reuse
    compiled programs (log2 shapes, not one per track length). With eta>0
    the per-STEP noise is batch-shaped, i.e. uncorrelated across windows —
    unlike serial, where the pinned key repeats it; use eta=0 (default) for
    maximal cross-window coherence in parallel mode."""
    if parallel:
        return _remix_parallel(pipe, track_audio, start_step, overlap_secs,
                               steps, key, eta)
    mel = pipe.mel
    sample_rate = mel.get_sample_rate()
    overlap_samples = int(overlap_secs * sample_rate)
    _check_overlap(mel, overlap_samples, overlap_secs)
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


def _remix_parallel(pipe, track_audio, start_step, overlap_secs, steps, key, eta):
    """All windows in ONE batched generation (see :func:`remix` parallel=True).

    Matches the serial mode's pinned-key semantics by tiling one shared
    initial-noise sample across the window batch; windows crossfade linearly
    over ``overlap_secs`` at stitch time."""
    import jax.numpy as jnp

    mel = pipe.mel
    sample_rate = mel.get_sample_rate()
    overlap_samples = int(overlap_secs * sample_rate)
    _check_overlap(mel, overlap_samples, overlap_secs)
    slice_size = mel.x_res * mel.hop_length
    stride = slice_size - overlap_samples
    key = key if key is not None else jax.random.key(0)

    track_audio = np.asarray(track_audio, dtype=np.float32)
    n = len(track_audio) // stride
    if n == 0:
        return np.array([], dtype=np.float32)
    windows = np.stack([
        np.pad(w := track_audio[i * stride : i * stride + slice_size],
               (0, slice_size - len(w)))
        for i in range(n)
    ])

    # The serial mode pins ONE key so every window re-noises from the same
    # initial noise (its continuity mechanism); replicate that by tiling a
    # single noise sample (mirrors the pipeline's internal key split). Pad
    # the window batch to the next power of two: each batch shape is its own
    # compiled program, so padding bounds compiles to log2(n) shapes instead
    # of one per track length (multi-minute remote compiles each).
    h, w_ = pipe.sample_hw
    _, noise_key, _, _ = jax.random.split(key, 4)
    noise1 = jax.random.normal(noise_key, (1, h, w_, pipe.unet.config.in_channels))
    n_pad = 1 << (n - 1).bit_length()
    if n_pad > n:
        windows = np.concatenate([windows, np.zeros((n_pad - n, slice_size), np.float32)])
    noise = jnp.tile(noise1, (n_pad, 1, 1, 1))

    _, audios_dev = pipe(
        raw_audio=windows,
        start_step=start_step,
        steps=steps,
        noise=noise,
        step_key=key,
        eta=eta,
        return_arrays=True,  # slice off pad rows ON DEVICE; never pull the
        # unused spectrograms/pad audio through the thin D2H link
    )
    audios = list(np.asarray(audios_dev[:n]))

    out = audios[0]
    fade_in = np.linspace(0.0, 1.0, overlap_samples, dtype=np.float32) if overlap_samples else None
    for a in audios[1:]:
        if overlap_samples:
            head = out[-overlap_samples:] * (1.0 - fade_in) + a[:overlap_samples] * fade_in
            out = np.concatenate([out[:-overlap_samples], head, a[overlap_samples:]])
        else:
            out = np.concatenate([out, a])
    return out
