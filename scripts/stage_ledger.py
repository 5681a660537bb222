#!/usr/bin/env python
"""Per-stage timing ledger for the generation hot path, at any resolution/batch.

Times each pipeline stage as its own device program with a scalar pulled from
the SAME program (the scalar rides the program's result, so forcing execution
costs one 4-byte D2H, not an extra dispatch — ``block_until_ready`` is
unreliable through this remote backend, CLAUDE.md "Measurement discipline").
Each number still carries the ~20-30 ms per-dispatch RPC overhead of this
harness's tunnel, which is why the stage sum exceeds the fused end-to-end
time (also reported): the fused single-program path is where those gaps
vanish (pipelines/pipeline.py::_fused_generate_fn).

This script produced BASELINE.md's latent-stage ledger tables. Stages match
the reference's own inference anatomy (reference:
audiodiffusion/pipeline_audio_diffusion.py:159-201 — denoise loop, VAE
decode at 187-190, uint8 at 192-199, Griffin-Lim at 201) plus the serving
delivery steps (pcm16 quantize, device-to-host pull).

Usage:
    python scripts/stage_ledger.py                     # 256 latent, batch 16
    python scripts/stage_ledger.py --resolution 512    # the 512 flagship tier
    python scripts/stage_ledger.py --pixel             # pixel-space path
    python scripts/stage_ledger.py --pipeline DIR      # a trained pipeline
Prints one JSON object with ms/batch (median of --reps) per stage.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from audio_diffusion_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _scalarized(fn):
    """jit(fn) returning (out, scalar-from-out): materializing the scalar
    forces the whole program with a 4-byte transfer."""

    def wrapped(*args):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        return out, jnp.ravel(first)[0].astype(jnp.float32)

    return jax.jit(wrapped)


def _time(fn, args, reps):
    out, s = fn(*args)  # compile + warm
    float(s)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, s = fn(*args)
        float(s)  # 4-byte D2H completes only after the program finishes
        times.append(time.perf_counter() - t0)
    return out, float(np.median(times))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--pixel", action="store_true",
                   help="pixel-space UNet at --resolution (no VAE stage)")
    p.add_argument("--pipeline", type=str, default=None,
                   help="ledger a SAVED pipeline directory instead of random-init")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args(argv)

    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline

    if args.pipeline:
        pipe = AudioDiffusionPipeline.from_pretrained(args.pipeline, dtype=args.dtype)
    elif args.pixel:
        from audio_diffusion_tpu.mel import Mel
        from audio_diffusion_tpu.models import UNet2D, unconditional_config
        from audio_diffusion_tpu.schedulers import DDIMScheduler

        cfg = unconditional_config(sample_size=(args.resolution, args.resolution),
                                   dtype=args.dtype)
        unet = UNet2D(cfg)
        pipe = AudioDiffusionPipeline(
            unet, unet.init_params(jax.random.key(0)),
            Mel(x_res=args.resolution, y_res=args.resolution, hop_length=512),
            DDIMScheduler())
    else:
        from bench import build_latent_pipeline

        pipe = build_latent_pipeline(args.resolution, args.dtype)

    B, steps, reps = args.batch, args.steps, args.reps
    h, w = pipe.sample_hw
    in_ch = pipe.unet.config.in_channels
    mel = pipe.mel
    length = (mel.x_res - 1) * mel.hop_length
    ledger = {}

    # -- noise
    noise_fn = _scalarized(lambda k: jax.random.normal(k, (B, h, w, in_ch), jnp.float32))
    noise, ledger["noise"] = _time(noise_fn, (jax.random.key(0),), reps)

    # -- denoise scan (the pipeline's own jitted scan, inlined under our jit)
    denoise = pipe._denoise_fn(steps, 0, 0.0, 0, 0, False, False)
    den_fn = _scalarized(lambda p, x, k: denoise(p, x, x, x, None, k))
    latents, ledger[f"denoise_scan_{steps}_steps"] = _time(
        den_fn, (pipe.unet_params, noise, jax.random.key(1)), reps)

    # -- VAE decode (latent pipelines)
    images = latents
    if pipe.is_latent:
        from audio_diffusion_tpu.pipelines.pipeline import LATENT_SCALE

        vae_fn = _scalarized(lambda p, z: pipe.vqvae.apply(
            {"params": p}, z / LATENT_SCALE, method=pipe.vqvae.decode))
        images, ledger["vae_decode"] = _time(vae_fn, (pipe.vqvae_params, latents), reps)

    # -- uint8 postprocess
    from audio_diffusion_tpu.pipelines.pipeline import postprocess_images

    post_fn = _scalarized(postprocess_images)
    raw, ledger["postprocess_uint8"] = _time(post_fn, (images,), reps)

    # -- NNLS + Griffin-Lim
    gl_fn = _scalarized(lambda r, k: mel._inverse(r, k, length))
    audio, ledger[f"nnls_griffin_lim_x{mel.n_iter}"] = _time(
        gl_fn, (raw, jax.random.key(2)), reps)

    # -- pcm16 (the pipeline's own op — the ledger times what serving runs)
    from audio_diffusion_tpu.pipelines.pipeline import pcm16_quantize

    pcm_fn = _scalarized(pcm16_quantize)
    pcm, ledger["pcm16"] = _time(pcm_fn, (audio,), reps)

    # -- device-to-host of the serving payload (uint8 raw + int16 PCM).
    # Fresh device arrays each rep: jax caches the host copy after the first
    # np.asarray of a given buffer, which would make later reps read ~0.
    d2h_times = []
    for _ in range(reps):
        r2, _ = post_fn(images)
        p2, s = pcm_fn(audio)
        float(s)  # arrays ready before the timer starts
        t0 = time.perf_counter()
        np.asarray(r2), np.asarray(p2)
        d2h_times.append(time.perf_counter() - t0)
    ledger["d2h_payload"] = float(np.median(d2h_times))
    payload_mb = (np.asarray(raw).nbytes + np.asarray(pcm).nbytes) / 1e6

    # -- fused end-to-end (ONE program: what serving actually runs)
    def run_fused(i):
        r, a = pipe(batch_size=B, steps=steps, key=jax.random.key(i + 10),
                    return_arrays=True, pcm16=True)
        return np.asarray(r), np.asarray(a)

    run_fused(0)  # compile
    e2e_times = []
    for i in range(reps):
        t0 = time.perf_counter()
        run_fused(i + 1)
        e2e_times.append(time.perf_counter() - t0)
    e2e = float(np.median(e2e_times))

    out = {
        "config": {
            "resolution": [mel.y_res, mel.x_res],
            "latent_hw": [h, w] if pipe.is_latent else None,
            "batch": B, "steps": steps, "dtype": args.dtype,
            "gl_iters": mel.n_iter, "reps": reps,
            "pipeline": args.pipeline or ("pixel" if args.pixel else "latent random-init"),
        },
        "ms_per_batch": {k: round(v * 1e3, 1) for k, v in ledger.items()},
        "stage_sum_ms": round(sum(ledger.values()) * 1e3, 1),
        "fused_e2e_ms": round(e2e * 1e3, 1),
        "fused_samples_per_sec": round(B / e2e, 1),
        "d2h_payload_mb": round(payload_mb, 2),
        "note": "stage numbers each carry ~20-30 ms dispatch RPC; the fused "
                "single-program path is the serving number",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
