#!/usr/bin/env python
"""Headline benchmark: end-to-end 256x256 mel generation throughput on TPU.

Measures the BASELINE.json north-star: samples/sec/chip for full end-to-end
generation — 50 DDIM steps through the reference's unconditional UNet
architecture (scripts/train_unet.py:115-137 config) PLUS batched NNLS +
Griffin-Lim (32 iterations) audio inversion and host transfer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50 (the >=50 samples/sec/chip target, BASELINE.json:5;
the reference publishes no quantitative numbers of its own — BASELINE.md).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from audio_diffusion_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

from audio_diffusion_tpu.mel import Mel
from audio_diffusion_tpu.models import UNet2D, unconditional_config
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
from audio_diffusion_tpu.schedulers import DDIMScheduler

TARGET_SAMPLES_PER_SEC = 50.0  # BASELINE.json:5


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--quick", action="store_true", help="small model smoke run")
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--latency", action="store_true",
                   help="batch-1 single-sample latency (sequential calls, no pipelining) "
                        "— the serving-latency analog of the reference's only published "
                        "number ('about 20 minutes' per sample, app.py:21-23)")
    p.add_argument("--pipeline", type=str, default=None,
                   help="bench a SAVED pipeline directory (e.g. a trained latent-"
                        "diffusion model) instead of the random-init reference "
                        "architecture — the latent config clears the >=50 target "
                        "on one chip (BASELINE.md)")
    args = p.parse_args(argv)
    if args.latency:
        args.batch = 1

    if args.pipeline:
        pipe = AudioDiffusionPipeline.from_pretrained(args.pipeline)
        cfg = pipe.unet.config
        out_hw = (pipe.mel.y_res, pipe.mel.x_res)
        kind = "latent " if pipe.is_latent else ""
    elif args.quick:
        from audio_diffusion_tpu.models import UNetConfig

        cfg = UNetConfig(sample_size=(64, 64), block_out_channels=(32, 64),
                         down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                         up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                         layers_per_block=1, norm_num_groups=8, dtype=args.dtype)
        mel = Mel(x_res=64, y_res=64, hop_length=512)
    else:
        cfg = unconditional_config(sample_size=(args.resolution, args.resolution), dtype=args.dtype)
        mel = Mel(x_res=args.resolution, y_res=args.resolution, hop_length=512)

    if not args.pipeline:
        unet = UNet2D(cfg)
        params = unet.init_params(jax.random.key(0))
        pipe = AudioDiffusionPipeline(unet, params, mel, DDIMScheduler())
        out_hw = cfg.sample_hw()
        kind = ""

    # Warmup with the EXACT timed-call signature: compiles the denoise scan,
    # Griffin-Lim, postprocess, and pcm16 programs (remote compiles cost
    # seconds each on this backend — they must not land in the timed loop).
    raw_w, audio_w = pipe(batch_size=args.batch, steps=args.steps, key=jax.random.key(0),
                          return_arrays=True, pcm16=True)
    np.asarray(raw_w), np.asarray(audio_w)

    if args.latency:
        # Sequential request latency: materialize each output before the next
        # call (no dispatch pipelining) — what one interactive request sees.
        times = []
        for i in range(args.iters):
            t0 = time.time()
            raw, audio = pipe(batch_size=1, steps=args.steps, key=jax.random.key(i + 1),
                              return_arrays=True, pcm16=True)
            np.asarray(raw), np.asarray(audio)
            times.append(time.time() - t0)
        lat = float(np.median(times))
        print(json.dumps({
            "metric": f"{out_hw[0]}x{out_hw[1]} {kind}single-sample latency, "
                      f"{args.steps} DDIM steps + Griffin-Lim end-to-end",
            "value": round(lat, 3),
            "unit": "seconds (median)",
            "vs_baseline": round(lat / (20 * 60), 5),  # reference: ~20 min/sample on CPU
        }))
        return

    # Steady-state serving loop: dispatch all batches (device queue keeps the
    # chip busy), then materialize every output — D2H overlaps compute.
    # Audio ships as peak-normalized int16 PCM, the apps' WAV delivery format.
    t0 = time.time()
    outs = [
        pipe(batch_size=args.batch, steps=args.steps, key=jax.random.key(i + 1),
             return_arrays=True, pcm16=True)
        for i in range(args.iters)
    ]
    host = [(np.asarray(raw), np.asarray(audio)) for raw, audio in outs]
    dt = time.time() - t0
    # Fidelity spot-checks: a perf "win" that degenerates the output fails.
    for raw, audio in host:
        assert raw.dtype == np.uint8 and raw.std() > 5.0, "degenerate spectrogram output"
        assert audio.dtype == np.int16
        assert np.abs(audio).max() > 1000, "silent/degenerate audio output"

    samples_per_sec = args.batch * args.iters / dt
    print(json.dumps({
        "metric": f"{out_hw[0]}x{out_hw[1]} {kind}mel samples/sec/chip, "
                  f"{args.steps} DDIM steps + Griffin-Lim end-to-end",
        "value": round(samples_per_sec, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / TARGET_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
