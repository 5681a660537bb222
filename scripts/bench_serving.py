#!/usr/bin/env python
"""Measure sustained serving throughput: N concurrent clients through the
dynamic batcher vs the same pipeline driven directly at the same batch size.

    PYTHONPATH=. python scripts/bench_serving.py --model <pipeline-dir> \
        --clients 64 --max_batch 32 --seconds 20 --dtype bfloat16

Reports samples/sec through the batcher (HTTP parsing excluded — this
isolates the batching layer's overhead: queueing, padding, host noise
generation, result fan-out) and the direct-pipeline rate as the ceiling.
The reference has no serving path to compare against (its apps are
batch_size=1 per user interaction, /root/reference/app.py:26-43).
"""

import argparse
import json
import threading
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--clients", type=int, default=64,
                   help="concurrent closed-loop clients (each waits for its "
                        "result, then immediately submits the next request)")
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--batch_policy", type=str, default="snap", choices=["snap", "pad"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--start_step", type=int, default=0,
                   help="audio-to-audio mode: every client submits a synthetic "
                        "input clip re-noised to this step (style transfer, "
                        "reference pipeline:149-185) — rides the same fused "
                        "single-program path as pure generation")
    p.add_argument("--seconds", type=float, default=20.0, help="measurement window")
    p.add_argument("--dtype", type=str, default=None, choices=["float32", "bfloat16"])
    p.add_argument("--mesh_data", type=int, default=None,
                   help="shard serving over N devices (tiers become multiples of N)")
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)

    from audio_diffusion_tpu.pipelines.pipeline import AudioDiffusionPipeline
    from audio_diffusion_tpu.serving import DynamicBatcher

    pipe = AudioDiffusionPipeline.from_pretrained(a.model, dtype=a.dtype)
    if a.mesh_data is not None:
        import jax

        import numpy as np

        from audio_diffusion_tpu.parallel.mesh import make_mesh

        devices = np.asarray(jax.devices())[: a.mesh_data]
        pipe.shard(make_mesh(num_data=a.mesh_data, devices=devices))
    batcher = DynamicBatcher(pipe, max_batch=a.max_batch,
                             max_wait_ms=a.max_wait_ms, steps=a.steps,
                             batch_policy=a.batch_policy, pcm16=True,
                             allowed_start_steps=(a.start_step,) if a.start_step else None)
    print(f"warming up tiers {batcher.tiers}...", flush=True)
    batcher.warmup()

    # --- batched serving: closed-loop clients ---------------------------------
    stop = threading.Event()
    served = [0] * a.clients
    t_deadline = None

    # Audio-to-audio clients style-transfer a per-client synthetic clip; pure
    # generation clients submit seeds only. Both ride the fused program.
    import numpy as np

    clip = None
    if a.start_step:
        slice_len = pipe.mel.x_res * pipe.mel.hop_length
        t = np.arange(slice_len, dtype=np.float32) / pipe.mel.get_sample_rate()
        clip = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    def client(i):
        seed = i
        while not stop.is_set():
            batcher.submit(seed=seed, audio=clip,
                           start_step=a.start_step).result()
            seed += a.clients
            if t_deadline is not None and time.monotonic() >= t_deadline:
                stop.set()
            served[i] += 1

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(a.clients)]
    t0 = time.monotonic()
    t_deadline = t0 + a.seconds
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0
    serving_rate = sum(served) / elapsed

    # --- ceiling: the same pipeline driven directly at max_batch --------------
    h, w = pipe.sample_hw
    c = pipe.unet.config.in_channels
    noise = np.random.default_rng(0).standard_normal(
        (a.max_batch, h, w, c)).astype(np.float32)
    raw_audio = np.tile(clip, (a.max_batch, 1)) if clip is not None else None
    direct_kw = dict(steps=a.steps, start_step=a.start_step,
                     raw_audio=raw_audio, return_arrays=True, pcm16=True)
    pipe(noise=noise, **direct_kw)  # warm
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < max(5.0, a.seconds / 3):
        raw, aud = pipe(noise=noise, **direct_kw)
        np.asarray(aud)  # materialize like the batcher does
        n += a.max_batch
    direct_rate = n / (time.monotonic() - t0)

    print(json.dumps({
        "serving_samples_per_sec": round(serving_rate, 2),
        "direct_samples_per_sec": round(direct_rate, 2),
        "batching_efficiency": round(serving_rate / direct_rate, 3),
        "clients": a.clients,
        "max_batch": a.max_batch,
        "start_step": a.start_step,
        "latency": batcher.latency_summary(),
    }))
    batcher.close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
