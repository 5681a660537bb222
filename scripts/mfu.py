#!/usr/bin/env python
"""MFU arithmetic for the generation hot path: XLA-counted FLOPs per stage
vs measured wall time, reported as achieved TFLOP/s and % of this chip's
MEASURED matmul peak (138.7 TFLOP/s through the tunnel harness — BASELINE.md
roofline; theoretical v5e bf16 peak is ~197).

FLOPs come from XLA's own cost analysis of the compiled stage
(``jitted.lower(...).compile().cost_analysis()["flops"]``) — the same HLO the
device runs, so fused elementwise work is counted the way the compiler sees
it, not from a hand-derived formula. Timing uses the stage-ledger discipline
(scalar pulled from the same program; per-call ~20-30 ms RPC overhead is
SUBTRACTED via a measured empty-program baseline, so the MFU reflects device
compute, not tunnel latency).

Stages (the two dominant ones after round 4's Griffin-Lim fix):
  - denoise: the 50-step UNet+DDIM lax.scan over latents (one program)
  - vae_decode: latents -> pixels

Usage:
    python scripts/mfu.py                     # 256 latent recipe, batch 32
    python scripts/mfu.py --resolution 512    # the conditional-512 geometry
    python scripts/mfu.py --batch 64          # batch-knee probe
    python scripts/mfu.py --no_time           # FLOP counts only (any backend)
Prints one JSON object.
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

MEASURED_PEAK_TFLOPS = 138.7  # BASELINE.md: big-matmul peak on this chip/tunnel
THEORETICAL_PEAK_TFLOPS = 197.0  # v5e bf16


def _flops(jitted, *args) -> float:
    """XLA-counted FLOPs for one execution of the compiled program."""
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def _time_ms(jitted, args, reps: int) -> float:
    """Median wall ms per call, scalar-forced (CLAUDE.md measurement rules)."""
    out = jitted(*args)
    s = jnp.ravel(out[0] if isinstance(out, tuple) else out)[0]
    float(s.astype(jnp.float32))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        s = jnp.ravel(out[0] if isinstance(out, tuple) else out)[0]
        float(s.astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1000.0


def _dispatch_overhead_ms(reps: int) -> float:
    """Per-call RPC floor: an (almost) empty program, same pull discipline."""
    f = jax.jit(lambda x: x + 1.0)
    return _time_ms(f, (jnp.float32(0.0),), reps)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--conditional", action="store_true",
                   help="cross-attention UNet (the 512 flagship architecture)")
    p.add_argument("--no_time", action="store_true",
                   help="skip device timing; report XLA FLOP counts only")
    p.add_argument("--precast", action="store_true",
                   help="probe: pre-cast the UNet param tree to bf16 before "
                        "the scan. If XLA already hoists the per-use f32->bf16 "
                        "kernel converts out of the scan loop, this changes "
                        "nothing; if scan time drops, param HBM traffic was "
                        "being re-read in f32 every step")
    args = p.parse_args(argv)

    from bench import build_latent_pipeline

    pipe = build_latent_pipeline(args.resolution, args.dtype)
    if args.conditional:
        from audio_diffusion_tpu.models import UNet2D
        from audio_diffusion_tpu.models.unet2d import conditional_config

        lat = pipe.vqvae.config.latent_hw(args.resolution, args.resolution)
        cfg = conditional_config(lat, dtype=args.dtype)
        unet = UNet2D(cfg)
        params = unet.init_params(jax.random.key(0))
    else:
        unet, params = pipe.unet, pipe.unet_params

    lat_hw = pipe.vqvae.config.latent_hw(args.resolution, args.resolution)
    B = args.batch
    x = jnp.zeros((B, *lat_hw, 1), jnp.float32)
    enc = (jnp.zeros((B, 1, cfg.cross_attention_dim), jnp.float32)
           if args.conditional else None)
    schedule = pipe.scheduler.schedule(args.steps)

    # --- stage 1: the denoise scan exactly as the pipeline runs it --------
    def denoise(params, x, enc):
        def body(carry, t):
            h = unet.apply({"params": params}, carry,
                           jnp.broadcast_to(t, (carry.shape[0],)), enc)
            return pipe.scheduler.step(h, t, carry, schedule), None

        out, _ = jax.lax.scan(body, x, schedule.timesteps)
        return out

    if args.precast:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    denoise_j = jax.jit(denoise)
    dn_args = (params, x, enc)

    # --- stage 2: VAE decode ----------------------------------------------
    def decode(vp, z):
        return pipe.vqvae.apply({"params": vp}, z / 0.18215,
                                method=pipe.vqvae.decode)

    decode_j = jax.jit(decode)
    dec_args = (pipe.vqvae_params, x)

    out = {
        "config": {"resolution": args.resolution, "latent_hw": list(lat_hw),
                   "batch": B, "steps": args.steps, "dtype": args.dtype,
                   "conditional": args.conditional,
                   "backend": jax.default_backend()},
        "measured_peak_tflops": MEASURED_PEAK_TFLOPS,
    }
    stages = {
        "denoise_scan": (denoise_j, dn_args),
        "vae_decode": (decode_j, dec_args),
    }
    overhead = None if args.no_time else _dispatch_overhead_ms(args.reps)
    if overhead is not None:
        out["dispatch_overhead_ms"] = round(overhead, 2)
    for name, (fn, fargs) in stages.items():
        flops = _flops(fn, *fargs)
        rec = {"xla_gflops": round(flops / 1e9, 2),
               "gflops_per_sample": round(flops / B / 1e9, 3)}
        if not args.no_time:
            ms = _time_ms(fn, fargs, args.reps)
            dev_ms = max(ms - overhead, 1e-3)
            tflops = flops / (dev_ms / 1e3) / 1e12
            rec.update({
                "wall_ms": round(ms, 2),
                "device_ms": round(dev_ms, 2),
                "achieved_tflops": round(tflops, 2),
                "pct_of_measured_peak": round(100 * tflops / MEASURED_PEAK_TFLOPS, 1),
                "pct_of_theoretical_peak": round(100 * tflops / THEORETICAL_PEAK_TFLOPS, 1),
            })
        out[name] = rec
    print(json.dumps(out))


if __name__ == "__main__":
    main()
