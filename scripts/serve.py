#!/usr/bin/env python
"""Serve a trained pipeline over HTTP with dynamic request batching.

    PYTHONPATH=. python scripts/serve.py --model models/latent-audio-diffusion-256 \
        --port 8080 --max_batch 32 --dtype bfloat16

Then:  curl -d '{"seed": 7}' localhost:8080/generate -o out.wav

The reference serves one request at a time through Gradio/Streamlit
(/root/reference/app.py, streamlit_app.py); this front-end shares full
batch tiers across concurrent users (serving/batcher.py) — measured ~12x
throughput at the batch-32 knee (BASELINE.md).
"""

import argparse
import logging
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, required=True,
                   help="pipeline dir (ours or torch diffusers) or Hub model id")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=8,
                   help="largest batch tier (BASELINE.md: throughput knee at 32)")
    p.add_argument("--batch_policy", type=str, default="snap",
                   choices=["snap", "pad"],
                   help="batch assembly once the wait window closes: snap = "
                        "largest tier <= queue depth (zero padding at load); "
                        "pad = take all queued, pad to the next tier")
    p.add_argument("--max_wait_ms", type=float, default=25.0,
                   help="how long a lone request waits for batch companions")
    p.add_argument("--steps", type=int, default=None,
                   help="denoise steps (default: scheduler's own default)")
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--allow_steps", type=int, nargs="*", default=None,
                   help="additional per-request step counts to serve (each is "
                        "compiled at warmup; undeclared values are rejected with "
                        "400 rather than compiling on live traffic)")
    p.add_argument("--allow_etas", type=float, nargs="*", default=None,
                   help="additional per-request eta values to serve")
    p.add_argument("--allow_start_steps", type=int, nargs="*", default=None,
                   help="audio-to-audio start_step values to serve (each is a "
                        "distinct compiled scan; requests send audio_pcm16_base64 "
                        "+ start_step)")
    p.add_argument("--dtype", type=str, default=None, choices=["float32", "bfloat16"],
                   help="serving compute-dtype override (bfloat16: +20%% measured)")
    p.add_argument("--mesh_data", type=int, default=None,
                   help="shard serving over N devices (batch splits along 'data'; "
                        "tiers become multiples of N)")
    p.add_argument("--warmup", action=argparse.BooleanOptionalAction, default=True,
                   help="compile every batch tier before accepting traffic")
    p.add_argument("--max_queue", type=int, default=None,
                   help="admission control: global queued-request cap (default "
                        "8x max_batch); over-capacity submits get a fast 429 + "
                        "Retry-After instead of queueing toward timeout")
    p.add_argument("--max_group_queue", type=int, default=None,
                   help="per-settings-group queued-request cap (default: the "
                        "global cap)")
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")

    from audio_diffusion_tpu.serving import make_server

    server = make_server(
        a.model, dtype=a.dtype, mesh_data=a.mesh_data, host=a.host, port=a.port,
        max_batch=a.max_batch, max_wait_ms=a.max_wait_ms, steps=a.steps, eta=a.eta,
        batch_policy=a.batch_policy,
        allowed_steps=a.allow_steps, allowed_etas=a.allow_etas,
        allowed_start_steps=a.allow_start_steps,
        max_queue=a.max_queue, max_group_queue=a.max_group_queue,
    )
    if a.warmup:
        logging.info("warming up %s batch tiers (first TPU compiles take minutes)...",
                     server.batcher.tiers)
        server.batcher.warmup()

    # Graceful drain on SIGTERM (orchestrators send it before SIGKILL).
    # The handler only unblocks serve_forever (shutdown() must not run on the
    # signal-handling main thread — it would deadlock waiting on itself); the
    # DRAIN then runs synchronously on the main thread below, so the process
    # cannot exit before queued batches finish and handlers respond.
    import signal
    import threading

    def _term(signum, frame):
        logging.info("SIGTERM: draining in-flight requests and shutting down")
        threading.Thread(target=server.httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    server.stop()  # synchronous: drain batches, resolve futures, close sockets
    return 0


if __name__ == "__main__":
    sys.exit(main())
