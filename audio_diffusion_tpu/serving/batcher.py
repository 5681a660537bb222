"""Dynamic request batching over the single-scan pipeline.

TPU-first design:

* **Static batch tiers.** Every jitted program is shape-specialized; letting
  request count dictate batch shape would compile a new denoise scan per
  concurrency level (minutes each through a remote-compile link). Requests
  instead pad up to a fixed tier (1, 2, 4, ... ``max_batch``), so the device
  only ever sees ``len(tiers)`` shapes — all compiled once, ideally at
  startup via :meth:`DynamicBatcher.warmup`. The default "snap" assembly
  policy dispatches the largest tier <= queue depth (remainder stays queued),
  so at load every device row is a real request — the round-4 "pad" policy
  averaged 33% padding rows under the closed-loop benchmark (fill 21.4/32,
  BASELINE.md serving table), the gap between 47/s served and ~80/s raw.
* **Per-request determinism.** Each request's initial noise is derived from
  ITS seed on the host (``np.random.Generator(PCG64(seed))``), never from a
  batch-level key. Under DETERMINISTIC sampling (DDIM with eta=0 — the
  serving default and the reference's recommended inference mode) a request's
  spectrogram is therefore independent of who else is in the batch (the
  denoise scan, VAE decode, and uint8 postprocess are all elementwise along
  the batch axis). Stochastic sampling (DDPM, or eta>0) draws per-STEP noise
  from a (tier,) vector of PER-ROW keys, each derived from its request's
  seed (schedulers/common.py::variance_noise), so those results are ALSO
  co-batch-independent — strictly stronger than the reference, whose
  ``step_generator`` is shared across the batch (pipeline:104-111) and
  therefore batch-composition-dependent. Scope of "bitwise": within a fixed
  tier shape, a row's output is bit-identical for ANY co-batch content on
  every backend (TPU-verified); ACROSS tier shapes it is bitwise on CPU
  (tests gate this), while TPU XLA may tile convs differently per batch
  shape and round differently — same-value-different-rounding, inherent to
  shape-specialized compilation, not to this design.
  Griffin-Lim audio is phase-initialized from a batch-shaped key
  (ops/griffin_lim.py:86), so audio matches across batch compositions at
  GL-convergence level, not bitwise — same property as the reference, where
  librosa re-randomizes phase per call (reference mel.py:165-168).
* **One worker owns the device; transfers overlap compute.** Requests
  enqueue (holding just their seed/settings — per-request noise is derived
  from the seed at batch-assembly time, so pending memory stays bounded); a
  single worker drains compatible requests (same steps/eta/conditioning
  shape — they share one compiled program) and dispatches ONE pipeline call.
* **Admission control.** ``submit`` sheds over-capacity requests with
  :class:`QueueFull` (global + per-group queue caps, throughput-based
  ``retry_after_s``) instead of enqueueing work that will only time out;
  the HTTP front-end maps it to 429 + ``Retry-After``. JAX dispatch is
  async, so the device arrays go to a separate finisher thread that pulls
  them to host and resolves futures while the worker assembles the next
  batch — device-to-host time (the dominant serving cost on thin host links)
  hides behind the next batch's compute. HTTP handler threads never touch
  JAX.

The reference has no analog — its apps call the pipeline with
``batch_size=1`` per user interaction (app.py:26-43).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np


@dataclass
class GenerationResult:
    """One request's outputs, already on host."""

    image: np.ndarray  # (H, W) or (H, W, C) uint8 mel spectrogram
    audio: np.ndarray  # float32 waveform, or int16 when the batcher runs pcm16
    sample_rate: int


class QueueFull(RuntimeError):
    """Raised by :meth:`DynamicBatcher.submit` when admission control sheds
    the request (queue at capacity). ``retry_after_s`` is the server's
    throughput-based estimate of when capacity frees up — the HTTP front-end
    forwards it as a 429 ``Retry-After`` header."""

    def __init__(self, message: str, retry_after_s: float):
        super().__init__(message)
        self.retry_after_s = retry_after_s


@dataclass
class _Pending:
    seed: int  # initial noise derives from this at batch-assembly time —
    # a queued request holds only its seed/encoding/clip, not an (H, W, C)
    # noise array, so pending memory stays bounded under load
    encoding: Optional[np.ndarray]  # (seq, dim) or None
    audio: Optional[np.ndarray]  # (samples,) input clip for audio-to-audio
    future: Future
    enqueued: float


def _noise_for_seed(seed: int, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic per-request initial noise, independent of batch shape."""
    return np.random.default_rng(seed).standard_normal((h, w, c)).astype(np.float32)


class DynamicBatcher:
    """Groups concurrent generation requests into padded fixed-tier batches.

    Args:
        pipe: an ``AudioDiffusionPipeline`` (or compatible callable object).
        max_batch: largest batch tier; tiers are the powers of two up to it.
        max_wait_ms: how long the worker holds the FIRST request of a batch
            open for companions. Latency floor for a lone request; at load the
            wait never triggers because tiers fill instantly.
        steps / eta: generation settings shared by all requests unless a
            request overrides them (overriding ``steps`` selects a different
            compiled program — distinct settings batch separately, never
            together).
        pcm16: quantize audio to int16 on device (halves D2H payload —
            pipelines/pipeline.py pcm16 path).
    """

    def __init__(
        self,
        pipe,
        max_batch: int = 8,
        max_wait_ms: float = 25.0,
        steps: Optional[int] = None,
        eta: float = 0.0,
        pcm16: bool = False,
        batch_policy: str = "snap",
        allowed_steps: Optional[Sequence[int]] = None,
        allowed_etas: Optional[Sequence[float]] = None,
        allowed_start_steps: Optional[Sequence[int]] = None,
        conditional_seq: int = 1,
        max_queue: Optional[int] = None,
        max_group_queue: Optional[int] = None,
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.pipe = pipe
        # Sharded pipelines (pipe.shard(mesh)) split the batch along 'data', so
        # every tier must be a multiple of the data-axis size.
        mesh = getattr(pipe, "mesh", None)
        base = dict(mesh.shape).get("data", 1) if mesh is not None else 1
        if max_batch % base != 0:
            raise ValueError(
                f"max_batch ({max_batch}) must be a multiple of the mesh's "
                f"data-axis size ({base}) — sharded batches split along 'data'."
            )
        self.tiers = tuple(base * 2**i for i in range((max_batch // base).bit_length())
                           if base * 2**i <= max_batch)
        if self.tiers[-1] != max_batch:
            self.tiers = self.tiers + (max_batch,)
        # Batch-assembly policy once the wait window closes (see _run):
        #   "snap" (default): dispatch the LARGEST TIER <= queue depth and
        #     leave the remainder queued — every dispatched batch is exactly
        #     a tier, so zero rows are padding whenever depth >= the smallest
        #     tier. Under a closed-loop client pattern the leftover merges
        #     with the resubmissions that arrive while the batch runs, so
        #     fill stays ~100% (measured: the "pad" policy filled a mean 21.4
        #     of tier 32 — ~33% of device rows were padding, BASELINE.md
        #     serving table).
        #   "pad": legacy round-4 behavior — take everything queued (up to
        #     max_batch) and pad up to the next tier >= n. Lower per-request
        #     latency at low occupancy; pays padding at high occupancy.
        if batch_policy not in ("snap", "pad"):
            raise ValueError(f"batch_policy must be 'snap' or 'pad', got {batch_policy!r}")
        self.batch_policy = batch_policy
        self.max_wait_s = max_wait_ms / 1000.0
        # Resolve the default concretely so {"steps": 50} and steps omitted land
        # in the SAME batch group when 50 is the scheduler default.
        self.default_steps = steps if steps is not None else pipe.get_default_steps()
        self.default_eta = float(eta)
        # Every distinct (steps, eta, encoding-seq) compiles a new denoise scan
        # ON THE WORKER THREAD — minutes through a remote-compile link, head-of-
        # line-blocking all traffic. Only pre-declared (warmable) settings are
        # accepted; everything else fails at submit() with the fix spelled out.
        self.allowed_steps = {self.default_steps} | {int(s) for s in (allowed_steps or ())}
        self.allowed_etas = {self.default_eta} | {float(e) for e in (allowed_etas or ())}
        # Audio-to-audio (style transfer) re-noises the client's clip to
        # start_step and denoises from there (reference workflow,
        # pipeline:150-158). Each start_step is its own compiled scan length,
        # so served values are declared up front like steps.
        self.allowed_start_steps = {int(s) for s in (allowed_start_steps or ())}
        self.conditional_seq = conditional_seq
        self.pcm16 = pcm16
        # Admission control (overload sheds with a fast QueueFull instead of
        # accepting work that will only time out): a GLOBAL cap on queued
        # requests across all settings groups, and a PER-GROUP cap so one
        # unusual settings combination cannot monopolize the whole queue.
        # Defaults: 8 full tiers globally, one global cap per group.
        self.max_queue = int(max_queue) if max_queue is not None else 8 * self.tiers[-1]
        self.max_group_queue = (int(max_group_queue) if max_group_queue is not None
                                else self.max_queue)
        if self.max_queue < 1 or self.max_group_queue < 1:
            raise ValueError("max_queue / max_group_queue must be >= 1")
        self.requests_shed = 0  # observability: admission-control rejections
        self._groups: dict = {}  # settings key -> deque[_Pending]
        self._cond = threading.Condition()
        self._closed = False
        self.batches_run = 0  # observability: pipeline calls made
        self.requests_served = 0
        self.stats = deque(maxlen=256)  # per-batch {n, run_s}
        self._latencies = deque(maxlen=1024)  # per-REQUEST submit->result secs
        self._stats_lock = threading.Lock()  # healthz readers vs finisher writer
        import queue

        self._finish_q: queue.Queue = queue.Queue(maxsize=2)
        self._worker = threading.Thread(target=self._run, name="adt-batcher", daemon=True)
        self._worker.start()
        self._finisher = threading.Thread(target=self._finish_loop, name="adt-finisher", daemon=True)
        self._finisher.start()

    # ------------------------------------------------------------- public API

    def submit(
        self,
        seed: int = 0,
        steps: Optional[int] = None,
        eta: Optional[float] = None,
        encoding: Optional[np.ndarray] = None,
        audio: Optional[np.ndarray] = None,
        start_step: int = 0,
    ) -> Future:
        """Enqueue one generation; returns a Future of :class:`GenerationResult`.

        Validation happens HERE, per request — a bad request must fail alone,
        never poison the futures of innocents co-batched with it."""
        seed = int(seed)
        if not 0 <= seed < 2**63:
            raise ValueError(f"seed must be in [0, 2**63), got {seed}")
        steps = int(steps) if steps is not None else self.default_steps
        if steps not in self.allowed_steps:
            raise ValueError(
                f"steps={steps} is not served (allowed: {sorted(self.allowed_steps)}). "
                "Novel step counts compile a new device program on the serving "
                "thread, stalling all traffic — declare them via allowed_steps "
                "(CLI: --allow_steps) so they are compiled at warmup."
            )
        eta = float(eta) if eta is not None else self.default_eta
        if eta not in self.allowed_etas:
            raise ValueError(
                f"eta={eta} is not served (allowed: {sorted(self.allowed_etas)}); "
                "declare it via allowed_etas (CLI: --allow_etas)."
            )
        cross_dim = self.pipe.unet.config.cross_attention_dim
        if encoding is not None:
            if cross_dim is None:
                raise ValueError("this model is unconditional — drop encoding=")
            encoding = np.asarray(encoding, dtype=np.float32)
            if encoding.ndim == 1:
                encoding = encoding[None, :]  # (dim,) -> length-1 sequence
            if encoding.ndim != 2 or encoding.shape[-1] != cross_dim:
                raise ValueError(
                    f"encoding must be (seq, cross_attention_dim={cross_dim}), "
                    f"got shape {encoding.shape}"
                )
            if encoding.shape[0] != self.conditional_seq:
                raise ValueError(
                    f"encoding seq length {encoding.shape[0]} is not served "
                    f"(this server compiles seq={self.conditional_seq}; "
                    "configure conditional_seq to serve longer sequences)."
                )
        elif cross_dim is not None:
            raise ValueError("this model is conditional — an encoding= is required")
        start_step = int(start_step)
        if audio is not None:
            if start_step not in self.allowed_start_steps:
                raise ValueError(
                    f"audio-to-audio start_step={start_step} is not served "
                    f"(allowed: {sorted(self.allowed_start_steps) or 'none'}); "
                    "declare served values via allowed_start_steps "
                    "(CLI: --allow_start_steps) so they compile at warmup."
                )
            if not 0 < start_step < steps:
                raise ValueError(
                    f"start_step must be in (0, steps={steps}) for audio-to-audio, "
                    f"got {start_step}"
                )
            audio = np.asarray(audio, dtype=np.float32).reshape(-1)
            full = self.pipe.mel.x_res * self.pipe.mel.hop_length
            if len(audio) > full:
                audio = audio[:full]  # one slice per request (mel slice size)
        elif start_step != 0:
            raise ValueError("start_step without audio= has nothing to re-noise — "
                             "pass the input clip")
        key = (steps, eta, None if encoding is None else encoding.shape,
               start_step, audio is not None)
        fut: Future = Future()
        with self._cond:
            if self._closed:
                raise RuntimeError("batcher is closed")
            # Admission control: shed NOW with a retry estimate rather than
            # enqueue work that will time out. Checked under the lock so the
            # caps are exact even with many submitting threads.
            total = sum(len(dq) for dq in self._groups.values())
            group_len = len(self._groups.get(key, ()))
            if total >= self.max_queue or group_len >= self.max_group_queue:
                self.requests_shed += 1
                which = ("queue" if total >= self.max_queue
                         else f"settings-group {key} queue")
                raise QueueFull(
                    f"server over capacity: {which} full "
                    f"({total}/{self.max_queue} queued); retry later",
                    retry_after_s=self._retry_after(total),
                )
            self._groups.setdefault(key, deque()).append(
                _Pending(seed, encoding, audio, fut, time.monotonic())
            )
            self._cond.notify()
        return fut

    def _retry_after(self, queued: int) -> float:
        """Estimate seconds until the queue has room: queued work divided by
        recent measured throughput (requests per second over the stats
        window), clamped to [1, 60]. With no stats yet (overload during
        warmup), the pessimistic 60 s cap applies."""
        with self._stats_lock:
            stats = list(self.stats)
        if stats:
            total_run = sum(s["run_s"] for s in stats) or 1e-3
            rate = sum(s["n"] for s in stats) / total_run
            est = queued / max(rate, 1e-3)
        else:
            est = 60.0
        return float(min(max(est, 1.0), 60.0))

    def warmup(self) -> None:
        """Compile every (tier, steps, eta) the server will accept, up front
        (first TPU compiles take minutes; a production server must not pay
        them on live traffic). Conditional models warm the cross-attention
        program at the served sequence length."""
        import jax
        import jax.numpy as jnp

        h, w = self.pipe.sample_hw
        c = self.pipe.unet.config.in_channels
        cross_dim = self.pipe.unet.config.cross_attention_dim
        full = self.pipe.mel.x_res * self.pipe.mel.hop_length
        for tier in self.tiers:
            noise = np.zeros((tier, h, w, c), np.float32)
            enc = None
            if cross_dim is not None:
                enc = np.zeros((tier, self.conditional_seq, cross_dim), np.float32)
            for steps in sorted(self.allowed_steps):
                for eta in sorted(self.allowed_etas):
                    # Pure generation + each served audio-to-audio start_step
                    # (every start_step is its own compiled scan length).
                    for start_step in [0] + sorted(
                        s for s in self.allowed_start_steps if 0 < s < steps
                    ):
                        # step_key is ALWAYS passed, as (tier,) per-row keys,
                        # exactly as _run_batch does: the fused program's
                        # signature includes whether step_key was supplied AND
                        # its shape, so a warmup without it (or with a scalar
                        # key) compiles a program live traffic never runs —
                        # the first real batch then pays a minutes-long
                        # compile inside the serving window (observed on the
                        # v5e: p50 latency 107 s until the live variants
                        # finished compiling). Gated by
                        # tests/test_serving.py::test_warmup_covers_live_batch_programs.
                        self.pipe(
                            noise=noise, encoding=enc, steps=steps, eta=eta,
                            start_step=start_step,
                            step_key=jnp.stack([jax.random.key(0)] * tier),
                            raw_audio=np.zeros((tier, full), np.float32) if start_step else None,
                            return_arrays=True, pcm16=self.pcm16,
                        )

    def close(self) -> None:
        """Stop the workers after draining already-queued requests."""
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._worker.join()
        self._finish_q.put(None)
        self._finisher.join()

    # ---------------------------------------------------------------- worker

    def _tier_for(self, n: int) -> int:
        for t in self.tiers:
            if t >= n:
                return t
        return self.tiers[-1]

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._closed and not any(self._groups.values()):
                    self._cond.wait()
                if not any(self._groups.values()):
                    return  # closed and drained
                # Serve the group whose head request has waited longest.
                key = min(
                    (k for k, dq in self._groups.items() if dq),
                    key=lambda k: self._groups[k][0].enqueued,
                )
                dq = self._groups[key]
                deadline = dq[0].enqueued + self.max_wait_s
                while (
                    not self._closed
                    and len(dq) < self.tiers[-1]
                    and (remaining := deadline - time.monotonic()) > 0
                ):
                    self._cond.wait(timeout=remaining)
                if self.batch_policy == "snap" and len(dq) >= self.tiers[0]:
                    # Largest tier <= depth; the remainder stays queued and
                    # merges with closed-loop resubmissions (FIFO: the oldest
                    # requests ship now, so nothing waits more than one extra
                    # batch). Depth < the smallest tier still dispatches —
                    # padded to tiers[0] — rather than stalling.
                    take = max(t for t in self.tiers if t <= len(dq))
                else:
                    take = min(len(dq), self.tiers[-1])
                batch = [dq.popleft() for _ in range(take)]
                if not dq:
                    del self._groups[key]  # don't leak a deque per settings key
            # Mark running (and drop requests cancelled while queued) BEFORE
            # the device call: a set_result on a cancelled future would raise
            # InvalidStateError mid-fan-out and corrupt co-batched results.
            batch = [p for p in batch if p.future.set_running_or_notify_cancel()]
            if not batch:
                continue
            try:
                self._run_batch(key, batch)
            except Exception as e:  # propagate to every caller, keep serving
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)

    def _run_batch(self, key: tuple, batch: list) -> None:
        steps, eta, enc_shape, start_step, has_audio = key
        h, w = self.pipe.sample_hw
        c = self.pipe.unet.config.in_channels
        tier = self._tier_for(len(batch))

        # Per-request noise derives from the seed HERE (batch-assembly), not
        # at submit: a queued request then costs ~bytes, not an (H, W, C)
        # array — bounded pending memory is part of admission control.
        noise = np.zeros((tier, h, w, c), np.float32)
        for i, p in enumerate(batch):
            noise[i] = _noise_for_seed(p.seed, h, w, c)
        encoding = None
        if enc_shape is not None:
            encoding = np.zeros((tier,) + enc_shape, np.float32)
            for i, p in enumerate(batch):
                encoding[i] = p.encoding
        raw_audio = None
        if has_audio:
            # (tier, slice) — each request styles ITS OWN clip (batched
            # per-sample inputs, pipelines/pipeline.py); padding rows are
            # silence and their outputs are dropped.
            full = self.pipe.mel.x_res * self.pipe.mel.hop_length
            raw_audio = np.zeros((tier, full), np.float32)
            for i, p in enumerate(batch):
                raw_audio[i, : len(p.audio)] = p.audio

        import jax
        import jax.numpy as jnp

        t_run = time.monotonic()
        raw_dev, audios_dev = self.pipe(
            noise=noise,
            encoding=encoding,
            raw_audio=raw_audio,
            start_step=start_step,
            steps=steps,
            eta=eta,
            # Per-ROW step keys derived from each request's seed: a request's
            # stochastic samples (DDPM / eta>0) are bitwise identical whether
            # it runs solo or co-batched at any tier — unlike the reference's
            # shared step_generator, whose results depend on batch
            # composition (pipeline_audio_diffusion.py:104-111). Padding rows
            # key from seed 0; their outputs are dropped.
            step_key=jnp.stack(
                [jax.random.key(p.seed) for p in batch]
                + [jax.random.key(0)] * (tier - len(batch))),
            return_arrays=True,
            pcm16=self.pcm16,
        )
        # Hand device arrays to the finisher: JAX dispatch is async, so the
        # worker can assemble + dispatch the NEXT batch while this one's
        # device-to-host transfer and fan-out happen on the finisher thread.
        # maxsize=2 bounds how many undelivered batch outputs sit on device.
        self._finish_q.put((batch, tier, raw_dev, audios_dev, t_run))

    # -------------------------------------------------------------- finisher

    def _finish_loop(self) -> None:
        while True:
            item = self._finish_q.get()
            if item is None:
                return
            batch, tier, raw_dev, audios_dev, t_run = item
            try:
                raw = np.asarray(raw_dev)
                audios = np.asarray(audios_dev)
            except Exception as e:
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)
                continue
            now = time.monotonic()
            with self._stats_lock:
                self.batches_run += 1
                self.requests_served += len(batch)
                self.stats.append({"n": len(batch), "tier": tier,
                                   "run_s": round(now - t_run, 4)})
                self._latencies.extend(round(now - p.enqueued, 4) for p in batch)
            sr = self.pipe.mel.get_sample_rate()
            for i, p in enumerate(batch):
                p.future.set_result(GenerationResult(raw[i], audios[i], sr))

    def latency_summary(self) -> dict:
        """p50/p95 PER-REQUEST submit-to-result latency + mean occupancy and
        device time over recent batches (snapshotted under the stats lock —
        the finisher appends concurrently)."""
        with self._stats_lock:
            stats = list(self.stats)
            lats = sorted(self._latencies)
        with self._cond:
            queued = sum(len(dq) for dq in self._groups.values())
        if not stats or not lats:
            return {"queued": queued, "requests_shed": self.requests_shed}
        return {
            "queued": queued,
            "requests_shed": self.requests_shed,
            "recent_batches": len(stats),
            "mean_batch": round(sum(s["n"] for s in stats) / len(stats), 2),
            # Fill = real rows / dispatched device rows; (1 - fill) is the
            # fraction of device compute spent on padding ("snap" policy
            # holds this at ~1.0 once depth >= the smallest tier).
            "fill": round(sum(s["n"] for s in stats)
                          / max(1, sum(s["tier"] for s in stats)), 3),
            "p50_latency_s": lats[len(lats) // 2],
            "p95_latency_s": lats[min(len(lats) - 1, int(len(lats) * 0.95))],
            "mean_run_s": round(sum(s["run_s"] for s in stats) / len(stats), 4),
        }
