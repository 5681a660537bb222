"""Serving gates: dynamic batching semantics + the HTTP front-end.

Pinned properties:
- a request's spectrogram is BIT-identical solo vs padded into a batch
  (per-seed host-derived noise; the whole image path is batch-elementwise);
- concurrent requests actually share one pipeline call (tier batching);
- incompatible settings (different steps) never share a compiled program;
- errors propagate to the affected futures and the worker keeps serving.

The reference's serving surface is single-request Gradio/Streamlit
(/root/reference/app.py:26-43); the batching layer is this framework's own.
"""

import http.client
import io
import json
import threading
import time
import wave

import jax
import numpy as np
import pytest

from audio_diffusion_tpu.mel import Mel
from audio_diffusion_tpu.models import UNet2D, UNetConfig
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
from audio_diffusion_tpu.schedulers import DDIMScheduler, SchedulerConfig
from audio_diffusion_tpu.serving import AudioDiffusionServer, DynamicBatcher
from audio_diffusion_tpu.serving.batcher import _noise_for_seed

RES = 16
HOP = 512


@pytest.fixture(scope="module")
def pipe():
    cfg = UNetConfig(sample_size=(RES, RES), block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     layers_per_block=1, norm_num_groups=4)
    unet = UNet2D(cfg)
    return AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(0)),
        Mel(x_res=RES, y_res=RES, hop_length=HOP),
        DDIMScheduler(SchedulerConfig(num_train_timesteps=100)),
    )


class CountingPipe:
    """Delegates to the real pipeline, recording every call's batch size."""

    def __init__(self, pipe):
        self._pipe = pipe
        self.call_batches = []
        self.lock = threading.Lock()

    def __getattr__(self, name):
        return getattr(self._pipe, name)

    def __call__(self, **kw):
        with self.lock:
            self.call_batches.append(len(kw["noise"]))
        return self._pipe(**kw)


def test_solo_equals_batched_bitwise(pipe):
    """Same seed -> bit-identical spectrogram whether run alone or padded
    into a tier with other requests (the per-request-noise contract)."""
    solo_raw, _ = pipe(noise=_noise_for_seed(7, RES, RES, 1)[None], steps=3,
                       return_arrays=True)
    solo = np.asarray(solo_raw)[0]

    batcher = DynamicBatcher(pipe, max_batch=4, max_wait_ms=200, steps=3)
    try:
        futs = [batcher.submit(seed=s) for s in (3, 7, 11)]  # pads to tier 4
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    np.testing.assert_array_equal(results[1].image, solo)
    assert results[0].image.dtype == np.uint8
    assert not np.array_equal(results[0].image, results[1].image), "seeds must differ"
    assert results[0].sample_rate == 22050
    assert np.isfinite(results[0].audio).all() and len(results[0].audio) == (RES - 1) * HOP  # librosa mel_to_audio length


def test_stochastic_solo_equals_batched_bitwise(pipe):
    """STOCHASTIC sampling (eta=1) is also batch-composition-independent:
    step noise is drawn from per-row keys derived from each request's seed
    (schedulers/common.py::variance_noise), so a request's spectrogram is
    bit-identical solo vs co-batched — strictly stronger than the
    reference's shared step_generator (pipeline_audio_diffusion.py:104-111),
    whose eta>0 results depend on who else is in the batch."""
    import jax.numpy as jnp

    solo_raw, _ = pipe(noise=_noise_for_seed(7, RES, RES, 1)[None], steps=3,
                       eta=1.0, step_key=jnp.stack([jax.random.key(7)]),
                       return_arrays=True)
    solo = np.asarray(solo_raw)[0]

    batcher = DynamicBatcher(pipe, max_batch=4, max_wait_ms=200, steps=3,
                             allowed_etas=(1.0,))
    try:
        futs = [batcher.submit(seed=s, eta=1.0) for s in (3, 7, 11)]  # tier 4
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    np.testing.assert_array_equal(results[1].image, solo)
    assert not np.array_equal(results[0].image, results[1].image), "seeds must differ"


def test_per_row_step_key_validation(pipe):
    """A (B,) step_key must match the generation batch; raw uint32 arrays
    are rejected (ambiguous between one key and a per-row batch)."""
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="must equal the generation batch"):
        pipe(batch_size=2, steps=2, eta=1.0,
             step_key=jnp.stack([jax.random.key(0)] * 3))
    with pytest.raises(ValueError, match="typed PRNG key"):
        pipe(batch_size=2, steps=2, eta=1.0,
             step_key=np.zeros((2,), np.uint32))


def test_concurrent_requests_share_one_batch(pipe):
    counting = CountingPipe(pipe)
    batcher = DynamicBatcher(counting, max_batch=4, max_wait_ms=1500, steps=2)
    try:
        batcher.submit(seed=0).result(timeout=120)  # also compiles tier 1
        futs = [batcher.submit(seed=s) for s in range(4)]
        for f in futs:
            f.result(timeout=120)
    finally:
        batcher.close()
    # 1 solo call + ONE tier-4 call for the 4 concurrent requests (they all
    # land within the 300 ms window while the worker holds the batch open).
    assert counting.call_batches[0] == 1
    assert counting.call_batches[1:] == [4], counting.call_batches


def test_snap_policy_dispatches_exact_tiers(pipe):
    """With the default "snap" assembly policy, every dispatched batch is
    exactly a tier <= queue depth: 7 queued requests against tiers (1,2,4,8)
    ship as 4+2+1 with ZERO padding rows, instead of one tier-8 batch with a
    wasted row (the round-4 "pad" behavior, 33% padding under the closed-loop
    serving benchmark — BASELINE.md serving table)."""
    counting = CountingPipe(pipe)
    batcher = DynamicBatcher(counting, max_batch=8, max_wait_ms=1500, steps=2)
    try:
        batcher.submit(seed=0).result(timeout=120)  # compile tier 1 first
        futs = [batcher.submit(seed=s) for s in range(7)]
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    assert counting.call_batches[0] == 1
    assert counting.call_batches[1:] == [4, 2, 1], counting.call_batches
    assert all(r.image.shape[:2] == (RES, RES) for r in results)
    assert batcher.latency_summary()["fill"] == 1.0


def test_pad_policy_pads_to_next_tier(pipe):
    """batch_policy="pad" (legacy): everything queued ships in one batch,
    padded up to the next tier."""
    counting = CountingPipe(pipe)
    batcher = DynamicBatcher(counting, max_batch=8, max_wait_ms=1500, steps=2,
                             batch_policy="pad")
    try:
        futs = [batcher.submit(seed=s) for s in range(3)]
        for f in futs:
            f.result(timeout=120)
    finally:
        batcher.close()
    assert counting.call_batches == [4], counting.call_batches  # 3 padded to 4
    assert batcher.latency_summary()["fill"] == 0.75
    with pytest.raises(ValueError, match="batch_policy"):
        DynamicBatcher(pipe, max_batch=2, batch_policy="nope")


def test_incompatible_settings_do_not_mix(pipe):
    counting = CountingPipe(pipe)
    batcher = DynamicBatcher(counting, max_batch=4, max_wait_ms=150, steps=2,
                             allowed_steps=(3,))
    try:
        f1 = batcher.submit(seed=0)            # steps=2 group
        f2 = batcher.submit(seed=0, steps=3)   # separate compiled program
        r1, r2 = f1.result(timeout=120), f2.result(timeout=120)
    finally:
        batcher.close()
    assert len(counting.call_batches) == 2, "different steps must not share a batch"
    assert not np.array_equal(r1.image, r2.image)


def test_explicit_default_steps_shares_the_group(pipe):
    """{"steps": <the default>} and steps omitted are the same compiled
    program and must share one batch."""
    counting = CountingPipe(pipe)
    batcher = DynamicBatcher(counting, max_batch=4, max_wait_ms=1500, steps=2)
    try:
        f1 = batcher.submit(seed=0)
        f2 = batcher.submit(seed=1, steps=2)
        f1.result(timeout=120), f2.result(timeout=120)
    finally:
        batcher.close()
    assert counting.call_batches == [2], counting.call_batches


def test_undeclared_settings_rejected_at_submit(pipe):
    """Novel steps/eta would compile on the serving thread (head-of-line DoS)
    — they fail the ONE request, at submit, with the fix named."""
    batcher = DynamicBatcher(pipe, max_batch=2, steps=2)
    try:
        with pytest.raises(ValueError, match="allow_steps"):
            batcher.submit(steps=41)
        with pytest.raises(ValueError, match="allowed_etas"):
            batcher.submit(eta=0.7)
        with pytest.raises(ValueError, match="seed"):
            batcher.submit(seed=-1)
        with pytest.raises(ValueError, match="unconditional"):
            batcher.submit(encoding=np.zeros((1, 8), np.float32))
        # The worker is untouched by rejected submits.
        ok = batcher.submit(seed=1).result(timeout=120)
        assert ok.image.shape[:2] == (RES, RES)
    finally:
        batcher.close()


def test_cancelled_future_does_not_poison_the_batch(pipe):
    batcher = DynamicBatcher(pipe, max_batch=4, max_wait_ms=1000, steps=2)
    try:
        f1 = batcher.submit(seed=0)
        f2 = batcher.submit(seed=1)
        assert f1.cancel()  # cancelled while queued (inside the 1 s window)
        r2 = f2.result(timeout=120)  # co-batched request must still resolve
        assert r2.image.shape[:2] == (RES, RES)
        assert f1.cancelled()
    finally:
        batcher.close()


def test_submit_validates_encoding_shape(pipe):
    cfg = UNetConfig(sample_size=(RES, RES), block_out_channels=(8, 16),
                     down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                     layers_per_block=1, norm_num_groups=4,
                     attention_head_dim=4, cross_attention_dim=8)
    unet = UNet2D(cfg)
    cond_pipe = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(0)),
        Mel(x_res=RES, y_res=RES, hop_length=HOP),
        DDIMScheduler(SchedulerConfig(num_train_timesteps=100)),
    )
    batcher = DynamicBatcher(cond_pipe, max_batch=2, max_wait_ms=10, steps=2)
    try:
        with pytest.raises(ValueError, match="cross_attention_dim=8"):
            batcher.submit(encoding=np.zeros((1, 5), np.float32))  # wrong dim
        with pytest.raises(ValueError, match="seq length"):
            batcher.submit(encoding=np.zeros((3, 8), np.float32))  # unserved seq
        with pytest.raises(ValueError, match="encoding= is required"):
            batcher.submit(seed=0)  # conditional model, no encoding
        # (dim,) promotes to the served length-1 sequence and generates.
        r = batcher.submit(seed=0, encoding=np.ones((8,), np.float32)).result(timeout=120)
        assert r.image.shape[:2] == (RES, RES)
    finally:
        batcher.close()


class FlakyPipe(CountingPipe):
    """Raises on the first pipeline call, then recovers."""

    def __call__(self, **kw):
        with self.lock:
            self.call_batches.append(len(kw["noise"]))
            first = len(self.call_batches) == 1
        if first:
            raise RuntimeError("injected device failure")
        return self._pipe(**kw)


def test_batch_failure_propagates_and_worker_survives(pipe):
    batcher = DynamicBatcher(FlakyPipe(pipe), max_batch=2, max_wait_ms=10, steps=2)
    try:
        bad = batcher.submit(seed=0)
        with pytest.raises(RuntimeError, match="injected device failure"):
            bad.result(timeout=120)
        ok = batcher.submit(seed=1).result(timeout=120)  # worker kept serving
        assert ok.image.shape[:2] == (RES, RES)
    finally:
        batcher.close()


def test_http_server_end_to_end(pipe):
    server = AudioDiffusionServer(pipe, port=0, max_batch=4, max_wait_ms=100, steps=2)
    server.start()
    host, port = server.address[:2]
    try:
        def post(body):
            conn = http.client.HTTPConnection(host, port, timeout=300)
            conn.request("POST", "/generate", json.dumps(body),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = resp.read()
            conn.close()
            return resp, data

        # Concurrent WAV requests (batched server-side).
        results = {}

        def worker(seed):
            results[seed] = post({"seed": seed})

        threads = [threading.Thread(target=worker, args=(s,)) for s in (1, 2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for seed, (resp, data) in results.items():
            assert resp.status == 200 and resp.getheader("Content-Type") == "audio/wav"
            with wave.open(io.BytesIO(data)) as wav:
                assert wav.getframerate() == 22050
                assert wav.getnframes() == (RES - 1) * HOP
        assert results[1][1] != results[2][1], "different seeds -> different audio"

        # JSON format: spectrogram + base64 PCM.
        resp, data = post({"seed": 1, "format": "json"})
        payload = json.loads(data)
        img = np.asarray(payload["image"], dtype=np.uint8)
        assert img.shape[:2] == (RES, RES)
        import base64
        pcm = np.frombuffer(base64.b64decode(payload["pcm16_base64"]), dtype=np.int16)
        assert len(pcm) == (RES - 1) * HOP

        # Health endpoint reports batching observability.
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        conn.close()
        assert health["status"] == "ok" and health["batches_run"] >= 1

        # Malformed request -> 400, not a crash.
        resp, data = post({"encoding": "not-an-array"})
        assert resp.status == 400
    finally:
        server.stop()


def test_sharded_batcher_over_mesh(pipe):
    """Serving over a device mesh: tiers become multiples of the data-axis
    size, requests shard SPMD, and results stay bit-identical to the
    unsharded solo run (the per-request-noise contract survives sharding)."""
    from audio_diffusion_tpu.parallel.mesh import make_mesh

    solo_raw, _ = pipe(noise=_noise_for_seed(7, RES, RES, 1)[None], steps=3,
                       return_arrays=True)
    solo = np.asarray(solo_raw)[0]

    cfg = pipe.unet.config
    unet = UNet2D(cfg)
    sharded_pipe = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(0)),
        Mel(x_res=RES, y_res=RES, hop_length=HOP),
        DDIMScheduler(SchedulerConfig(num_train_timesteps=100)),
    ).shard(make_mesh(num_data=8))

    with pytest.raises(ValueError, match="multiple of the mesh"):
        DynamicBatcher(sharded_pipe, max_batch=4)

    batcher = DynamicBatcher(sharded_pipe, max_batch=16, max_wait_ms=200, steps=3)
    assert batcher.tiers == (8, 16)
    try:
        futs = [batcher.submit(seed=s) for s in (3, 7, 11)]  # pads to tier 8
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    np.testing.assert_array_equal(results[1].image, solo)


class GatedPipe(CountingPipe):
    """Blocks every pipeline call until released — holds the worker busy so
    tests can fill the queue deterministically. ``entered`` signals the worker
    is INSIDE the call (its batch is in flight, not queued)."""

    def __init__(self, pipe):
        super().__init__(pipe)
        self.release = threading.Event()
        self.entered = threading.Event()

    def __call__(self, **kw):
        self.entered.set()
        self.release.wait(timeout=120)
        return super().__call__(**kw)


def test_overload_sheds_with_queue_full(pipe):
    """Admission control: with the worker busy and the queue at max_queue,
    further submits fail FAST with QueueFull (+ retry estimate) instead of
    enqueueing toward a timeout; every ACCEPTED request still resolves
    (no poisoned futures), and the shed count is observable."""
    from audio_diffusion_tpu.serving import QueueFull

    gated = GatedPipe(pipe)
    batcher = DynamicBatcher(gated, max_batch=1, max_wait_ms=5, steps=2,
                             max_queue=4)
    try:
        # One request through first so the worker is INSIDE the gated call
        # (max_batch=1: it takes exactly this one), then 4 fill the queue.
        first = batcher.submit(seed=0)
        assert gated.entered.wait(timeout=60)
        accepted = [batcher.submit(seed=s) for s in range(1, 5)]
        with pytest.raises(QueueFull, match="over capacity") as exc_info:
            batcher.submit(seed=99)
        assert 1.0 <= exc_info.value.retry_after_s <= 60.0
        assert batcher.requests_shed == 1
        summary = batcher.latency_summary()
        assert summary["requests_shed"] == 1 and summary["queued"] == 4

        gated.release.set()  # unblock the device; everything accepted resolves
        for f in [first] + accepted:
            r = f.result(timeout=120)
            assert r.image.shape[:2] == (RES, RES)
        # capacity freed -> submits admitted again
        assert batcher.submit(seed=100).result(timeout=120).image.dtype == np.uint8
    finally:
        gated.release.set()
        batcher.close()


def test_per_group_queue_cap(pipe):
    """One settings group at its cap must not block OTHER groups' admission."""
    from audio_diffusion_tpu.serving import QueueFull

    gated = GatedPipe(pipe)
    batcher = DynamicBatcher(gated, max_batch=1, max_wait_ms=5, steps=2,
                             allowed_steps=(3,), max_queue=8, max_group_queue=2)
    try:
        first = batcher.submit(seed=0)
        assert gated.entered.wait(timeout=60)
        group_a = [batcher.submit(seed=s, steps=2) for s in (1, 2)]
        with pytest.raises(QueueFull, match="settings-group"):
            batcher.submit(seed=3, steps=2)
        other = batcher.submit(seed=4, steps=3)  # different group: admitted
        gated.release.set()
        for f in [first] + group_a + [other]:
            assert f.result(timeout=120).image.dtype == np.uint8
    finally:
        gated.release.set()
        batcher.close()


def test_http_429_with_retry_after(pipe):
    """HTTP overload contract: over-capacity POSTs get a prompt 429 with a
    Retry-After header while the worker is busy."""
    gated = GatedPipe(pipe)
    server = AudioDiffusionServer(gated, port=0, max_batch=1, max_wait_ms=5,
                                  steps=2, max_queue=2)
    server.start()
    host, port = server.address[:2]

    def post(body, timeout=120):
        conn = http.client.HTTPConnection(host, port, timeout=timeout)
        conn.request("POST", "/generate", json.dumps(body),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        return resp, data

    try:
        # Saturate deterministically: 1 in flight (max_batch=1, worker blocked
        # inside the pipe) + 2 queued = max_queue.
        results = {}

        def client(s):
            results[s] = post({"seed": s})

        threads = [threading.Thread(target=client, args=(1,))]
        threads[0].start()
        assert gated.entered.wait(timeout=60)
        threads += [threading.Thread(target=client, args=(s,)) for s in (2, 3)]
        for t in threads[1:]:
            t.start()
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if server.batcher.latency_summary().get("queued", 0) >= 2:
                break
            time.sleep(0.02)
        assert server.batcher.latency_summary().get("queued", 0) >= 2
        t0 = time.monotonic()
        resp, data = post({"seed": 99}, timeout=30)
        shed_latency = time.monotonic() - t0
        assert resp.status == 429
        assert int(resp.getheader("Retry-After")) >= 1
        assert json.loads(data)["retry_after_s"] >= 1
        assert shed_latency < 5.0, "shed must be fast, not queue-to-timeout"
        gated.release.set()
        for t in threads:
            t.join()
        for s, (r, d) in results.items():
            assert r.status == 200, f"accepted request {s} must still succeed"
    finally:
        gated.release.set()
        server.stop()


def test_serve_cli_parser():
    import sys
    sys.path.insert(0, "scripts")
    import serve

    a = serve.parse_args(["--model", "m", "--max_batch", "32", "--dtype", "bfloat16",
                          "--no-warmup"])
    assert a.max_batch == 32 and a.dtype == "bfloat16" and a.warmup is False


def test_audio_to_audio_serving(pipe):
    """Style-transfer requests: each request's clip conditions ITS OWN output
    (batched per-sample inputs), bit-identical to a direct pipeline call with
    the same noise and input (reference workflow: re-noise to start_step,
    pipeline:150-158)."""
    full = RES * HOP
    rng = np.random.default_rng(0)
    clips = (rng.standard_normal((2, full)) * 0.1).astype(np.float32)

    batcher = DynamicBatcher(pipe, max_batch=4, max_wait_ms=200, steps=4,
                             allowed_start_steps=(2,))
    try:
        with pytest.raises(ValueError, match="start_step=1 is not served"):
            batcher.submit(audio=clips[0], start_step=1)
        with pytest.raises(ValueError, match="nothing to re-noise"):
            batcher.submit(start_step=2)
        futs = [batcher.submit(seed=s, audio=clips[s], start_step=2) for s in (0, 1)]
        results = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()

    # Direct call with the same per-request noise + clip must match bitwise
    # (padding rows in the tier batch don't perturb real rows).
    noise = np.stack([_noise_for_seed(s, RES, RES, 1) for s in (0, 1)])
    direct_raw, _ = pipe(raw_audio=clips, noise=noise, start_step=2, steps=4,
                         return_arrays=True)
    direct = np.asarray(direct_raw)
    for i in (0, 1):
        np.testing.assert_array_equal(results[i].image, direct[i])
    assert not np.array_equal(results[0].image, results[1].image)


def test_http_audio_to_audio(pipe):
    import base64

    server = AudioDiffusionServer(pipe, port=0, max_batch=2, max_wait_ms=50,
                                  steps=4, allowed_start_steps=(2,))
    server.start()
    host, port = server.address[:2]
    try:
        clip = (np.sin(np.arange(RES * HOP) * 0.05) * 20000).astype(np.int16)
        body = json.dumps({
            "seed": 3, "start_step": 2,
            "audio_pcm16_base64": base64.b64encode(clip.tobytes()).decode(),
        })
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request("POST", "/generate", body, {"Content-Type": "application/json"})
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        assert resp.status == 200 and resp.getheader("Content-Type") == "audio/wav"
        with wave.open(io.BytesIO(data)) as wav:
            assert wav.getnframes() == (RES - 1) * HOP
    finally:
        server.stop()


def test_http_wav_and_json_paths_return_identical_pcm(pipe):
    """The wav container's frames and the json path's pcm16_base64 are the
    SAME device-quantized samples (no second normalize/quantize pass), and a
    non-object JSON body 400s instead of killing the handler."""
    import base64

    server = AudioDiffusionServer(pipe, port=0, max_batch=2, max_wait_ms=10, steps=2)
    server.start()
    host, port = server.address[:2]
    try:
        def post(payload):
            conn = http.client.HTTPConnection(host, port, timeout=300)
            conn.request("POST", "/generate", payload, {"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = resp.read()
            conn.close()
            return resp, data

        resp_wav, wav_data = post(json.dumps({"seed": 12}))
        resp_json, json_data = post(json.dumps({"seed": 12, "format": "json"}))
        assert resp_wav.status == 200 and resp_json.status == 200
        with wave.open(io.BytesIO(wav_data)) as w:
            frames = w.readframes(w.getnframes())
        pcm = base64.b64decode(json.loads(json_data)["pcm16_base64"])
        assert frames == pcm, "wav and json must deliver identical samples"

        resp, data = post(json.dumps([1, 2, 3]))
        assert resp.status == 400 and b"JSON object" in data
    finally:
        server.stop()


def test_sharded_audio_to_audio_over_mesh(pipe):
    """Style-transfer requests over an 8-device mesh: per-sample inputs shard
    with the batch and results stay bit-identical to the unsharded run."""
    from audio_diffusion_tpu.parallel.mesh import make_mesh

    full = RES * HOP
    clips = (np.random.default_rng(3).standard_normal((2, full)) * 0.1).astype(np.float32)
    noise = np.stack([_noise_for_seed(s, RES, RES, 1) for s in (0, 1)])
    direct_raw, _ = pipe(raw_audio=clips, noise=noise, start_step=2, steps=4,
                         return_arrays=True)
    direct = np.asarray(direct_raw)

    cfg = pipe.unet.config
    unet = UNet2D(cfg)
    sharded = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(0)),
        Mel(x_res=RES, y_res=RES, hop_length=HOP),
        DDIMScheduler(SchedulerConfig(num_train_timesteps=100)),
    ).shard(make_mesh(num_data=8))
    batcher = DynamicBatcher(sharded, max_batch=8, max_wait_ms=300, steps=4,
                             allowed_start_steps=(2,))
    try:
        futs = [batcher.submit(seed=s, audio=clips[s], start_step=2) for s in (0, 1)]
        results = [f.result(timeout=180) for f in futs]
    finally:
        batcher.close()
    for i in (0, 1):
        np.testing.assert_array_equal(results[i].image, direct[i])


def test_warmup_covers_live_batch_programs():
    """After warmup(), a live batch must hit ONLY programs warmup already
    compiled. The fused program's static signature includes whether step_key
    was supplied, and _run_batch always supplies it — so a warmup that omits
    step_key compiles a variant live traffic never runs, and the first real
    batch pays a minutes-long compile inside the serving window (observed on
    the v5e: p50 latency 107 s). Fresh pipeline, so the compile-cache
    accounting is exact."""
    cfg = UNetConfig(sample_size=(RES, RES), block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     layers_per_block=1, norm_num_groups=4)
    unet = UNet2D(cfg)
    fresh = AudioDiffusionPipeline(
        unet, unet.init_params(jax.random.key(0)),
        Mel(x_res=RES, y_res=RES, hop_length=HOP),
        DDIMScheduler(SchedulerConfig(num_train_timesteps=100)),
    )
    batcher = DynamicBatcher(fresh, max_batch=4, max_wait_ms=50, steps=3)
    batcher.warmup()
    warmed = set(fresh._compiled.keys())
    try:
        futs = [batcher.submit(seed=s) for s in (1, 2)]
        for f in futs:
            f.result(timeout=120)
    finally:
        batcher.close()
    new = set(fresh._compiled.keys()) - warmed
    assert not new, f"live batch compiled programs warmup missed: {sorted(map(str, new))}"
