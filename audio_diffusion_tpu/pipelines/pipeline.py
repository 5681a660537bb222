"""AudioDiffusionPipeline — inference orchestration, single-scan on TPU.

TPU-native rebuild of the reference pipeline (reference:
audiodiffusion/pipeline_audio_diffusion.py:39-258). Feature-complete:
unconditional generation, audio-to-audio via ``start_step`` re-noising,
outpaint/inpaint column masking, conditional generation via ``encoding``,
latent diffusion through a KL-VAE (0.18215 scaling), DDIM ``eta``,
user-supplied ``noise``, DDIM inversion ``encode``, and ``slerp``.

Architecture differences from the reference (deliberate, TPU-first):

* the entire denoise loop — UNet forward, scheduler step, mask overwrite —
  compiles to ONE ``jax.jit``-ed ``lax.scan`` (reference iterates in Python,
  one CUDA launch stream per step; SURVEY.md §3.1);
* the per-step mask is computed inside the scan body from (input, noise, t)
  instead of materializing a (steps, H, W) mask stack (constant HBM);
* explicit JAX PRNG keys replace ``torch.Generator``;
* ``start_step`` re-noising applies to the whole batch (the reference writes
  only ``images[0, 0]`` — a batch-1 bug, pipeline_audio_diffusion.py:150);
* arrays are NHWC;
* Griffin-Lim for the output batch runs as one batched device program.

The per-step mask overwrite uses the noise level of the *current* timestep
``t`` even though the sample has just been stepped to ``t_prev`` — the
reference's exact (slightly off-by-one) semantics, preserved for parity
(pipeline_audio_diffusion.py:157,181-185).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from PIL import Image

from ..mel import Mel
from ..models.unet2d import UNet2D, UNetConfig
from ..schedulers import DDIMScheduler, DDPMScheduler, load_scheduler, save_scheduler
from ..schedulers.common import split_step_key

LATENT_SCALE = 0.18215  # SD latent scaling (reference: pipeline:147,188; train_unet.py:234-235)


def postprocess_images(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] model output -> (B, H, W) uint8 grayscale, exact reference math
    (pipeline:192-199): half-to-even round to uint8 (jnp.round == torch.round),
    then for 3-channel VAE output the bit-exact PIL ``convert("L")`` luminance —
    ITU-R 601-2 in 16.16 fixed point, round-half-up via +0x8000 (PIL
    libImaging/Convert.c L24; verified exact against PIL 12.1 on random uint8
    RGB — float round() drifted +-1 at .5 ties)."""
    x = jnp.clip(x / 2 + 0.5, 0.0, 1.0)
    x = jnp.round(x * 255).astype(jnp.uint8)
    if x.shape[-1] == 1:
        return x[..., 0]
    x32 = x.astype(jnp.int32)
    lum = (x32[..., 0] * 19595 + x32[..., 1] * 38470 + x32[..., 2] * 7471 + 0x8000) >> 16
    return lum.astype(jnp.uint8)


def pcm16_quantize(audio: jnp.ndarray) -> jnp.ndarray:
    """Peak-normalize + quantize float audio to 16-bit PCM on device (the
    exact payload the apps deliver, apps.wav_bytes). The SINGLE definition of
    the serving pcm16 contract — the fused program, the staged path, and
    scripts/stage_ledger.py all call this, so the ledger times the op serving
    actually runs."""
    peak = jnp.maximum(jnp.max(jnp.abs(audio), axis=-1, keepdims=True), 1e-12)
    return jnp.clip(audio / peak * 32767.0, -32768, 32767).astype(jnp.int16)


@dataclasses.dataclass
class PipelineOutput:
    images: List[Image.Image]
    sample_rate: int
    audios: List[np.ndarray]
    raw_images: np.ndarray  # (B, H, W) uint8


class AudioDiffusionPipeline:
    """Composes {unet, scheduler, mel, optional vqvae} (reference: pipeline:53-61)."""

    def __init__(
        self,
        unet: UNet2D,
        unet_params,
        mel: Mel,
        scheduler: Union[DDIMScheduler, DDPMScheduler],
        vqvae=None,
        vqvae_params=None,
    ):
        self.unet = unet
        # Commit params to device ONCE: numpy trees (e.g. from_pretrained's
        # msgpack load) passed as jit arguments re-transfer on EVERY call —
        # ~450 MB per generation through this backend's tunnel. Device arrays
        # are passed by reference.
        self.unet_params = jax.device_put(unet_params)
        self.mel = mel
        self.scheduler = scheduler
        self.vqvae = vqvae
        self.vqvae_params = jax.device_put(vqvae_params) if vqvae_params is not None else None
        self._compiled = {}
        self.mesh = None
        # Route eligible calls through the single fused device program
        # (_fused_generate_fn). Escape hatch for A/B parity tests.
        self.fuse = True

    def shard(self, mesh) -> "AudioDiffusionPipeline":
        """Distribute inference over a device mesh: parameters replicate,
        generation batches shard along the ``data`` axis, and every jitted
        program (denoise scan, VAE, Griffin-Lim) runs SPMD via sharding
        propagation. batch_size must be divisible by the data-axis size."""
        from ..parallel.mesh import replicated

        self.mesh = mesh
        self.unet_params = jax.device_put(self.unet_params, replicated(mesh))
        if self.vqvae_params is not None:
            self.vqvae_params = jax.device_put(self.vqvae_params, replicated(mesh))
        self._compiled = {}  # re-trace against the new placements
        return self

    # ------------------------------------------------------------------ misc
    def get_default_steps(self) -> int:
        """50 for DDIM / num_train_timesteps for DDPM (reference: pipeline:63-69)."""
        return self.scheduler.default_num_inference_steps()

    @property
    def sample_hw(self) -> Tuple[int, int]:
        return self.unet.config.sample_hw()

    @property
    def is_latent(self) -> bool:
        return self.vqvae is not None

    # ----------------------------------------------------------- compiled core
    def _vae_encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic latent encode (posterior mode, LATENT_SCALE applied)
        — shared by DDIM inversion and the batched per-sample input path,
        both of which require batch-composition-independent results."""
        if "vae_encode_mode" not in self._compiled:
            self._compiled["vae_encode_mode"] = jax.jit(
                lambda p, z: LATENT_SCALE * self.vqvae.apply(
                    {"params": p}, z, method=self.vqvae.encode
                ).mode()
            )
        return self._compiled["vae_encode_mode"](self.vqvae_params, x)

    def _denoise_fn(self, steps: int, start_step: int, eta: float, mask_start: int, mask_end: int,
                    has_input: bool, has_encoding: bool):
        """Build (and cache) the jitted scan for one static configuration."""
        cache_key = (steps, start_step, eta, mask_start, mask_end, has_input, has_encoding)
        if cache_key in self._compiled:
            return self._compiled[cache_key]

        scheduler = self.scheduler
        schedule = scheduler.schedule(steps)
        timesteps = jnp.asarray(schedule.timesteps[start_step:], dtype=jnp.int32)
        unet = self.unet
        is_ddim = isinstance(scheduler, DDIMScheduler)
        width = self.sample_hw[1]
        cols = jnp.arange(width)
        # Columns the mask *freezes* (reference: pipeline:181-185).
        frozen = jnp.zeros((width,), dtype=bool)
        if mask_start > 0:
            frozen = frozen | (cols < mask_start)
        if mask_end > 0:
            frozen = frozen | (cols >= width - mask_end)
        frozen = frozen[None, None, :, None]  # NHWC broadcast over (B, H, W, C)

        def run(params, images, input_images, noise, encoding, step_key):
            def body(carry, t):
                x, key = carry
                # Scalar step_key chains like the reference's step_generator;
                # a (B,) per-row key vector chains each row independently
                # (serving determinism for stochastic sampling — common.py).
                key, sub = split_step_key(key)
                model_output = unet.apply({"params": params}, x, jnp.broadcast_to(t, (x.shape[0],)), encoding)
                if is_ddim:
                    x = scheduler.step(model_output, t, x, schedule, eta=eta, key=sub)
                else:
                    x = scheduler.step(model_output, t, x, schedule, key=sub)
                if has_input and (mask_start > 0 or mask_end > 0):
                    mask_t = scheduler.add_noise(input_images, noise, t)
                    x = jnp.where(frozen, mask_t, x)
                return (x, key), None

            (x, _), _ = jax.lax.scan(body, (images, step_key), timesteps)
            return x

        fn = jax.jit(run)
        self._compiled[cache_key] = fn
        return fn

    def _input_slices(self, audio_file, raw_audio, slice: int):
        """Host-side audio-to-audio slice prep, shared by the fused and staged
        paths: returns ``((B or 1, slice_size) f32, batched)``.

        Batched per-sample inputs (2-D ``raw_audio``) are a TPU-first
        extension: the reference broadcasts ONE clip across the whole batch
        (pipeline:150-151), so multi-clip audio2audio costs one serial call
        per clip there. Each row is one slice at the mel sample rate (shorter
        rows zero-pad, like ``mel.load_audio``)."""
        batched = raw_audio is not None and np.asarray(raw_audio).ndim == 2
        if batched:
            rows = np.asarray(raw_audio, dtype=np.float32)
            full = self.mel.x_res * self.mel.hop_length
            if rows.shape[1] < full:
                rows = np.pad(rows, ((0, 0), (0, full - rows.shape[1])))
            return rows[:, : full - 1], True  # slice_size = x_res*hop - 1
        self.mel.load_audio(audio_file, raw_audio)
        return np.asarray(self.mel.get_audio_slice(slice), dtype=np.float32)[None], False

    def _prep_inputs(self, vae_params, slices, noise, vae_key,
                     input_mode: str, t0: Optional[int]):
        """Audio-to-audio device prep: mel forward -> [-1,1] -> [VAE encode]
        -> broadcast -> [re-noise at t0]. Returns ``(images, input_images)``.

        ONE definition traced by BOTH paths — the staged path runs it as its
        own jitted program (`_prep_fn`), the fused program inlines it behind
        an ``optimization_barrier``. Why: XLA fuses the uint8->[-1,1]
        conversion and the re-noise FMAs differently inline vs staged
        (one-ULP diffs the denoise scan amplifies chaotically — measured
        max-3-uint8 spectrogram divergence on TPU v5e before this); an
        identical sub-graph plus a program-boundary-equivalent barrier keeps
        fused-vs-staged parity BITWISE. The conversion uses the
        exact-integer form ``(u8*2 - 255)/255`` — integer-exact until one
        correctly-rounded divide, immune to FMA/constant-folding variance
        (mathematically == the reference's ``(image/255)*2 - 1``,
        pipeline_audio_diffusion.py:139-147).

        ``input_mode``: "batched" = per-sample rows, deterministic posterior
        MODE (the serving contract — a row's result must not depend on batch
        composition); "single" = one clip broadcast across the batch,
        posterior SAMPLING under ``vae_key`` (the reference's semantics,
        pipeline:143-151)."""
        inp = self.mel._forward(slices).astype(jnp.float32)
        inp = (inp * 2.0 - 255.0) / 255.0
        inp = inp[..., None]  # (B or 1, H, W, 1)
        if self.is_latent:
            posterior = self.vqvae.apply({"params": vae_params}, inp,
                                         method=self.vqvae.encode)
            if input_mode == "batched":
                inp = LATENT_SCALE * posterior.mode()
            else:
                inp = LATENT_SCALE * posterior.sample(vae_key)
        input_images = jnp.broadcast_to(inp, noise.shape)
        images = noise
        if t0 is not None:
            images = self.scheduler.add_noise(input_images, noise, t0)
        return images, input_images

    def _prep_fn(self, input_mode: str, t0: Optional[int]):
        """Cached jitted program over `_prep_inputs` for the staged path."""
        cache_key = ("prep", input_mode, t0)
        if cache_key not in self._compiled:
            self._compiled[cache_key] = jax.jit(
                lambda vp, s, n, k: self._prep_inputs(vp, s, n, k, input_mode, t0))
        return self._compiled[cache_key]

    def _validate_encoding(self, encoding, batch_rows: int):
        """Validate/normalize a conditioning encoding to (B, seq, dim); raises
        with actionable messages (shared by the fused and staged paths)."""
        if encoding is None:
            return None
        if not self.unet.config.is_conditional:
            raise ValueError(
                "encoding= was passed but this pipeline's UNet is unconditional "
                "(config.cross_attention_dim is None) — the conditioning would be "
                "silently ignored. Load a conditional model or drop encoding=.")
        enc = jnp.asarray(encoding, dtype=jnp.float32)
        if enc.ndim == 2:
            # (B, dim) — AudioEncoder's pooled output — promotes to a
            # length-1 cross-attention sequence, matching the training
            # batcher (data/dataset.py) and the reference workflow
            # (encodings pickled per-file, train_unet.py:85-87).
            enc = enc[:, None, :]
        want = self.unet.config.cross_attention_dim
        if enc.ndim != 3 or enc.shape[-1] != want:
            raise ValueError(
                f"encoding must be (batch, seq, {want}) [or (batch, {want})], "
                f"got shape {tuple(enc.shape)} — the last axis must equal the "
                f"UNet's cross_attention_dim ({want}).")
        # The effective batch is the noise's leading axis (user-supplied
        # noise= overrides batch_size, e.g. the encode()->slerp workflow).
        if enc.shape[0] != batch_rows:
            raise ValueError(
                f"encoding batch axis ({enc.shape[0]}) must equal the "
                f"generation batch ({batch_rows}).")
        return enc

    def _validate_step_key(self, step_key, batch_rows: int):
        """step_key is either ONE typed key (chained across steps like the
        reference's step_generator — row i's stochastic noise then depends on
        batch composition) or a (B,) vector of per-row keys (each row's noise
        chain depends only on its own key: batch-composition-independent
        stochastic sampling, the serving determinism contract — see
        schedulers/common.py::variance_noise)."""
        if step_key is None:
            return
        if not jnp.issubdtype(step_key.dtype, jax.dtypes.prng_key):
            raise ValueError(
                "step_key must be a typed PRNG key (jax.random.key); a raw "
                "uint32 array is ambiguous between one key and a per-row batch.")
        if step_key.ndim == 1 and step_key.shape[0] != batch_rows:
            raise ValueError(
                f"per-row step_key batch ({step_key.shape[0]}) must equal the "
                f"generation batch ({batch_rows}).")
        if step_key.ndim > 1:
            raise ValueError(
                f"step_key must be a scalar key or a (batch,) key vector, "
                f"got shape {tuple(step_key.shape)}.")

    def _fused_generate_fn(self, steps: int, eta: float, batch_size: int,
                           has_encoding: bool, gen_noise: bool, derive_step_key: bool,
                           pcm16: bool, start_step: int = 0, mask_start: int = 0,
                           mask_end: int = 0, input_mode: str = "none"):
        """ONE compiled program for the whole serving hot path: [noise gen +]
        [mel forward + VAE encode + re-noise +] denoise scan + VAE decode +
        uint8 postprocess + NNLS/Griffin-Lim + [pcm16]. The staged path
        dispatches ~6 programs per generation; each dispatch is an RPC through
        the remote-device tunnel, and under tunnel congestion those gaps
        starve the chip (observed 25-40%% end-to-end swings on identical
        commands). Fusing to one execution per batch makes throughput
        insensitive to dispatch latency and lets XLA schedule the stages
        without host round-trips. Math is identical to the staged path (the
        inner jitted fns are traced inline), including the exact key-split
        order of __call__: spectrograms measure bit-equal; audio is within 1
        int16 LSB (fusion changes f32 reduction order — see
        tests/test_pipeline.py::test_fused_path_matches_staged_bitwise).

        ``input_mode`` covers the audio-to-audio hot loop the reference runs
        staged (pipeline_audio_diffusion.py:135-185): "none" = pure
        generation; "batched" = per-sample input slices, deterministic
        posterior-MODE latent encode (the serving contract — a row's result
        must not depend on batch composition); "single" = ONE clip broadcast
        across the batch with posterior SAMPLING under vae_key (the
        reference's semantics, pipeline:143-151)."""
        cache_key = ("fused", steps, eta, batch_size, has_encoding, gen_noise,
                     derive_step_key, pcm16, start_step, mask_start, mask_end,
                     input_mode)
        if cache_key in self._compiled:
            return self._compiled[cache_key]

        has_input = input_mode != "none"
        denoise = self._denoise_fn(steps, start_step, eta, mask_start, mask_end,
                                   has_input, has_encoding)
        h, w = self.sample_hw
        in_ch = self.unet.config.in_channels
        mel, vqvae, is_latent = self.mel, self.vqvae, self.is_latent
        scheduler = self.scheduler
        t0 = int(scheduler.schedule(steps).timesteps[start_step - 1]) if start_step > 0 else None
        length = (mel.x_res - 1) * mel.hop_length
        out_sharding = None
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            out_sharding = batch_sharding(self.mesh, 4)

        # gl_mats rides as a program ARGUMENT (not a trace-time closure): the
        # four windowed-DFT matrices are ~33 MB f32 at n_fft=2048 and baking
        # them as HLO constants bloats every cached fused program and risks
        # the remote-compile upload limit (CLAUDE.md "HTTP 413"; ADVICE r4).
        def run(unet_params, vae_params, noise, slices, enc, key, step_key, gl_mats):
            # Same split order as __call__ — bit-parity with the staged path.
            key, noise_key, vae_key, gl_key = jax.random.split(key, 4)
            if gen_noise:
                noise = jax.random.normal(noise_key, (batch_size, h, w, in_ch),
                                          dtype=jnp.float32)
                if out_sharding is not None:
                    noise = jax.lax.with_sharding_constraint(noise, out_sharding)
            if derive_step_key:
                step_key = key
            images = input_images = noise
            if has_input:
                # Shared prep sub-graph (see _prep_inputs), inlined — the
                # staged path's host round-trips between these stages are
                # pure dispatch overhead. The barriers reproduce the staged
                # path's program boundaries so XLA cannot fuse noise-gen
                # into the prep FMAs or prep into the scan (that fusion is
                # what broke bitwise parity on TPU).
                noise = jax.lax.optimization_barrier(noise)
                images, input_images = jax.lax.optimization_barrier(
                    self._prep_inputs(vae_params, slices, noise, vae_key,
                                      input_mode, t0))
            images = denoise(unet_params, images, input_images, noise, enc, step_key)
            if is_latent:
                images = vqvae.apply({"params": vae_params}, images / LATENT_SCALE,
                                     method=vqvae.decode)
            raw = postprocess_images(images)
            audio = mel._inverse_impl(raw, gl_key, length, gl_mats)
            if pcm16:
                audio = pcm16_quantize(audio)
            return raw, audio

        fn = jax.jit(run)
        self._compiled[cache_key] = fn
        return fn

    # -------------------------------------------------------------- generation
    def __call__(
        self,
        batch_size: int = 1,
        audio_file: str = None,
        raw_audio: np.ndarray = None,
        slice: int = 0,
        start_step: int = 0,
        steps: int = None,
        key: Optional[jax.Array] = None,
        mask_start_secs: float = 0,
        mask_end_secs: float = 0,
        step_key: Optional[jax.Array] = None,
        eta: float = 0,
        noise: Optional[jnp.ndarray] = None,
        encoding: Optional[jnp.ndarray] = None,
        return_dict: bool = True,
        return_images_only: bool = False,
        return_arrays: bool = False,
        pcm16: bool = False,
    ):
        """Generate mel spectrograms (and audio) — reference: pipeline:72-205.

        ``key``/``step_key`` replace torch ``generator``/``step_generator``.
        ``noise``/``encoding`` are NHWC / (B, seq, dim) arrays.
        """
        steps = steps or self.get_default_steps()
        if start_step >= steps:
            # The reference dies with a bare IndexError here: its notebook
            # value start_step=500 assumes the 1000-step DDPM schedule and
            # silently overruns a 50-step DDIM one
            # (pipeline_audio_diffusion.py:149-150). Validated for EVERY call
            # shape — without input audio an out-of-range start_step would
            # otherwise silently slice an empty inference schedule and return
            # un-denoised noise.
            raise ValueError(
                f"start_step ({start_step}) must be < steps ({steps}); "
                "start_step indexes the inference schedule, so a DDPM-era "
                "value like 500 must be rescaled for a 50-step DDIM run "
                "(e.g. steps // 2 for a half-strength variation).")
        key = key if key is not None else jax.random.key(0)

        h, w = self.sample_hw
        in_ch = self.unet.config.in_channels

        # Fused fast path — pure generation AND audio-to-audio (start_step
        # re-noise + mask overwrite; the reference's staged hot loop,
        # pipeline_audio_diffusion.py:135-185) run as ONE device program per
        # batch: see _fused_generate_fn. Same math/keys as the staged path.
        if self.fuse and not return_images_only:
            gen_noise = noise is None
            if gen_noise:
                eff_batch = batch_size
                noise_arg = jnp.zeros((), jnp.float32)  # placeholder, unused
            else:
                noise_arg = jnp.asarray(noise, dtype=jnp.float32)
                if noise_arg.shape[-1] != in_ch and noise_arg.shape[1] == in_ch:
                    noise_arg = jnp.transpose(noise_arg, (0, 2, 3, 1))  # NCHW compat
                if self.mesh is not None:
                    from ..parallel.mesh import batch_sharding

                    noise_arg = jax.device_put(
                        noise_arg, batch_sharding(self.mesh, noise_arg.ndim))
                eff_batch = noise_arg.shape[0]
            enc = self._validate_encoding(encoding, eff_batch)
            self._validate_step_key(step_key, eff_batch)
            input_mode, slices_arg = "none", jnp.zeros((), jnp.float32)
            mask_start = mask_end = 0
            if audio_file is not None or raw_audio is not None:
                slices_np, batched_input = self._input_slices(audio_file, raw_audio, slice)
                if batched_input and slices_np.shape[0] != eff_batch:
                    raise ValueError(
                        f"raw_audio batch ({slices_np.shape[0]}) must equal the "
                        f"generation batch ({eff_batch}); pass matching "
                        "noise= or batch_size=.")
                input_mode = "batched" if batched_input else "single"
                slices_arg = jnp.asarray(slices_np)
                if self.mesh is not None and batched_input:
                    from ..parallel.mesh import batch_sharding

                    slices_arg = jax.device_put(
                        slices_arg, batch_sharding(self.mesh, 2))
                # Mask pixels in model-sample space (reference: pipeline:152-156).
                pixels_per_second = (w * self.mel.get_sample_rate()
                                     / self.mel.x_res / self.mel.hop_length)
                mask_start = int(mask_start_secs * pixels_per_second)
                mask_end = int(mask_end_secs * pixels_per_second)
            fn = self._fused_generate_fn(steps, float(eta), eff_batch,
                                         enc is not None, gen_noise,
                                         step_key is None, pcm16,
                                         start_step, mask_start, mask_end,
                                         input_mode)
            raw_dev, audios_dev = fn(
                self.unet_params, self.vqvae_params, noise_arg, slices_arg,
                enc, key, step_key if step_key is not None else key,
                self.mel.gl_matrices())
            if return_arrays:
                return raw_dev, audios_dev
            raw = np.asarray(raw_dev)
            pil_images = [Image.fromarray(img) for img in raw]
            audios = [a for a in np.asarray(audios_dev)]
            if not return_dict:
                return pil_images, (self.mel.get_sample_rate(), audios)
            return PipelineOutput(pil_images, self.mel.get_sample_rate(), audios, raw)

        key, noise_key, vae_key, gl_key = jax.random.split(key, 4)
        self._validate_step_key(step_key, batch_size if noise is None else
                                noise.shape[0])
        step_key = step_key if step_key is not None else key
        if noise is None:
            # One fused jitted program (noise gen is otherwise a separate
            # dispatch + device sync on the hot path). Under a mesh the batch
            # axis shards along 'data' and propagates through every stage.
            if "noise" not in self._compiled:
                out_sh = None
                if self.mesh is not None:
                    from ..parallel.mesh import batch_sharding

                    out_sh = batch_sharding(self.mesh, 4)
                self._compiled["noise"] = jax.jit(
                    lambda k, s: jax.random.normal(k, s, dtype=jnp.float32),
                    static_argnums=(1,),
                    out_shardings=out_sh,
                )
            noise = self._compiled["noise"](noise_key, (batch_size, h, w, in_ch))
        else:
            noise = jnp.asarray(noise, dtype=jnp.float32)
            if noise.shape[-1] != in_ch and noise.shape[1] == in_ch:
                noise = jnp.transpose(noise, (0, 2, 3, 1))  # accept NCHW for compat
            if self.mesh is not None:
                # Commit user-supplied noise to the batch sharding so the whole
                # program partitions along 'data' (uncommitted inputs would make
                # XLA pick a layout instead of the serving-optimal one).
                from ..parallel.mesh import batch_sharding

                noise = jax.device_put(noise, batch_sharding(self.mesh, noise.ndim))
        images = noise

        has_input = audio_file is not None or raw_audio is not None
        input_images = jnp.zeros_like(noise)
        mask_start = mask_end = 0
        batched_input = False
        if has_input:
            slices_np, batched_input = self._input_slices(audio_file, raw_audio, slice)
            if batched_input and slices_np.shape[0] != noise.shape[0]:
                raise ValueError(
                    f"raw_audio batch ({slices_np.shape[0]}) must equal the "
                    f"generation batch ({noise.shape[0]}); pass matching "
                    "noise= or batch_size=."
                )
            # ONE jitted prep program (mel forward + conversion + [VAE
            # encode] + broadcast + [re-noise]) — the same sub-graph the
            # fused path inlines (see _prep_inputs for why sharing the
            # trace is what keeps fused-vs-staged parity bitwise).
            t0 = (int(self.scheduler.schedule(steps).timesteps[start_step - 1])
                  if start_step > 0 else None)
            input_mode = "batched" if batched_input else "single"
            images, input_images = self._prep_fn(input_mode, t0)(
                self.vqvae_params, jnp.asarray(slices_np), noise, vae_key)

            # pixels_per_second in model-sample space (reference: pipeline:152-156).
            pixels_per_second = w * self.mel.get_sample_rate() / self.mel.x_res / self.mel.hop_length
            mask_start = int(mask_start_secs * pixels_per_second)
            mask_end = int(mask_end_secs * pixels_per_second)

        fn = self._denoise_fn(steps, start_step, float(eta), mask_start, mask_end, has_input, encoding is not None)
        enc = self._validate_encoding(encoding, images.shape[0])
        images = fn(self.unet_params, images, input_images, noise, enc, step_key)

        if self.is_latent:
            # ONE jitted program (params as an argument, not baked constants):
            # the eager path cost ~12 s/batch in per-op dispatch latency on
            # the remote backend vs ~0.1 s compiled.
            if "vae_decode" not in self._compiled:
                self._compiled["vae_decode"] = jax.jit(
                    lambda p, z: self.vqvae.apply(
                        {"params": p}, z / LATENT_SCALE, method=self.vqvae.decode
                    )
                )
            images = self._compiled["vae_decode"](self.vqvae_params, images)

        # [-1,1] -> uint8 on device: Griffin-Lim consumes it without a host
        # round-trip (see postprocess_images for the exact reference math).
        if "postprocess" not in self._compiled:
            self._compiled["postprocess"] = jax.jit(postprocess_images)
        raw_dev = self._compiled["postprocess"](images)

        if return_images_only:
            return np.asarray(raw_dev)

        audios_dev = self.mel.images_to_audio(raw_dev, key=gl_key)
        if pcm16:
            # Peak-normalize + quantize to 16-bit PCM ON DEVICE (exactly what
            # the apps deliver, apps.wav_bytes): halves the device-to-host
            # payload, which dominates serving latency on bandwidth-limited
            # links.
            if "pcm16" not in self._compiled:
                self._compiled["pcm16"] = jax.jit(pcm16_quantize)
            audios_dev = self._compiled["pcm16"](audios_dev)
        if return_arrays:
            # Device arrays, no host sync: lets a serving loop overlap the
            # next batch's compute with this batch's device-to-host transfer.
            return raw_dev, audios_dev
        raw = np.asarray(raw_dev)
        pil_images = [Image.fromarray(img) for img in raw]
        audios = [a for a in np.asarray(audios_dev)]

        if not return_dict:
            return pil_images, (self.mel.get_sample_rate(), audios)
        return PipelineOutput(pil_images, self.mel.get_sample_rate(), audios, raw)

    # --------------------------------------------------------------- inversion
    def encode(self, images: List[Image.Image], steps: int = 50) -> jnp.ndarray:
        """Deterministic DDIM inversion: image -> noise (reference: pipeline:207-242).
        Feeding the result back as ``noise=`` reproduces the image.

        For a latent pipeline the image is first VAE-encoded (posterior MODE,
        not a sample — inversion must be deterministic) and the inversion runs
        in latent space, so the returned noise has the UNet's latent shape.
        This unlocks the reference's latent-slerp workflow
        (test_model.ipynb cells 39-47) as ``slerp(encode(a), encode(b), α)``
        fed back through ``noise=``. The reference's own ``encode`` runs the
        UNet directly on pixel images even when a VAE is present — silently
        shape-wrong for latent models (pipeline:207-242); fixed here."""
        assert isinstance(self.scheduler, DDIMScheduler), "encode requires DDIM (deterministic)"
        schedule = self.scheduler.schedule(steps)
        arr = np.stack(
            [np.frombuffer(im.tobytes(), dtype="uint8").reshape((im.height, im.width)) for im in images]
        )
        sample = (jnp.asarray(arr, dtype=jnp.float32) / 255.0) * 2.0 - 1.0
        sample = sample[..., None]  # NHWC

        if self.is_latent:
            sample = self._vae_encode_mode(sample)

        cache_key = ("encode", steps)
        if cache_key not in self._compiled:
            timesteps = jnp.asarray(schedule.timesteps[::-1].copy(), dtype=jnp.int32)
            unet, scheduler = self.unet, self.scheduler

            def run(params, x):
                def body(x, t):
                    model_output = unet.apply({"params": params}, x, jnp.broadcast_to(t, (x.shape[0],)), None)
                    return scheduler.invert_step(model_output, t, x, schedule), None

                x, _ = jax.lax.scan(body, x, timesteps)
                return x

            self._compiled[cache_key] = jax.jit(run)
        return self._compiled[cache_key](self.unet_params, sample)

    @staticmethod
    def slerp(x0: jnp.ndarray, x1: jnp.ndarray, alpha: float) -> jnp.ndarray:
        """Spherical linear interpolation (reference: pipeline:244-258)."""
        x0, x1 = jnp.asarray(x0), jnp.asarray(x1)
        theta = jnp.arccos(
            jnp.clip(jnp.vdot(x0.ravel(), x1.ravel()) / (jnp.linalg.norm(x0) * jnp.linalg.norm(x1)), -1.0, 1.0)
        )
        sin_theta = jnp.sin(theta)
        return jnp.sin((1 - alpha) * theta) / sin_theta * x0 + jnp.sin(alpha * theta) / sin_theta * x1

    # ------------------------------------------------------------- persistence
    @staticmethod
    def _write_atomic(path: str, data: bytes) -> None:
        """tmp + rename so a killed process never leaves a truncated params
        file behind (same contract as the training checkpoints; a 0-byte
        params.msgpack from an interrupted save is unrecoverable)."""
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def save_pretrained(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        index = {
            "_class_name": "AudioDiffusionPipeline",
            "unet": True,
            "scheduler": type(self.scheduler).__name__,
            "mel": True,
            "vqvae": self.vqvae is not None,
        }
        with open(os.path.join(directory, "model_index.json"), "w") as fh:
            json.dump(index, fh, indent=2)

        unet_dir = os.path.join(directory, "unet")
        self.unet.config.save_config(unet_dir)
        self._write_atomic(os.path.join(unet_dir, "params.msgpack"),
                           serialization.to_bytes(self.unet_params))

        save_scheduler(self.scheduler, os.path.join(directory, "scheduler"))
        self.mel.save_pretrained(os.path.join(directory, "mel"))

        if self.vqvae is not None:
            vae_dir = os.path.join(directory, "vqvae")
            self.vqvae.config.save_config(vae_dir)
            self._write_atomic(os.path.join(vae_dir, "params.msgpack"),
                               serialization.to_bytes(self.vqvae_params))

    @staticmethod
    def _read_params(path: str, template):
        """Deserialize a params file with an actionable error for truncation
        (a 0-byte file means a save was interrupted pre-atomic-rename)."""
        with open(path, "rb") as fh:
            data = fh.read()
        if not data:
            raise ValueError(
                f"{path!r} is empty — the save that wrote it was interrupted. "
                "Re-save the pipeline (saves are atomic now) or restore from a "
                "training checkpoint."
            )
        try:
            return serialization.from_bytes(template, data)
        except Exception as e:  # msgpack raises bare ValueError
            raise ValueError(f"{path!r} is corrupt or truncated: {e}") from e

    @classmethod
    def from_pretrained(cls, directory: str, dtype: Optional[str] = None) -> "AudioDiffusionPipeline":
        """Load a pipeline saved by :meth:`save_pretrained`, or by the
        reference (torch diffusers format — converted via
        ``utils.torch_import.pipeline_from_torch_pretrained``). ``directory``
        may also be a Hub model id like ``teticio/audio-diffusion-256``
        (reference: audiodiffusion/__init__.py:24-30 "local directory or
        Hugging Face Hub"): ids resolve through the local HF cache first, then
        the network (``utils.hub.resolve_pretrained``).

        ``dtype`` ("float32" | "bfloat16") overrides the COMPUTE dtype of the
        UNet and VAE for serving — parameters stay in their stored precision
        (f32); only activations/matmuls run in the override. Serving a
        f32-trained pipeline with ``dtype="bfloat16"`` recovers the bf16
        throughput (measured: the f32 VAE decode is ~2x the bf16 one,
        BASELINE.md latent ledger) at bf16-rounding output differences."""
        from ..utils.hub import resolve_pretrained

        directory = resolve_pretrained(directory)
        with open(os.path.join(directory, "model_index.json")) as fh:
            index = json.load(fh)

        unet_dir = os.path.join(directory, "unet")
        if not os.path.exists(os.path.join(unet_dir, "params.msgpack")):
            from ..utils.torch_import import pipeline_from_torch_pretrained

            return pipeline_from_torch_pretrained(directory, dtype=dtype)

        unet_cfg = UNetConfig.from_pretrained(unet_dir)
        if dtype is not None:
            unet_cfg = dataclasses.replace(unet_cfg, dtype=dtype)
        unet = UNet2D(unet_cfg)
        template = unet.init_params(jax.random.key(0))
        unet_params = cls._read_params(os.path.join(unet_dir, "params.msgpack"), template)

        scheduler = load_scheduler(os.path.join(directory, "scheduler"))
        mel = Mel.from_pretrained(os.path.join(directory, "mel"))

        vqvae = vqvae_params = None
        vae_dir = os.path.join(directory, "vqvae")
        if index.get("vqvae") and os.path.isdir(vae_dir):
            from ..models.vae import AutoencoderKL, VAEConfig

            vae_cfg = VAEConfig.from_pretrained(vae_dir)
            if dtype is not None:
                vae_cfg = dataclasses.replace(vae_cfg, dtype=dtype)
            vqvae = AutoencoderKL(vae_cfg)
            vae_template = vqvae.init_params(jax.random.key(0))
            vqvae_params = cls._read_params(os.path.join(vae_dir, "params.msgpack"), vae_template)

        return cls(unet, unet_params, mel, scheduler, vqvae, vqvae_params)
