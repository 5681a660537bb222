"""End-to-end UNet training loop: data, SPMD steps, logging, eval, checkpoints.

Drives :mod:`.train_unet` the way the reference's script drives accelerate
(reference: scripts/train_unet.py:41-351): epoch loop, tensorboard scalars
{loss, lr, step, ema_decay} per step (train_unet.py:272-280), sample
generation with a fixed seed every ``save_images_epochs`` (313-348), pipeline
``save_pretrained`` every ``save_model_epochs`` (302-311), plus atomic orbax
train-state checkpoints for preemption-safe resume (replacing the reference's
optimizer-replay fast-forward, train_unet.py:216-224).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from ..data.dataset import ImageSliceDataset, epoch_batches, epoch_rng, load_encodings, prefetch
from ..mel import Mel
from ..models.unet2d import UNet2D, conditional_config, unconditional_config
from ..parallel.mesh import is_main_process, make_mesh, replicated
from ..pipelines.pipeline import AudioDiffusionPipeline
from ..schedulers import DDIMScheduler, DDPMScheduler, SchedulerConfig
from .checkpoint import make_manager, restore_train_state, save_train_state
from .train_unet import (
    TrainConfig,
    batch_shardings,
    init_train_state,
    make_lr_schedule,
    make_train_step,
    precompute_latent_moments,
    shard_train_state,
)

logger = logging.getLogger("audio_diffusion_tpu.training")


def gather_to_host(tree):
    """Materialize a (possibly sharded, possibly multi-host) pytree on every
    host as numpy. Single-process: plain device_get. Multi-process: a
    process_allgather collective that all hosts must enter together."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.process_allgather(x, tiled=True) if hasattr(x, "sharding") else x,
        tree,
    )


@dataclasses.dataclass
class RunConfig:
    dataset: str
    output_dir: str = "ddpm-model"
    num_epochs: int = 100
    train_batch_size: int = 16  # microbatch (per accumulation sub-step); the
    # effective batch per optimizer step is train_batch_size *
    # gradient_accumulation_steps, matching the reference's dataloader
    # batch_size under accelerator.accumulate (train_unet.py:91,252)
    eval_batch_size: int = 16
    save_images_epochs: int = 10
    save_model_epochs: int = 10
    scheduler: str = "ddpm"
    num_train_steps: int = 1000
    hop_length: int = 512
    sample_rate: int = 22050
    n_fft: int = 2048
    from_pretrained: Optional[str] = None
    vae: Optional[str] = None
    encodings: Optional[str] = None
    cache_latents: bool = True  # latent training: encode the dataset once and
    # sample posteriors from cached moments per step (bit-identical math,
    # no per-microbatch encoder cost); off re-encodes like the reference
    mixed_precision: str = "no"  # "no" | "bf16"
    mesh_data: Optional[int] = None
    seed: int = 0
    log_every: int = 10
    max_steps: Optional[int] = None  # early stop (smoke tests)
    # Hub publishing (reference flags: train_unet.py:385-388). The repo is
    # created at startup (fail-fast) and the saved pipeline is uploaded on
    # every save_model_epochs, like the reference's Repository.push_to_hub.
    push_to_hub: bool = False
    hub_model_id: Optional[str] = None
    hub_token: Optional[str] = None
    hub_private_repo: bool = False


def run_training(run: RunConfig, train: TrainConfig) -> dict:
    hub_repo = None
    if run.push_to_hub:
        # Create the repo BEFORE any expensive work so a bad token / no
        # network fails in seconds (reference: train_unet.py:192-197 clones
        # the repo before the training loop for the same reason). Only rank 0
        # talks to the Hub, but on a pod the OUTCOME must reach every process
        # through a collective — otherwise a bad token kills rank 0 while the
        # other ranks proceed and hang at the first cross-host collective
        # (same reasoning as the should_sample gate below).
        from ..utils.hub import ensure_repo

        hub_err = None
        if is_main_process():
            try:
                hub_repo = ensure_repo(run.hub_model_id, run.output_dir,
                                       token=run.hub_token, private=run.hub_private_repo)
                logger.info("will push saved pipelines to hub repo %s", hub_repo)
            except Exception as e:  # re-raised below, after the broadcast
                hub_err = e
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            ok = multihost_utils.broadcast_one_to_all(np.int32(0 if hub_err is not None else 1))
            if not int(ok) and hub_err is None:
                raise RuntimeError(
                    "push_to_hub repo creation failed on process 0 — aborting this process too"
                )
        if hub_err is not None:
            raise hub_err

    dataset = ImageSliceDataset(run.dataset)
    resolution = dataset.resolution  # (H, W) from the data (reference: train_unet.py:70-71)

    encodings = load_encodings(run.encodings) if run.encodings else None
    conditional = encodings is not None

    num_data = run.mesh_data
    if num_data is None:
        # Auto-fit: the microbatch axis shards along 'data', so the data-axis
        # size must divide train_batch_size. Use the largest such device count.
        n_dev = len(jax.devices())
        num_data = np.gcd(n_dev, run.train_batch_size)
        if num_data < n_dev:
            logger.warning(
                "train_batch_size=%d not divisible by %d devices; using a %d-device data axis",
                run.train_batch_size, n_dev, num_data,
            )
    mesh = make_mesh(num_data=num_data, devices=np.asarray(jax.devices())[: num_data])
    logger.info("mesh: %s over %d devices", dict(mesh.shape), mesh.devices.size)

    vqvae = vqvae_params = None
    if run.vae is not None:
        from ..models.vae import AutoencoderKL, VAEConfig
        from flax import serialization

        from ..utils.hub import resolve_pretrained

        # --vae accepts a Hub id too (reference: train_unet.py:99 hands it to
        # AutoencoderKL.from_pretrained, which resolves ids).
        vae_root = resolve_pretrained(run.vae)
        vae_dir = vae_root if os.path.exists(os.path.join(vae_root, "config.json")) else os.path.join(vae_root, "vqvae")
        has_torch_weights = any(
            os.path.exists(os.path.join(vae_dir, f))
            for f in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin")
        )
        if os.path.exists(os.path.join(vae_dir, "params.msgpack")):
            vae_cfg = VAEConfig.from_pretrained(vae_dir)
            vqvae = AutoencoderKL(vae_cfg)
            template = vqvae.init_params(jax.random.key(0), sample_hw=resolution)
            with open(os.path.join(vae_dir, "params.msgpack"), "rb") as fh:
                vqvae_params = serialization.from_bytes(template, fh.read())
        elif has_torch_weights:
            # Torch diffusers AutoencoderKL dir (reference: train_unet.py:99).
            from ..utils.torch_import import vae_from_torch_dir

            vqvae, vqvae_params = vae_from_torch_dir(vae_dir)
            vae_cfg = vqvae.config
        else:
            # Don't misroute e.g. an interrupted native save (config.json
            # written, params.msgpack missing) into the torch importer.
            raise FileNotFoundError(
                f"--vae directory {vae_dir} has neither params.msgpack (this "
                "framework's save) nor diffusion_pytorch_model.{safetensors,bin} "
                "(torch diffusers). If a native save was interrupted, re-save or "
                "re-train the VAE."
            )
        sample_hw = vae_cfg.latent_hw(*resolution)
        channels = vae_cfg.latent_channels
    else:
        sample_hw = resolution
        channels = 1

    dtype = "bfloat16" if run.mixed_precision == "bf16" else "float32"
    if run.from_pretrained is not None:
        # --mixed_precision bf16 overrides the loaded UNet's compute dtype
        # (params stay f32). Without the flag the SAVED dtype wins — the
        # flag's "no" default must not silently downgrade a bf16-saved
        # pipeline to f32 compute. The VAE is deliberately NOT overridden:
        # during training it only encodes data into latent moments, and those
        # must come out identical whether the VAE arrived via --vae (saved
        # precision, line above) or inside a --from_pretrained pipeline —
        # encode precision is part of the data, not of the training recipe.
        pipe = AudioDiffusionPipeline.from_pretrained(run.from_pretrained)
        unet, params = pipe.unet, pipe.unet_params
        if run.mixed_precision == "bf16" and unet.config.dtype != "bfloat16":
            unet = UNet2D(dataclasses.replace(unet.config, dtype="bfloat16"))
        if pipe.vqvae is not None:
            vqvae, vqvae_params = pipe.vqvae, pipe.vqvae_params
    elif conditional:
        dim = next(iter(encodings.values())).shape[-1]
        cfg = conditional_config(sample_hw, channels, channels, cross_attention_dim=dim, dtype=dtype)
        unet = UNet2D(cfg)
        params = unet.init_params(jax.random.key(run.seed))
    else:
        cfg = unconditional_config(sample_hw, channels, channels, dtype=dtype)
        unet = UNet2D(cfg)
        params = unet.init_params(jax.random.key(run.seed))

    sched_cfg = SchedulerConfig(num_train_timesteps=run.num_train_steps)
    scheduler = DDPMScheduler(sched_cfg) if run.scheduler == "ddpm" else DDIMScheduler(sched_cfg)

    accum = train.gradient_accumulation_steps
    micro = run.train_batch_size
    steps_per_epoch = len(dataset) // (micro * accum)
    total_steps = steps_per_epoch * run.num_epochs
    train = dataclasses.replace(train, total_steps=max(total_steps, train.lr_warmup_steps + 1))
    lr_schedule = make_lr_schedule(train)

    state = init_train_state(train, params)
    ckpt_dir = os.path.join(run.output_dir, "checkpoints")
    manager = make_manager(ckpt_dir)
    restored = restore_train_state(manager, state)
    if restored is not None:
        state = restored
        logger.info("resumed from step %d", int(state.step))

    # A restored checkpoint may already satisfy max_steps (e.g. a retried
    # preempted job re-running its exact command): train zero further steps
    # instead of one extra, which would advance past the recorded stream and
    # overwrite the finished checkpoint. Checked HERE, right after restore —
    # the VAE mesh placement, dataset latent pre-encode, and writer open
    # below are wasted minutes for a no-op run.
    if run.max_steps and int(state.step) >= run.max_steps:
        logger.info("restored step %d already >= max_steps %d; nothing to train",
                    int(state.step), run.max_steps)
        return {"steps": int(state.step), "loss": float("nan"),
                "seconds": 0.0, "output_dir": run.output_dir}

    state = shard_train_state(state, mesh, train)

    vqvae_host_params = None
    if vqvae_params is not None:
        if jax.process_count() > 1:
            # Host copy first: on a pod, rank-0's eval generation runs LOCAL
            # programs, and params committed to the global cross-host mesh
            # must not leak into them (non-addressable devices -> placement
            # error or a multihost launch the other ranks never enter).
            src = vqvae_host_params = jax.device_get(vqvae_params)
        else:
            # Single-process: device_put reshards the tree from_pretrained
            # already committed (or the --vae path's numpy tree) directly —
            # a device_get here would drag the full VAE back through the
            # ~42 MB/s D2H tunnel (CLAUDE.md) for nothing.
            src = vqvae_params
        # Replicate on the mesh BEFORE the step closes over it: jit inlines
        # closed-over numpy trees into the HLO as constants (remote-compile
        # HTTP 413 risk for big VAEs, CLAUDE.md) but captures device arrays
        # as runtime buffers.
        vqvae_params = jax.device_put(src, replicated(mesh))
        del src

    precomputed = None
    if vqvae is not None and run.cache_latents:
        t_enc = time.time()
        precomputed = precompute_latent_moments(vqvae, vqvae_params, dataset)
        logger.info("cached latent moments for %d items in %.1f s (%s)",
                    len(precomputed[1]), time.time() - t_enc, precomputed[0].shape)

    step_fn = make_train_step(train, unet, scheduler, vqvae, vqvae_params, conditional,
                              cached_latents=precomputed is not None)
    img_sh, enc_sh = batch_shardings(mesh)

    writer = None
    if is_main_process():  # rank-0 gating (reference: train_unet.py:199,286)
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(run.output_dir, "logs"))
        except ImportError:
            logger.warning("tensorboardX unavailable; metrics go to stdout only")

    mel = Mel(x_res=resolution[1], y_res=resolution[0], hop_length=run.hop_length,
              sample_rate=run.sample_rate, n_fft=run.n_fft)

    # Eval-time encoding picks use their own stream (epoch shuffles come from
    # per-epoch epoch_rng generators consumed inside the prefetch worker
    # thread; sharing one Generator would make eval selection timing-dependent
    # and race a non-thread-safe Generator).
    eval_rng = np.random.default_rng(run.seed + 0x5EED)
    global_step = int(state.step)
    last_metrics = None
    t_start = time.time()
    t_last_log = None
    steps_last_log = global_step
    # Resume reproduces the straight run's exact data stream: each epoch's
    # shuffle derives from (seed, epoch), and a mid-epoch restore skips the
    # optimizer-step groups already taken in that epoch.
    start_epoch = global_step // max(steps_per_epoch, 1)
    resume_skip = global_step - start_epoch * steps_per_epoch
    done = False

    def place(batch):
        images, enc = batch
        return (jax.device_put(images, img_sh),
                jax.device_put(enc, enc_sh) if enc is not None else None)

    # Single-process: H2D runs on the prefetch thread, overlapping the device
    # step. Multi-process: device_put onto a cross-process mesh coordinates
    # between hosts, so EVERY mesh-visible op (placement, step, gather) must
    # issue from the main thread in the same order on every process —
    # placement from the prefetch thread interleaves differently per host and
    # deadlocks (observed live on the 2-process CPU harness). The prefetch
    # thread still overlaps decode + normalization.
    threaded_place = jax.process_count() == 1

    for epoch in range(start_epoch, run.num_epochs):
        for batch in prefetch(
            epoch_batches(dataset, micro, accum, epoch_rng(run.seed, epoch), encodings,
                          precomputed=precomputed,
                          start_group=resume_skip if epoch == start_epoch else 0),
            transform=place if threaded_place else None,
        ):
            images, enc = batch if threaded_place else place(batch)
            key = jax.random.fold_in(jax.random.key(run.seed), global_step)
            state, metrics = step_fn(state, images, enc, key)
            last_metrics = metrics
            global_step += 1
            if global_step % run.log_every == 0 or global_step == 1:
                logs = {
                    "loss": float(metrics["loss"]),
                    "lr": float(lr_schedule(global_step)),
                    "step": global_step,
                    "ema_decay": float(metrics["ema_decay"]),
                    "grad_norm": float(metrics["grad_norm"]),
                }
                # The float() pulls above force completion of every dispatched
                # step, so wall time between log lines is true steady-state
                # throughput (first window is skipped: it absorbs compiles).
                now = time.time()
                if t_last_log is not None:
                    logs["steps_per_sec"] = round((global_step - steps_last_log) / (now - t_last_log), 3)
                t_last_log, steps_last_log = now, global_step
                logger.info("epoch %d step %d: %s", epoch, global_step, logs)
                if writer:
                    for k, v in logs.items():
                        writer.add_scalar(k, v, global_step)
            if run.max_steps and global_step >= run.max_steps:
                done = True
                break

        should_save = (epoch + 1) % run.save_model_epochs == 0 or epoch == run.num_epochs - 1 or done
        # should_sample must be computed IDENTICALLY on every process: the
        # gather below is a collective all hosts must enter together, and
        # `writer` exists only on the main process — gating the gather on it
        # would deadlock a pod run. Single-process runs without a writer may
        # still skip (samples only go to tensorboard; the gather+generate
        # would be dead work there, and there is no collective to miss).
        should_sample = (epoch + 1) % run.save_images_epochs == 0 and (
            writer is not None or jax.process_count() > 1
        )
        eval_pipe = None
        host_state = None
        if should_save or should_sample:
            # Gather to host on EVERY process: with sharded/global-mesh state,
            # collectives must run on all hosts — rank-0-only device access
            # would deadlock on a pod (the reference's is_main_process gating
            # is only safe because torch DDP keeps full per-process replicas).
            # Sample-only epochs pull just the eval params (~1/4 of the full
            # state: the optimizer moments stay on device) — D2H is the
            # expensive direction for a 113M-param model.
            if should_save:
                host_state = gather_to_host(state)
                eval_params = host_state.ema_params if train.use_ema else host_state.params
            else:
                eval_params = gather_to_host(state.ema_params if train.use_ema else state.params)
            # Only the main process USES the pipeline (save + tensorboard
            # sampling); constructing it re-commits the full UNet tree to
            # device, so skip that H2D on every other rank. Single-process
            # eval reuses the mesh-committed VAE tree (no re-upload); a pod's
            # rank-0 eval takes the host copy so its programs stay local.
            if is_main_process():
                eval_vae = vqvae_params if jax.process_count() == 1 else vqvae_host_params
                eval_pipe = AudioDiffusionPipeline(unet, eval_params, mel, scheduler, vqvae, eval_vae)

        if should_save and is_main_process():
            eval_pipe.save_pretrained(run.output_dir)
            save_train_state(manager, global_step, host_state)
            if hub_repo is not None:
                from ..utils.hub import push_folder

                try:
                    push_folder(run.output_dir, hub_repo, token=run.hub_token,
                                message=f"Epoch {epoch}")  # reference: train_unet.py:306-311
                except Exception as e:
                    # The local save already succeeded — a transient Hub/network
                    # error must not kill a long training run. The next save
                    # epoch retries with the full folder state.
                    logger.warning("hub push to %s failed at epoch %d: %s — "
                                   "continuing (local save is intact)", hub_repo, epoch, e)

        if eval_pipe and writer and should_sample:
            enc_eval = None
            if conditional:
                vals = list(encodings.values())
                pick = eval_rng.choice(len(vals), size=min(run.eval_batch_size, len(vals)), replace=False)
                enc_eval = np.stack([vals[i] for i in pick])[:, None, :]
            # steps=None -> scheduler default (50 DDIM / num_train_steps DDPM),
            # matching the reference's eval (train_unet.py:313-330).
            # Conditional eval: the batch is however many distinct encodings
            # exist (pick is capped at len(encodings) above) — passing the
            # raw eval_batch_size would mismatch the encoding batch when the
            # encodings file has fewer entries.
            eval_bs = len(enc_eval) if enc_eval is not None else run.eval_batch_size
            out = eval_pipe(batch_size=eval_bs, key=jax.random.key(42),
                            encoding=enc_eval)
            writer.add_images("test_samples", out.raw_images[:, None, :, :], epoch)
            from ..ops.audio_io import normalize

            try:
                for i, audio in enumerate(out.audios):
                    writer.add_audio(f"test_audio_{i}", normalize(audio)[None, :], epoch,
                                     sample_rate=out.sample_rate)
            except ImportError:  # tensorboardX add_audio needs soundfile
                logger.warning("soundfile unavailable; skipping tensorboard audio logging")
        if should_save or should_sample:
            # The gather/save/eval above is wall time that is not training —
            # reset the throughput window so the next logged steps_per_sec
            # measures pure training steps (CLAUDE.md measurement discipline).
            t_last_log = None
        if done:
            break

    if writer:
        writer.close()
    return {
        "steps": global_step,
        "loss": float(last_metrics["loss"]) if last_metrics is not None else float("nan"),
        "seconds": time.time() - t_start,
        "output_dir": run.output_dir,
    }
