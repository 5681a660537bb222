"""Data-parallel UNet diffusion training on a TPU mesh.

TPU-native replacement for the reference trainer (reference:
scripts/train_unet.py:41-351), which drives torch + accelerate/DDP. Here the
whole optimization step — microbatch gradient accumulation, global-norm clip,
AdamW with warmup-cosine LR, EMA update — is ONE jitted SPMD program over a
('data', 'model') mesh: batches are sharded along ``data``, the mean-loss
gradient contraction compiles to an ICI all-reduce, and parameters are
replicated (plain DP) or FSDP-sharded along ``data`` (the ZeRO analog of the
reference's DeepSpeed stage-2 config, config/accelerate_deepspeed.yaml:2-8).
Sharding is established by placing the train state once with
:func:`shard_train_state`; ``jax.jit`` then propagates it through the step.

Hyperparameter defaults mirror the reference exactly: AdamW(0.95, 0.999,
wd=1e-6, eps=1e-8) (train_unet.py:166-172,377-380), cosine LR with 500 warmup
steps (174-179), EMA(inv_gamma=1, power=0.75, max=0.9999) (185-190), grad-clip
1.0 (261-262), MSE epsilon-prediction loss (258), per-example uniform
timesteps (241-246), latent scaling 0.18215 (234-235).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ema import EMA
from ..parallel.mesh import DATA_AXIS, fsdp_sharding_for, replicated
from ..pipelines.pipeline import LATENT_SCALE


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    lr_schedule: str = "cosine"  # cosine | linear | constant (reference --lr_scheduler)
    lr_warmup_steps: int = 500
    total_steps: int = 100_000
    adam_beta1: float = 0.95
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-6
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    use_ema: bool = True
    ema_inv_gamma: float = 1.0
    ema_power: float = 0.75
    ema_max_decay: float = 0.9999
    param_sharding: str = "replicated"  # "replicated" (DP) or "fsdp" (ZeRO-like)
    prediction_type: str = "epsilon"  # "epsilon" (reference default) | "v_prediction"


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any  # params-shaped tree, or None when use_ema=False


def make_lr_schedule(cfg: TrainConfig):
    decay_steps = max(cfg.total_steps, cfg.lr_warmup_steps + 1)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps, decay_steps, end_value=0.0
        )
    if cfg.lr_schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps),
             optax.linear_schedule(cfg.learning_rate, 0.0, decay_steps - cfg.lr_warmup_steps)],
            [cfg.lr_warmup_steps],
        )
    if cfg.lr_schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps),
             optax.constant_schedule(cfg.learning_rate)],
            [cfg.lr_warmup_steps],
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            make_lr_schedule(cfg),
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        ),
    )


def init_train_state(cfg: TrainConfig, params) -> TrainState:
    optimizer = make_optimizer(cfg)

    # One jitted program instead of hundreds of eager per-leaf ops: eager
    # dispatch pays a separate (remote) compile per op+shape on TPU, which
    # turns state init into a minutes-long compile storm for big models.
    @jax.jit
    def _init(p):
        opt_state = optimizer.init(p)
        # EMA starts as a copy of params; jit outputs never alias inputs, so
        # the donated train step can safely consume both trees.
        ema_params = jax.tree_util.tree_map(lambda x: x + 0, p) if cfg.use_ema else None
        return TrainState(step=jnp.zeros((), jnp.int32), params=p, opt_state=opt_state, ema_params=ema_params)

    return _init(params)


def _leaf_sharding(leaf, mesh: Mesh, mode: str) -> NamedSharding:
    if mode == "fsdp" and hasattr(leaf, "shape") and np.ndim(leaf) > 0:
        return fsdp_sharding_for(np.shape(leaf), mesh)
    return replicated(mesh)


def shard_train_state(state: TrainState, mesh: Mesh, cfg: TrainConfig) -> TrainState:
    """Place the state on the mesh: replicated (DP) or FSDP parameter/optimizer
    sharding along ``data``. jit propagates these shardings through the step."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, _leaf_sharding(x, mesh, cfg.param_sharding)), state
    )


def batch_shardings(mesh: Mesh):
    """(accum, micro, H, W, C) images / (accum, micro, seq, dim) encodings:
    the microbatch axis shards along ``data``; accumulation stays sequential."""
    img = NamedSharding(mesh, P(None, DATA_AXIS, None, None, None))
    enc = NamedSharding(mesh, P(None, DATA_AXIS, None, None))
    return img, enc


def precompute_latent_moments(vqvae, vqvae_params, dataset, chunk: int = 16):
    """Encode the whole dataset ONCE; returns ((N, h, w, 2C) moments as
    mean ‖ logvar, audio_files).

    Latent training then samples the posterior per step from the cached
    moments (``make_train_step(cached_latents=True)``) — numerically
    equivalent to re-running the encoder every microbatch (same
    DiagonalGaussian formula and RNG key; the moments come from a separately
    jitted program at a different batch shape, so compile-level reduction
    rounding may differ at float-epsilon scale), trading a one-time
    O(dataset) encode for per-step encoder FLOPs. The reference re-encodes
    every step (train_unet.py:232-235).
    """
    from ..data.dataset import normalize_image

    # Params are a jit ARGUMENT, not a closure: closed-over numpy trees get
    # baked into the HLO as constants and the remote-compile upload fails
    # with HTTP 413 for big VAEs (CLAUDE.md).
    @jax.jit
    def enc(params, imgs):
        p = vqvae.apply({"params": params}, imgs, method=vqvae.encode)
        return jnp.concatenate([p.mean, p.logvar], axis=-1)

    moments, files, buf = [], [], []

    def flush():
        pad = chunk - len(buf)  # pad to one static shape (one compile)
        arr = np.stack(buf + [buf[-1]] * pad)[..., None]
        moments.append(np.asarray(enc(vqvae_params, jnp.asarray(arr)))[: len(buf)])
        buf.clear()

    for i in range(len(dataset)):
        item = dataset.get(i)
        files.append(item["audio_file"])
        buf.append(normalize_image(item["image"]))
        if len(buf) == chunk:
            flush()
    if buf:
        flush()
    return np.concatenate(moments), files


def make_train_step(
    cfg: TrainConfig,
    unet,
    scheduler,
    vqvae=None,
    vqvae_params=None,
    conditional: bool = False,
    cached_latents: bool = False,
) -> Callable:
    """Build the jitted SPMD train step.

    Signature: ``new_state, metrics = step(state, images, encodings, key)``
    with ``images`` of shape (accum, micro_batch, H, W, C) and ``encodings``
    (accum, micro_batch, seq, dim) or None. ``state.step`` counts true
    optimizer steps (the reference's EMA counter advances per microbatch —
    train_unet.py:266 — a quirk we deliberately fix; SURVEY.md §3.3).

    With ``cached_latents`` the ``images`` slot carries precomputed VAE
    posterior moments (..., 2*latent_channels: mean ‖ logvar) and the step
    samples the posterior directly — numerically equivalent to running the
    encoder (same DiagonalGaussian formula, same key; compile-level rounding
    of the cached moments may differ at float-epsilon scale), without the
    encoder FLOPs on every microbatch.
    """
    optimizer = make_optimizer(cfg)
    ema = EMA(cfg.ema_inv_gamma, cfg.ema_power, cfg.ema_max_decay)
    num_train_timesteps = scheduler.config.num_train_timesteps

    def loss_fn(params, images, encodings, key):
        t_key, n_key, v_key = jax.random.split(key, 3)
        clean = images
        if cached_latents:
            from ..models.vae import DiagonalGaussian

            mean, logvar = jnp.split(images, 2, axis=-1)
            latents = DiagonalGaussian(mean, logvar).sample(v_key)
            clean = jax.lax.stop_gradient(LATENT_SCALE * latents)
        elif vqvae is not None:
            latents = vqvae.apply({"params": vqvae_params}, images, method=vqvae.encode).sample(v_key)
            clean = jax.lax.stop_gradient(LATENT_SCALE * latents)
        noise = jax.random.normal(n_key, clean.shape, dtype=clean.dtype)
        timesteps = jax.random.randint(t_key, (clean.shape[0],), 0, num_train_timesteps)
        noisy = scheduler.add_noise(clean, noise, timesteps)
        pred = unet.apply({"params": params}, noisy, timesteps, encodings if conditional else None)
        if cfg.prediction_type == "v_prediction":
            target = scheduler.velocity(clean, noise, timesteps)
        else:
            target = noise
        return jnp.mean((pred - target) ** 2)

    def train_step(state: TrainState, images, encodings, key):
        accum = images.shape[0]
        keys = jax.random.split(key, accum)
        if encodings is None:
            encodings = jnp.zeros((accum, images.shape[1], 1, 1), dtype=images.dtype)

        def micro(acc, inp):
            img, enc, k = inp
            loss, grads = jax.value_and_grad(loss_fn)(state.params, img, enc if conditional else None, k)
            acc_loss, acc_grads = acc
            return (acc_loss + loss, jax.tree_util.tree_map(jnp.add, acc_grads, grads)), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (loss_sum, grad_sum), _ = jax.lax.scan(micro, (jnp.float32(0.0), zero_grads), (images, encodings, keys))
        loss = loss_sum / accum
        grads = jax.tree_util.tree_map(lambda g: g / accum, grad_sum)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema_params = state.ema_params
        ema_decay = jnp.float32(0.0)
        if cfg.use_ema:
            ema_params = ema.update(state.ema_params, params, step)
            ema_decay = ema.decay(step)
        new_state = TrainState(step=step, params=params, opt_state=opt_state, ema_params=ema_params)
        metrics = {"loss": loss, "ema_decay": ema_decay, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
