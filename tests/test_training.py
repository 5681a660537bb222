"""Training-step gates (SURVEY.md §7 stage 6): SPMD data-parallel step on the
8-device CPU mesh, grad-accum equivalence, EMA, FSDP shardings, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_diffusion_tpu.models import UNet2D, UNetConfig
from audio_diffusion_tpu.parallel import batch_sharding, fsdp_sharding_for, make_mesh, param_shardings, shard_batch
from audio_diffusion_tpu.schedulers import DDPMScheduler, SchedulerConfig
from audio_diffusion_tpu.training import (
    TrainConfig,
    batch_shardings,
    init_train_state,
    make_train_step,
    shard_train_state,
)


def tiny_unet():
    cfg = UNetConfig(
        sample_size=(8, 8),
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
    )
    unet = UNet2D(cfg)
    return unet, unet.init_params(jax.random.key(0))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # all 8 virtual devices on 'data'


def test_mesh_has_8_devices(mesh):
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_train_step_runs_and_loss_decreases(mesh):
    unet, params = tiny_unet()
    cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1, total_steps=100, use_ema=True)
    scheduler = DDPMScheduler()
    state = shard_train_state(init_train_state(cfg, params), mesh, cfg)
    step_fn = make_train_step(cfg, unet, scheduler)

    img_sh, _ = batch_shardings(mesh)
    rng = np.random.default_rng(0)
    fixed = rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32).clip(-1, 1)
    images = jax.device_put(fixed, img_sh)

    losses = []
    for i in range(12):
        state, metrics = step_fn(state, images, None, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 12
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), f"loss did not decrease: {losses}"
    assert 0.0 < float(metrics["ema_decay"]) < 1.0
    assert float(metrics["grad_norm"]) > 0


def test_grad_accum_matches_big_batch(mesh):
    """(accum=2, micro=4) must equal (accum=1, micro=8) exactly: the scanned
    accumulation averages to the same global gradient."""
    unet, params = tiny_unet()
    scheduler = DDPMScheduler()
    rng = np.random.default_rng(1)
    data = rng.standard_normal((8, 8, 8, 1)).astype(np.float32).clip(-1, 1)

    # The scan gives each microbatch its own key, so the reference value is a
    # manual two-microbatch average computed with the same split keys.
    cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1, total_steps=100,
                      use_ema=False, gradient_accumulation_steps=2)
    state = shard_train_state(init_train_state(cfg, params), mesh, cfg)
    step_fn = make_train_step(cfg, unet, scheduler)
    images = data.reshape(2, 4, 8, 8, 1)

    # Manual expectation FIRST: the step donates (and deletes) params buffers.
    keys = jax.random.split(jax.random.key(42), 2)

    def manual_loss(img, key):
        t_key, n_key, _ = jax.random.split(key, 3)
        clean = jnp.asarray(img)
        noise = jax.random.normal(n_key, clean.shape, dtype=clean.dtype)
        t = jax.random.randint(t_key, (clean.shape[0],), 0, 1000)
        noisy = scheduler.add_noise(clean, noise, t)
        pred = unet.apply({"params": params}, noisy, t, None)
        return jnp.mean((pred - noise) ** 2)

    expected = np.mean([float(manual_loss(images[i], keys[i])) for i in range(2)])
    _, metrics = step_fn(state, images, None, jax.random.key(42))
    np.testing.assert_allclose(float(metrics["loss"]), expected, rtol=1e-5)


def test_sharded_state_matches_single_device_math():
    """The SPMD step on an 8-device mesh must produce the same numbers as a
    single-device run (collectives are semantics-preserving)."""
    unet, params = tiny_unet()
    scheduler = DDPMScheduler()
    cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1, total_steps=100, use_ema=False)
    rng = np.random.default_rng(2)
    images = rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32).clip(-1, 1)

    # Host-side copies: the donating step consumes device buffers, and
    # device_put may alias the original single-device buffer as a shard.
    params_np = jax.tree_util.tree_map(np.asarray, params)

    mesh8 = make_mesh()
    state8 = shard_train_state(init_train_state(cfg, params_np), mesh8, cfg)
    img_sh, _ = batch_shardings(mesh8)
    step8 = make_train_step(cfg, unet, scheduler)
    s8, m8 = step8(state8, jax.device_put(images, img_sh), None, jax.random.key(0))

    mesh1 = make_mesh(devices=np.array(jax.devices()[:1]))
    state1 = shard_train_state(init_train_state(cfg, params_np), mesh1, cfg)
    step1 = make_train_step(cfg, unet, scheduler)
    s1, m1 = step1(state1, jnp.asarray(images), None, jax.random.key(0))

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    l8 = jax.tree_util.tree_leaves(s8.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_shardings(mesh):
    unet, params = tiny_unet()
    sh = param_shardings(params, mesh, "fsdp")
    leaves = jax.tree_util.tree_leaves(sh)
    assert len(leaves) == len(jax.tree_util.tree_leaves(params))
    # Large params shard their largest divisible axis along 'data'; small or
    # indivisible ones stay replicated.
    big = fsdp_sharding_for((1024, 512), mesh)
    assert "data" in str(big.spec)
    small = fsdp_sharding_for((4, 4), mesh)
    assert "data" not in str(small.spec)
    odd = fsdp_sharding_for((1023, 513), mesh)  # nothing divisible by 8
    assert "data" not in str(odd.spec)

    cfg = TrainConfig(use_ema=False, param_sharding="fsdp")
    state = shard_train_state(init_train_state(cfg, params), mesh, cfg)
    scheduler = DDPMScheduler()
    step_fn = make_train_step(cfg, unet, scheduler)
    img_sh, _ = batch_shardings(mesh)
    images = jax.device_put(np.zeros((1, 8, 8, 8, 1), np.float32), img_sh)
    new_state, metrics = step_fn(state, images, None, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_conditional_train_step(mesh):
    cfg_u = UNetConfig(
        sample_size=(8, 8),
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
        attention_head_dim=4,
        cross_attention_dim=12,
    )
    unet = UNet2D(cfg_u)
    params = unet.init_params(jax.random.key(0))
    cfg = TrainConfig(use_ema=False)
    state = shard_train_state(init_train_state(cfg, params), mesh, cfg)
    step_fn = make_train_step(cfg, unet, DDPMScheduler(), conditional=True)
    img_sh, enc_sh = batch_shardings(mesh)
    images = jax.device_put(np.zeros((1, 8, 8, 8, 1), np.float32), img_sh)
    encodings = jax.device_put(np.ones((1, 8, 1, 12), np.float32), enc_sh)
    _, metrics = step_fn(state, images, encodings, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path, mesh):
    from audio_diffusion_tpu.training.checkpoint import make_manager, restore_train_state, save_train_state

    unet, params = tiny_unet()
    cfg = TrainConfig(use_ema=True)
    state = init_train_state(cfg, params)
    state = state.replace(step=jnp.int32(7))

    mgr = make_manager(str(tmp_path / "ckpt"))
    save_train_state(mgr, 7, state)

    template = init_train_state(cfg, params)
    restored = restore_train_state(mgr, template)
    assert restored is not None and int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(restored.params), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Empty dir -> None
    mgr2 = make_manager(str(tmp_path / "empty"))
    assert restore_train_state(mgr2, template) is None


def test_latent_training_step(mesh):
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, latent_channels=1,
                        sample_size=16, norm_num_groups=4)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))
    unet, params = tiny_unet()  # 8x8 = latent resolution of 16x16 input
    cfg = TrainConfig(use_ema=False)
    state = shard_train_state(init_train_state(cfg, params), mesh, cfg)
    step_fn = make_train_step(cfg, unet, DDPMScheduler(), vqvae=vae, vqvae_params=vae_params)
    img_sh, _ = batch_shardings(mesh)
    images = jax.device_put(np.zeros((1, 8, 16, 16, 1), np.float32), img_sh)
    _, metrics = step_fn(state, images, None, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_lr_schedule_shape():
    from audio_diffusion_tpu.training import make_lr_schedule

    cfg = TrainConfig(learning_rate=1e-4, lr_warmup_steps=500, total_steps=10_000)
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(500)), 1e-4, rtol=1e-6)
    assert float(sched(10_000)) < 1e-8
    assert float(sched(250)) == pytest.approx(5e-5, rel=1e-3)


def test_v_prediction_training(mesh):
    """v-prediction target wiring: loss differs from epsilon and decreases."""
    unet, params = tiny_unet()
    cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=1, total_steps=50,
                      use_ema=False, prediction_type="v_prediction")
    scheduler = DDPMScheduler()
    state = shard_train_state(init_train_state(cfg, params), mesh, cfg)
    step_fn = make_train_step(cfg, unet, scheduler)
    img_sh, _ = batch_shardings(mesh)
    images = jax.device_put(
        np.random.default_rng(3).standard_normal((1, 8, 8, 8, 1)).astype(np.float32).clip(-1, 1), img_sh
    )
    losses = []
    for i in range(8):
        state, m = step_fn(state, images, None, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_cached_latents_matches_encoder_path(mesh):
    """cache_latents: sampling the posterior from precomputed moments must
    reproduce the re-encode-every-step path — same DiagonalGaussian formula,
    same key — to numerical (compiler-fusion) tolerance, for loss AND the
    updated parameters."""
    from audio_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    from audio_diffusion_tpu.training.train_unet import precompute_latent_moments

    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, latent_channels=1,
                        sample_size=16, norm_num_groups=4)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init_params(jax.random.key(0), sample_hw=(16, 16))
    unet, params = tiny_unet()
    cfg = TrainConfig(use_ema=False)

    rng = np.random.default_rng(3)
    images = rng.uniform(-1, 1, (1, 8, 16, 16, 1)).astype(np.float32)

    step_enc = make_train_step(cfg, unet, DDPMScheduler(), vqvae=vae, vqvae_params=vae_params)
    state = init_train_state(cfg, params)
    state_a, m_a = step_enc(state, jnp.asarray(images), None, jax.random.key(7))

    # Precompute moments through the public helper (pads the last chunk).
    class _ArrayDataset:
        def __len__(self):
            return images.shape[1]

        def get(self, i):
            img = ((images[0, i, :, :, 0] + 1.0) / 2.0 * 255.0).astype(np.float32)
            return {"image": img, "audio_file": f"f{i}.wav", "slice": 0}

    moments, files = precompute_latent_moments(vae, vae_params, _ArrayDataset(), chunk=5)
    assert moments.shape == (8, 8, 8, 2) and files[3] == "f3.wav"

    step_cached = make_train_step(cfg, unet, DDPMScheduler(), vqvae=vae, vqvae_params=vae_params,
                                  cached_latents=True)
    state = init_train_state(cfg, params)
    state_b, m_b = step_cached(state, jnp.asarray(moments[None]), None, jax.random.key(7))

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
