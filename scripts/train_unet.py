#!/usr/bin/env python
"""Train a (latent/conditional) diffusion UNet on a TPU mesh.

CLI mirroring the reference trainer's flags (reference: scripts/train_unet.py:354-428)
minus accelerate/hub plumbing, plus mesh controls. Examples:

    python scripts/train_unet.py --dataset data/audio-64 --output_dir models/ddpm-64 \
        --train_batch_size 2 --num_epochs 100
    python scripts/train_unet.py --dataset data/audio-256 --vae models/my-vae \
        --gradient_accumulation_steps 8 --train_batch_size 2
"""

import argparse
import logging
import sys

sys.path.insert(0, ".")

from audio_diffusion_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from audio_diffusion_tpu.training.loop import RunConfig, run_training
from audio_diffusion_tpu.training.train_unet import TrainConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", "--dataset_name", dest="dataset", type=str, required=True,
                   help="HF dataset dir (from scripts/audio_to_images.py) or folder of PNGs")
    p.add_argument("--output_dir", type=str, default="ddpm-model-64")
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=16)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--save_images_epochs", type=int, default=10)
    p.add_argument("--save_model_epochs", type=int, default=10)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", type=str, default="cosine", choices=["cosine", "linear", "constant"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--adam_beta1", type=float, default=0.95)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-6)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    def str2bool(v):
        if v.lower() in ("true", "1", "yes", "y"):
            return True
        if v.lower() in ("false", "0", "no", "n"):
            return False
        raise argparse.ArgumentTypeError(f"boolean expected, got {v!r}")

    p.add_argument("--use_ema", type=str2bool, default=True)
    p.add_argument("--ema_inv_gamma", type=float, default=1.0)
    p.add_argument("--ema_power", type=float, default=0.75)
    p.add_argument("--ema_max_decay", type=float, default=0.9999)
    p.add_argument("--hop_length", type=int, default=512)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--n_fft", type=int, default=2048)
    p.add_argument("--from_pretrained", type=str, default=None)
    p.add_argument("--num_train_steps", type=int, default=1000)
    p.add_argument("--scheduler", type=str, default="ddpm", choices=["ddpm", "ddim"])
    p.add_argument("--prediction_type", type=str, default="epsilon", choices=["epsilon", "v_prediction"])
    p.add_argument("--vae", type=str, default=None, help="pretrained VAE dir for latent diffusion")
    p.add_argument("--cache_latents", type=str2bool, default=True,
                   help="latent training: encode the dataset once and sample posteriors "
                        "from cached moments (bit-identical math, no per-step encoder cost)")
    p.add_argument("--encodings", type=str, default=None,
                   help="pickled {audio_file: encoding} for conditional training")
    p.add_argument("--mixed_precision", type=str, default="no", choices=["no", "bf16"])
    p.add_argument("--param_sharding", type=str, default="replicated", choices=["replicated", "fsdp"])
    p.add_argument("--mesh_data", type=int, default=None, help="devices on the data axis (default: all)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    # Hub publishing (reference flags: train_unet.py:385-388).
    p.add_argument("--push_to_hub", type=str2bool, default=False)
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--hub_private_repo", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    import os

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    a = parse_args(argv)
    # SageMaker parity: SM_MODEL_DIR overrides (reference: train_unet.py:42).
    output_dir = os.environ.get("SM_MODEL_DIR") or a.output_dir
    run = RunConfig(
        dataset=a.dataset, output_dir=output_dir, num_epochs=a.num_epochs,
        train_batch_size=a.train_batch_size, eval_batch_size=a.eval_batch_size,
        save_images_epochs=a.save_images_epochs, save_model_epochs=a.save_model_epochs,
        scheduler=a.scheduler, num_train_steps=a.num_train_steps,
        hop_length=a.hop_length, sample_rate=a.sample_rate, n_fft=a.n_fft,
        from_pretrained=a.from_pretrained, vae=a.vae, encodings=a.encodings,
        cache_latents=a.cache_latents,
        mixed_precision=a.mixed_precision, mesh_data=a.mesh_data,
        seed=a.seed, max_steps=a.max_steps,
        push_to_hub=a.push_to_hub, hub_model_id=a.hub_model_id,
        hub_token=a.hub_token, hub_private_repo=a.hub_private_repo,
    )
    train = TrainConfig(
        learning_rate=a.learning_rate, lr_schedule=a.lr_scheduler, lr_warmup_steps=a.lr_warmup_steps,
        adam_beta1=a.adam_beta1, adam_beta2=a.adam_beta2,
        adam_weight_decay=a.adam_weight_decay, adam_epsilon=a.adam_epsilon,
        gradient_accumulation_steps=a.gradient_accumulation_steps,
        use_ema=a.use_ema, ema_inv_gamma=a.ema_inv_gamma, ema_power=a.ema_power,
        prediction_type=a.prediction_type,
        ema_max_decay=a.ema_max_decay, param_sharding=a.param_sharding,
    )
    result = run_training(run, train)
    print(result)
    return result


if __name__ == "__main__":
    main()
