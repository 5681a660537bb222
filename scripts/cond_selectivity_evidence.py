#!/usr/bin/env python
"""Conditional-latent selectivity evidence at 256x256 (VERDICT r2 weak #3).

Builds a 4-class synthetic corpus with well-separated spectra, assigns ONE
fixed encoding per class (random-init AudioEncoder embedding of a class
exemplar — the reference's pretrained Deej-AI encoder is unfetchable here,
reference: README.md:209-218), trains the reference's real conditional-latent
recipe (KL-VAE to 32x32 latents + cross-attention UNet,
scripts/train_unet.py:140-159), then measures whether generation conditioned
on class k lands nearer class k's spectrograms than the other classes'
(own-class vs other-class nearest-neighbor MAE) and writes a sample grid.

One command, pinned seeds, ~45 min on one v5e:
    python scripts/cond_selectivity_evidence.py --work /root/scratch/cond_ev
Results: JSON line + grid PNG under --work; numbers belong in BASELINE.md.

The class synthesis below deliberately does NOT share code with
scripts/make_audio.py (which has similar generators): the published
selectivity numbers are a pinned-seed contract of THIS file, and must not
drift when the general-purpose corpus generator changes.
"""

import argparse
import json
import os
import pickle
import sys
import wave

sys.path.insert(0, ".")

from audio_diffusion_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

SR = 22050
SLICE = 256 * 512 - 1
CLASSES = ["low_arp", "high_arp", "perc_noise", "tone_chord"]


def synth_class(cls: str, rng: np.random.Generator, n: int) -> np.ndarray:
    t = np.arange(n) / SR
    audio = np.zeros(n, np.float64)
    if cls in ("low_arp", "high_arp"):
        lo = 110.0 if cls == "low_arp" else 1760.0
        freqs = lo * 2 ** (np.array([0, 3, 5, 7, 10]) / 12.0)
        note = int(0.18 * SR)
        for k in range(n // note):
            f = freqs[rng.integers(len(freqs))]
            s, e = k * note, min(n, k * note + int(0.5 * SR))
            tt = np.arange(e - s) / SR
            env = np.exp(-tt * rng.uniform(3, 8))
            for h, a in ((1, 1.0), (2, 0.5), (3, 0.25)):
                audio[s:e] += a * env * np.sin(2 * np.pi * f * h * tt + rng.uniform(0, 6.28))
    elif cls == "perc_noise":
        hit = int(0.06 * SR)
        for s in range(0, n - hit, int(0.22 * SR)):
            burst = rng.normal(0, 1, hit) * np.exp(-np.arange(hit) / (0.012 * SR))
            audio[s:s + hit] += burst
    else:  # tone_chord: sustained pure chords, slow changes
        seg = int(1.2 * SR)
        for s in range(0, n, seg):
            e = min(n, s + seg)
            tt = np.arange(e - s) / SR
            root = 440.0 * 2 ** (rng.integers(-3, 4) / 12.0)
            for ratio in (1.0, 1.26, 1.5):
                audio[s:e] += 0.5 * np.sin(2 * np.pi * root * ratio * tt + rng.uniform(0, 6.28))
    audio /= np.abs(audio).max() + 1e-9
    return audio.astype(np.float64)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", type=str, default="/root/scratch/cond_ev")
    p.add_argument("--files_per_class", type=int, default=6)
    p.add_argument("--vae_steps", type=int, default=1200)
    p.add_argument("--unet_steps", type=int, default=6000)
    # Conditioning gradients come almost entirely from high-noise timesteps
    # (class identity is readable from x_t elsewhere — see
    # tests/test_conditioning.py docstring), so selectivity needs more steps
    # than loss convergence suggests; 6000 cached-latent steps is ~3 min.
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    work = a.work
    audio_dir = os.path.join(work, "audio")
    os.makedirs(audio_dir, exist_ok=True)
    rng = np.random.default_rng(a.seed)

    print("== [1/6] 4-class corpus ==", flush=True)
    files_by_class = {c: [] for c in CLASSES}
    for c in CLASSES:
        for i in range(a.files_per_class):
            path = os.path.join(audio_dir, f"{c}_{i:02d}.wav")
            pcm = (synth_class(c, rng, SLICE + 1024) * 32000).astype(np.int16)
            with wave.open(path, "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(SR)
                w.writeframes(pcm.tobytes())
            files_by_class[c].append(path)

    print("== [2/6] 256x256 dataset ==", flush=True)
    from audio_diffusion_tpu.data.prepare import audio_to_images

    ds_dir = os.path.join(work, "ds")
    audio_to_images(audio_dir, ds_dir, resolution=(256, 256), hop_length=512)

    print("== [3/6] per-class encodings (random-init AudioEncoder on one exemplar) ==", flush=True)
    import jax

    from audio_diffusion_tpu.models.audio_encoder import AudioEncoder

    enc_model = AudioEncoder()
    enc_vars = enc_model.init_variables(jax.random.key(a.seed))
    class_enc = {c: np.asarray(enc_model.encode(enc_vars, [files_by_class[c][0]]))[0]
                 for c in CLASSES}
    encodings = {f: class_enc[c] for c in CLASSES for f in files_by_class[c]}
    enc_path = os.path.join(work, "encodings.p")
    with open(enc_path, "wb") as fh:
        pickle.dump(encodings, fh)

    print("== [4/6] KL-VAE on the class corpus ==", flush=True)
    from scripts.train_vae import main as vae_main

    vae_dir = os.path.join(work, "vae")
    if not os.path.exists(os.path.join(vae_dir, "params.msgpack")):
        vae_main(["-d", ds_dir, "-b", "2", "--max_steps", str(a.vae_steps),
                  "--disc_start", str(a.vae_steps * 2), "--hf_checkpoint_dir", vae_dir,
                  "--seed", str(a.seed)])

    print("== [5/6] conditional-latent UNet ==", flush=True)
    from scripts.train_unet import main as unet_main

    model_dir = os.path.join(work, "model")
    unet_main(["--dataset", ds_dir, "--vae", vae_dir, "--encodings", enc_path,
               "--output_dir", model_dir, "--train_batch_size", "16",
               "--scheduler", "ddim", "--mixed_precision", "bf16",
               "--max_steps", str(a.unet_steps), "--num_epochs", "100000",
               "--lr_warmup_steps", "200", "--save_images_epochs", "1000000",
               "--save_model_epochs", "1000000", "--seed", str(a.seed)])

    print("== [6/6] selectivity eval ==", flush=True)
    from PIL import Image

    from audio_diffusion_tpu.data.dataset import ImageSliceDataset
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline

    pipe = AudioDiffusionPipeline.from_pretrained(model_dir)
    ds = ImageSliceDataset(ds_dir)
    by_class_imgs = {c: [] for c in CLASSES}
    for i in range(len(ds)):
        item = ds.get(i)
        cls = os.path.basename(item["audio_file"]).rsplit("_", 1)[0]
        by_class_imgs[cls].append(item["image"])
    for c in CLASSES:
        by_class_imgs[c] = np.stack(by_class_imgs[c]).astype(np.float32)

    B = 8
    report, grid_rows = {}, []
    for c in CLASSES:
        enc = np.broadcast_to(class_enc[c], (B, 100)).astype(np.float32)[:, None, :]
        raw = pipe(batch_size=B, steps=50, key=jax.random.key(1234), encoding=enc,
                   return_images_only=True).astype(np.float32)
        grid_rows.append(np.concatenate(list(raw[:4].astype(np.uint8)), axis=1))
        nn = {c2: float(np.mean([np.abs(by_class_imgs[c2] - r[None]).mean(axis=(1, 2)).min()
                                 for r in raw]))
              for c2 in CLASSES}
        own = nn[c]
        other = min(v for k2, v in nn.items() if k2 != c)
        report[c] = {"own_nn_mae": round(own, 2),
                     "best_other_nn_mae": round(other, 2),
                     "selective": bool(own < other)}

    grid = np.concatenate(grid_rows, axis=0)
    grid_path = os.path.join(work, "cond_selectivity_grid.png")
    Image.fromarray(grid).save(grid_path)
    n_sel = sum(r["selective"] for r in report.values())
    print(json.dumps({"selective_classes": f"{n_sel}/{len(CLASSES)}",
                      "per_class": report, "grid": grid_path}))


if __name__ == "__main__":
    main()
