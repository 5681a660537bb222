"""Mel filterbank, quantization, NNLS, Griffin-Lim, and full Mel roundtrip gates
(SURVEY.md §7 stage 1; BASELINE.json config 1)."""

import os

import numpy as np
import pytest

from audio_diffusion_tpu.mel import Mel, MelConfig
from audio_diffusion_tpu.ops.griffin_lim import griffin_lim, nnls
from audio_diffusion_tpu.ops.mel_filters import (
    db_to_uint8,
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    power_to_db,
    uint8_to_db,
)
from audio_diffusion_tpu.ops.stft import stft

from conftest import synth_audio


# --------------------------------------------------------------- filterbank

def _golden_slaney_mel(sr, n_fft, n_mels):
    """Independent reimplementation of the Slaney filterbank from the
    auditory-toolbox definition (what librosa.filters.mel computes with
    htk=False, norm='slaney'), written directly from the formula."""
    def to_mel(f):
        f = np.atleast_1d(np.asarray(f, dtype=float))
        m = f / (200.0 / 3)
        brk = 1000.0 / (200.0 / 3)
        lg = f >= 1000.0
        m[lg] = brk + np.log(f[lg] / 1000.0) / (np.log(6.4) / 27.0)
        return m

    def to_hz(m):
        m = np.atleast_1d(np.asarray(m, dtype=float))
        f = m * (200.0 / 3)
        brk = 1000.0 / (200.0 / 3)
        lg = m >= brk
        f[lg] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[lg] - brk))
        return f

    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_f = to_hz(np.linspace(float(to_mel(0.0)[0]), float(to_mel(sr / 2.0)[0]), n_mels + 2))
    weights = np.zeros((n_mels, len(fftfreqs)))
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights


@pytest.mark.parametrize("n_mels", [96, 256])
def test_mel_filterbank_matches_golden(n_mels):
    ours = mel_filterbank(22050, 2048, n_mels)
    golden = _golden_slaney_mel(22050, 2048, n_mels)
    np.testing.assert_allclose(ours, golden, atol=1e-6)


def test_mel_scale_roundtrip():
    hz = np.array([0.0, 200.0, 999.0, 1000.0, 5000.0, 11025.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(hz)), hz, rtol=1e-10)


# --------------------------------------------------------------- dB + quantize

def test_power_to_db_ref_max_and_floor():
    S = np.array([[[1e-12, 0.01, 1.0, 100.0]]])
    out = np.asarray(power_to_db(S, 80.0))[0, 0]
    # ref = max -> peak at 0 dB; floor at -80.
    assert out.max() == 0.0
    np.testing.assert_allclose(out, [-80.0, -40.0, -20.0, 0.0], atol=1e-5)


def test_uint8_quantization_exact_reference_semantics():
    # Exact reference math (audiodiffusion/mel.py:149): truncation after +0.5.
    log_S = np.linspace(-100, 5, 977).reshape(1, 1, -1).astype(np.float32)
    ours = np.asarray(db_to_uint8(log_S, 80.0))
    golden = (((log_S + 80.0) * 255.0 / 80.0).clip(0, 255) + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(ours, golden)
    # Dequantize (mel.py:163).
    deq = np.asarray(uint8_to_db(ours, 80.0))
    golden_deq = ours.astype(float) * 80.0 / 255.0 - 80.0
    np.testing.assert_allclose(deq, golden_deq, atol=1e-5)


def test_quantization_roundtrip_error_bound():
    log_S = np.random.default_rng(0).uniform(-80, 0, (4, 16, 16)).astype(np.float32)
    rt = np.asarray(uint8_to_db(db_to_uint8(log_S, 80.0), 80.0))
    assert np.abs(rt - log_S).max() <= 80.0 / 255.0  # half-step rounding + quantize


# --------------------------------------------------------------- NNLS

def test_nnls_recovers_nonnegative_solution():
    rng = np.random.default_rng(1)
    basis = mel_filterbank(22050, 1024, 64)  # (64, 513)
    x_true = np.abs(rng.standard_normal((8, 513))).astype(np.float32)
    y = x_true @ basis.T
    x_hat = np.asarray(nnls(basis, y, n_iter=200))
    assert x_hat.min() >= 0.0
    # The system is underdetermined; check the *fit*, not the solution.
    resid = np.linalg.norm(x_hat @ basis.T - y) / np.linalg.norm(y)
    assert resid < 1e-3


# --------------------------------------------------------------- Griffin-Lim

def _snr_db(ref, est):
    noise = ref - est
    return 10 * np.log10(np.sum(ref**2) / np.maximum(np.sum(noise**2), 1e-20))


def test_griffin_lim_reconstructs_magnitude():
    import jax

    audio = synth_audio(128 * 256 - 1, seed=3)
    mag = np.abs(np.asarray(stft(audio[None], 1024, 256)))
    rec = np.asarray(
        griffin_lim(mag, jax.random.key(0), 1024, 256, n_iter=32, length=audio.shape[0])
    )[0]
    mag_rec = np.abs(np.asarray(stft(rec[None], 1024, 256)))
    # Griffin-Lim converges in *spectral magnitude*, not waveform.
    rel = np.linalg.norm(mag_rec - mag) / np.linalg.norm(mag)
    assert rel < 0.15


# --------------------------------------------------------------- Mel end-to-end

def test_mel_roundtrip_snr_gate():
    """BASELINE.json config 1: 5s slice -> 256x256 mel image -> audio.
    Gate: the reconstructed audio's mel image matches the original image."""
    mel = Mel()
    audio = synth_audio(mel.slice_size)
    img = np.asarray(mel.spectrogram_images_from_audio(audio[None]))[0]
    assert img.shape == (256, 256) and img.dtype == np.uint8

    rec = np.asarray(mel.images_to_audio(img[None]))[0]
    assert rec.shape == ((256 - 1) * 512,)

    # Round-trip fidelity measured in mel-image space (the model's data domain).
    img2 = np.asarray(mel.spectrogram_images_from_audio(
        np.pad(rec, (0, mel.slice_size - rec.shape[0]))[None]
    ))[0]
    mae = np.abs(img.astype(float) - img2.astype(float)).mean()
    assert mae < 18.0, f"mel-image roundtrip MAE too high: {mae}"


def test_mel_reference_api_and_config():
    mel = Mel(x_res=64, y_res=64, hop_length=1024)
    assert mel.slice_size == 64 * 1024 - 1
    audio = synth_audio(3 * mel.slice_size + 100)
    mel.load_audio(raw_audio=audio)
    assert mel.get_number_of_slices() == 3
    assert mel.get_audio_slice(1).shape == (mel.slice_size,)
    img = mel.audio_slice_to_image(0)
    assert (img.width, img.height) == (64, 64)
    rec = mel.image_to_audio(img)
    assert rec.shape == ((64 - 1) * 1024,)
    assert mel.get_sample_rate() == 22050


def test_mel_pads_short_audio():
    mel = Mel(x_res=64, y_res=64, hop_length=1024)
    mel.load_audio(raw_audio=np.ones(1000, dtype=np.float32))
    assert len(mel.audio) == 64 * 1024  # padded (reference: mel.py:105-106)


def test_mel_config_roundtrip(tmp_path):
    mel = Mel(x_res=128, y_res=64, hop_length=256, n_iter=16)
    mel.save_pretrained(str(tmp_path))
    mel2 = Mel.from_pretrained(str(tmp_path))
    assert mel2.config == mel.config
    # diffusers-written configs carry extra private keys; they must be ignored.
    cfg = MelConfig.from_config({**mel.config.config_dict(), "_diffusers_version": "0.24.0"})
    assert cfg == mel.config


def test_batched_forward_matches_per_item():
    mel = Mel(x_res=32, y_res=32, hop_length=512)
    batch = np.stack([synth_audio(mel.slice_size, seed=s) for s in range(4)])
    full = np.asarray(mel.spectrogram_images_from_audio(batch))
    for i in range(4):
        single = np.asarray(mel.spectrogram_images_from_audio(batch[i][None]))[0]
        np.testing.assert_array_equal(full[i], single)


def test_power_to_db_scalar_ref():
    """librosa power_to_db with scalar ref: shift by 10*log10(ref), floor at
    peak - top_db (reference Mel allows ref overrides, mel.py:135)."""
    S = np.array([[[1e-9, 0.01, 1.0, 100.0]]])
    out = np.asarray(power_to_db(S, 80.0, ref=1.0))[0, 0]
    golden = 10 * np.log10(np.maximum(S[0, 0], 1e-10))
    golden = np.maximum(golden, golden.max() - 80.0)
    np.testing.assert_allclose(out, golden, atol=1e-5)


def test_mel_forward_ref_override():
    """Mel.audio_slice_to_image(ref=...) reaches the dB conversion (reference
    allows a ref override, mel.py:135)."""
    mel = Mel(x_res=16, y_res=16)
    audio = synth_audio(mel.slice_size)
    a = np.asarray(mel.spectrogram_images_from_audio(audio[None]))
    b = np.asarray(mel.spectrogram_images_from_audio(audio[None], ref=1.0))
    assert a.shape == b.shape
    assert (a != b).any()  # scalar ref shifts the dB scale
    mel.load_audio(raw_audio=audio)
    img = mel.audio_slice_to_image(0, ref=1.0)
    np.testing.assert_array_equal(np.asarray(img), b[0])


def test_mel_forward_callable_ref():
    """The reference's ref is Union[float, Callable] with default np.max
    (audiodiffusion/mel.py:135): a callable applies to the power spectrogram
    per sample (librosa's ref_value = abs(ref(S))). np.max must reproduce the
    ref=None default; np.mean must shift the scale; each batch row must use
    ITS OWN callable value (not a batch-global one)."""
    mel = Mel(x_res=16, y_res=16)
    loud = synth_audio(mel.slice_size, seed=0)
    quiet = 0.01 * synth_audio(mel.slice_size, seed=1)
    batch = np.stack([loud, quiet])
    default = np.asarray(mel.spectrogram_images_from_audio(batch))
    via_max = np.asarray(mel.spectrogram_images_from_audio(batch, ref=np.max))
    np.testing.assert_array_equal(via_max, default)  # np.max IS the default
    via_mean = np.asarray(mel.spectrogram_images_from_audio(batch, ref=np.mean))
    assert (via_mean != default).any()
    # Per-row application: each row alone must equal its row in the batch.
    for i in range(2):
        solo = np.asarray(mel.spectrogram_images_from_audio(batch[i][None], ref=np.mean))[0]
        np.testing.assert_array_equal(via_mean[i], solo)
    mel.load_audio(raw_audio=loud)
    img = mel.audio_slice_to_image(0, ref=np.mean)
    np.testing.assert_array_equal(np.asarray(img), via_mean[0])


def test_images_to_audio_shape_guard():
    mel = Mel(x_res=32, y_res=32)
    with pytest.raises(ValueError, match="expected .* mel images"):
        mel.images_to_audio(np.zeros((1, 16, 16), dtype=np.uint8))


# ------------------------------------------------------------ frozen goldens

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "mel_goldens.npz")


def test_mel_forward_matches_frozen_golden():
    """The 256x256 forward mel image is frozen (generated once from the
    torch-validated STFT path, VERDICT r1 weak #4): any filterbank / STFT /
    quantization regression shifts pixels. Tolerance: the uint8 quantizer may
    flip a pixel by 1 at bin boundaries across BLAS/XLA versions, so gate on
    max |diff| <= 1 AND mean |diff| < 0.02."""
    g = np.load(GOLDENS)
    mel = Mel()
    audio = synth_audio(mel.slice_size)
    img = np.asarray(mel.spectrogram_images_from_audio(audio[None]))[0]
    diff = np.abs(img.astype(int) - g["image_256"].astype(int))
    assert diff.max() <= 1, f"max pixel drift {diff.max()}"
    assert diff.mean() < 0.02, f"mean pixel drift {diff.mean()}"


def test_mel_roundtrip_mae_tight_gate():
    """Griffin-Lim + NNLS regression gate: roundtrip mel-image MAE frozen at
    the measured value (2.41 at 256x256, 4.99 at 64x64) + ~1 uint8 margin —
    a >1 dB Griffin-Lim regression now fails (replaces the loose MAE<18)."""
    g = np.load(GOLDENS)
    mel = Mel()
    audio = synth_audio(mel.slice_size)
    img = np.asarray(mel.spectrogram_images_from_audio(audio[None]))[0]
    rec = np.asarray(mel.images_to_audio(img[None]))[0]
    img2 = np.asarray(mel.spectrogram_images_from_audio(
        np.pad(rec, (0, mel.slice_size - rec.shape[0]))[None]))[0]
    mae = np.abs(img.astype(float) - img2.astype(float)).mean()
    assert mae < float(g["roundtrip_mae_256"]) + 1.1, f"256 roundtrip MAE {mae}"

    mel64 = Mel(x_res=64, y_res=64, hop_length=1024)
    a64 = synth_audio(mel64.slice_size, seed=4)
    i64 = np.asarray(mel64.spectrogram_images_from_audio(a64[None]))[0]
    r64 = np.asarray(mel64.images_to_audio(i64[None]))[0]
    i64b = np.asarray(mel64.spectrogram_images_from_audio(
        np.pad(r64, (0, mel64.slice_size - len(r64)))[None]))[0]
    mae64 = np.abs(i64.astype(float) - i64b.astype(float)).mean()
    assert mae64 < float(g["roundtrip_mae_64"]) + 1.1, f"64 roundtrip MAE {mae64}"


def test_griffin_lim_audio_matches_frozen_golden_loosely():
    """Reconstructed waveform head vs the frozen capture: Griffin-Lim is
    phase-iterative so tiny fp diffs compound — gate on correlation of the
    first 4096 samples rather than exactness."""
    g = np.load(GOLDENS)
    mel = Mel()
    audio = synth_audio(mel.slice_size)
    img = np.asarray(mel.spectrogram_images_from_audio(audio[None]))[0]
    rec = np.asarray(mel.images_to_audio(img[None]))[0][:4096]
    ref = g["rec_head_256"]
    c = np.corrcoef(rec, ref)[0, 1]
    assert c > 0.99, f"waveform correlation vs frozen golden: {c}"
