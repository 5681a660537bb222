"""STFT/ISTFT golden tests against torch.stft (independent FFT implementation)
and analytic properties. librosa itself is unavailable in this environment, so
torch.stft with matched conventions (periodic Hann, center=True, zero padding)
serves as the external golden for librosa-parity — the conventions are
identical for these settings."""

import numpy as np
import pytest
import torch

from audio_diffusion_tpu.ops.stft import hann_window, istft, num_frames, stft

from conftest import synth_audio


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256), (2048, 1024)])
def test_stft_matches_torch(n_fft, hop):
    audio = synth_audio(256 * 512 - 1)
    ours = np.asarray(stft(audio[None], n_fft, hop))[0]  # (frames, freq)
    golden = torch.stft(
        torch.from_numpy(audio),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft, periodic=True),
        center=True,
        pad_mode="constant",
        return_complex=True,
    ).numpy().T  # torch gives (freq, frames)
    assert ours.shape == golden.shape
    scale = np.abs(golden).max()
    np.testing.assert_allclose(np.abs(ours), np.abs(golden), atol=2e-3 * scale)
    # Phase agreement where magnitude is non-negligible.
    mask = np.abs(golden) > 1e-2 * scale
    np.testing.assert_allclose(
        np.angle(ours[mask] / golden[mask]), 0.0, atol=5e-2
    )


def test_frame_count_matches_reference_slice_trick():
    # slice_size = x_res * hop - 1 must give exactly x_res frames
    # (reference: audiodiffusion/mel.py:90).
    assert num_frames(256 * 512 - 1, 2048, 512) == 256
    assert num_frames(64 * 1024 - 1, 2048, 1024) == 64


def test_istft_roundtrip():
    audio = synth_audio(255 * 512)  # length = (frames-1)*hop for exact istft default
    spec = stft(audio[None], 2048, 512)
    rec = np.asarray(istft(spec, 2048, 512))[0]
    assert rec.shape == audio.shape
    # Interior reconstruction is near-perfect (COLA); edges are window-tapered.
    err = np.abs(rec[2048:-2048] - audio[2048:-2048])
    assert err.max() < 1e-4


def test_istft_matches_torch():
    audio = synth_audio(255 * 512)
    spec = stft(audio[None], 2048, 512)
    ours = np.asarray(istft(spec, 2048, 512, length=audio.shape[0]))[0]
    golden = torch.istft(
        torch.from_numpy(np.asarray(spec)[0].T.copy()),
        n_fft=2048,
        hop_length=512,
        window=torch.hann_window(2048, periodic=True),
        center=True,
        length=audio.shape[0],
    ).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_batched_stft_matches_loop():
    batch = np.stack([synth_audio(64 * 256 - 1, seed=s) for s in range(3)])
    full = np.asarray(stft(batch, 1024, 256))
    for i in range(3):
        single = np.asarray(stft(batch[i][None], 1024, 256))[0]
        np.testing.assert_allclose(full[i], single, atol=1e-6)


def test_hann_window_periodic():
    w = hann_window(8)
    golden = 0.5 * (1 - np.cos(2 * np.pi * np.arange(8) / 8))
    np.testing.assert_allclose(w, golden, atol=1e-12)
    assert w[0] == 0.0  # periodic (fftbins=True), not symmetric
