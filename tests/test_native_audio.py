"""Native C++ audio I/O gates: decode parity with the Python path, resample
quality vs scipy, threaded batch decode, graceful fallback."""

import numpy as np
import pytest

from audio_diffusion_tpu.data import native_audio
from audio_diffusion_tpu.ops.audio_io import load_audio, write_wav

from conftest import synth_audio

pytestmark = pytest.mark.skipif(
    not native_audio.available(), reason="native library failed to build (no g++)"
)


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    audio = synth_audio(22050 * 2)
    path = str(d / "a.wav")
    write_wav(path, audio, 22050)
    return path, audio


def test_native_decode_matches_python(wav_file):
    path, audio = wav_file
    native = native_audio.load_wav(path, 22050)
    assert native is not None and native.shape == audio.shape
    np.testing.assert_allclose(native, audio, atol=2e-4)  # 16-bit quantization


def test_native_resample_matches_scipy(wav_file):
    path, _ = wav_file
    from scipy.signal import resample_poly

    rng = np.random.default_rng(0)
    t = np.arange(44100) / 44100
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32) + 0.1 * rng.standard_normal(44100).astype(np.float32)
    ours = native_audio.resample(x, 44100, 22050)
    golden = resample_poly(x.astype(np.float64), 1, 2).astype(np.float32)
    assert ours is not None
    assert abs(len(ours) - len(golden)) <= 1
    n = min(len(ours), len(golden))
    # Same filter design -> near-identical output (edges included).
    err = np.abs(ours[:n] - golden[:n])
    snr = 10 * np.log10(np.sum(golden[:n] ** 2) / max(np.sum(err**2), 1e-20))
    assert snr > 40, f"resample SNR {snr:.1f} dB"


def test_native_resample_upsample(wav_file):
    x = synth_audio(11025)
    ours = native_audio.resample(x, 11025, 22050)
    assert ours is not None and len(ours) == 22050


def test_native_batch_decode(tmp_path):
    paths = []
    for i in range(6):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, synth_audio(22050, seed=i), 22050)
        paths.append(p)
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"junk")
    paths.append(bad)

    out = native_audio.load_batch(paths, 22050, n_threads=4)
    assert len(out) == 7
    assert all(o is not None and o.shape == (22050,) for o in out[:6])
    assert out[6] is None  # failed decode marked, not crashed


def test_load_audio_uses_native_path(wav_file):
    path, audio = wav_file
    out = load_audio(path, 22050)
    np.testing.assert_allclose(out, audio, atol=2e-4)


def test_load_audio_native_resamples(tmp_path):
    audio = synth_audio(44100, sr=44100)
    p = str(tmp_path / "x.wav")
    write_wav(p, audio, 44100)
    out = load_audio(p, 22050)
    assert abs(len(out) - 22050) <= 1


def test_native_decode_truncated_and_malformed(tmp_path):
    """Malformed/truncated WAVs must fail cleanly, never crash (the parser
    sees arbitrary user files during dataset prep)."""
    import struct

    cases = {}
    # Truncated fmt chunk: declares 16 bytes but the file ends after 4.
    header = b"RIFF" + struct.pack("<I", 100) + b"WAVE"
    cases["truncated_fmt.wav"] = header + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    # fmt chunk length lies beyond the buffer after a junk chunk.
    cases["lying_len.wav"] = (
        header + b"JUNK" + struct.pack("<I", 4) + b"xxxx" + b"fmt " + struct.pack("<I", 64) + b"\x01\x00\x02\x00"
    )
    # data chunk with no fmt at all.
    cases["no_fmt.wav"] = header + b"data" + struct.pack("<I", 8) + b"\x00" * 8
    # zero-size declared RIFF with trailing garbage.
    cases["garbage.wav"] = b"RIFF\x00\x00\x00\x00WAVExxxxxxxxxxxxxxxxxxxxxxxx"

    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        out = native_audio.load_wav(str(p), 22050)
        assert out is None, f"{name} should fail cleanly"


def test_native_decode_extensible_format(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) PCM files decode via the sub-format."""
    import struct

    sr, n = 22050, 1000
    pcm = (np.sin(np.arange(n) * 0.05) * 20000).astype(np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 2, 2, 16)
    # cbSize=22, validBits=16, channelMask=0x4, SubFormat GUID (PCM: 01 00 ...)
    fmt += struct.pack("<HHI", 22, 16, 0x4) + b"\x01\x00" + b"\x00" * 14
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    p = tmp_path / "ext.wav"
    p.write_bytes(blob)
    out = native_audio.load_wav(str(p), sr)
    assert out is not None and out.shape == (n,)
