"""Beat tracking, loop_it, outpaint/remix stitching, and wrapper API gates."""

import jax
import numpy as np
import pytest

from audio_diffusion_tpu.audio_diffusion import AudioDiffusion
from audio_diffusion_tpu.ops.beat import beat_track, estimate_tempo, onset_strength
from audio_diffusion_tpu.pipelines.stitch import outpaint, remix


def click_track(bpm: float, seconds: float, sr: int = 22050) -> np.ndarray:
    """Synthetic drum-like track: decaying noise bursts on the beat grid."""
    n = int(seconds * sr)
    audio = np.zeros(n, dtype=np.float32)
    period = int(60 / bpm * sr)
    rng = np.random.default_rng(0)
    burst = (rng.standard_normal(800) * np.exp(-np.arange(800) / 120)).astype(np.float32)
    for start in range(0, n - 800, period):
        audio[start : start + 800] += burst
    audio += 0.05 * np.sin(2 * np.pi * 220 * np.arange(n) / sr).astype(np.float32)
    return audio


def test_onset_strength_peaks_on_beats():
    sr, bpm = 22050, 120
    audio = click_track(bpm, 4.0, sr)
    env = onset_strength(audio, sr)
    assert env.shape[0] > 0 and env.max() > 0
    # Onsets should be sparse: most frames are quiet.
    assert np.mean(env > 0.5 * env.max()) < 0.2


def test_tempo_estimate():
    sr = 22050
    for bpm in (100, 120, 140):
        audio = click_track(bpm, 6.0, sr)
        env = onset_strength(audio, sr)
        est = estimate_tempo(env, sr)
        # Accept the estimate or its octave (standard tempo ambiguity).
        ratios = [est / bpm, est / bpm / 2, est / bpm * 2]
        assert any(abs(r - 1) < 0.08 for r in ratios), f"bpm {bpm} -> {est}"


def test_beat_track_positions():
    sr, bpm = 22050, 120
    audio = click_track(bpm, 6.0, sr)
    tempo, beats = beat_track(audio, sr, units="samples")
    assert len(beats) >= 8
    intervals = np.diff(beats)
    period = 60 / bpm * sr
    # Median beat interval within 10% of the true period (or half/double).
    med = np.median(intervals)
    assert any(abs(med / (period * m) - 1) < 0.1 for m in (0.5, 1, 2)), med


def test_beat_track_silent_audio():
    tempo, beats = beat_track(np.zeros(22050, dtype=np.float32), 22050)
    assert len(beats) == 0 and tempo == 0.0


def test_loop_it_tiles_whole_bars():
    sr, bpm = 22050, 120
    audio = click_track(bpm, 6.0, sr)
    loop = AudioDiffusion.loop_it(audio, sr, loops=3)
    assert loop is not None
    # Loop length is a multiple of the looped segment.
    assert len(loop) % 3 == 0
    seg = len(loop) // 3
    np.testing.assert_array_equal(loop[:seg], loop[seg : 2 * seg])


def test_loop_it_returns_none_when_no_bars():
    # Too short for 5+ beats -> (len(beats)-1)//4*4 == 0 -> None.
    out = AudioDiffusion.loop_it(np.zeros(2048, dtype=np.float32), 22050)
    assert out is None


# ------------------------------------------------------------------ stitching

@pytest.fixture(scope="module")
def tiny_pipe():
    from audio_diffusion_tpu.mel import Mel
    from audio_diffusion_tpu.models import UNet2D, UNetConfig
    from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
    from audio_diffusion_tpu.schedulers import DDIMScheduler

    cfg = UNetConfig(sample_size=(16, 16), block_out_channels=(8, 16),
                     down_block_types=("DownBlock2D", "DownBlock2D"),
                     up_block_types=("UpBlock2D", "UpBlock2D"),
                     layers_per_block=1, norm_num_groups=4)
    unet = UNet2D(cfg)
    mel = Mel(x_res=16, y_res=16, hop_length=512, n_iter=2)
    return AudioDiffusionPipeline(unet, unet.init_params(jax.random.key(0)), mel, DDIMScheduler())


def test_outpaint_extends_audio(tiny_pipe):
    sr = tiny_pipe.mel.get_sample_rate()
    window_len = (tiny_pipe.mel.x_res - 1) * tiny_pipe.mel.hop_length  # generated length
    initial = np.random.default_rng(0).standard_normal(window_len).astype(np.float32) * 0.1
    overlap_secs = 0.1
    track = outpaint(tiny_pipe, initial, num_windows=2, overlap_secs=overlap_secs, steps=2)
    overlap = int(overlap_secs * sr)
    assert len(track) == len(initial) + 2 * (window_len - overlap)


def test_remix_covers_track(tiny_pipe):
    mel = tiny_pipe.mel
    sr = mel.get_sample_rate()
    slice_size = mel.x_res * mel.hop_length
    overlap_secs = 0.1
    stride = slice_size - int(overlap_secs * sr)
    track_audio = np.random.default_rng(1).standard_normal(2 * slice_size).astype(np.float32) * 0.1
    out = remix(tiny_pipe, track_audio, start_step=1, overlap_secs=overlap_secs, steps=2)
    n_windows = len(track_audio) // stride
    gen_len = (mel.x_res - 1) * mel.hop_length
    expected = gen_len + (n_windows - 1) * (gen_len - int(overlap_secs * sr))
    assert len(out) == expected


def test_remix_parallel_covers_track(tiny_pipe):
    """parallel=True restyles every window in ONE batched call and crossfades
    overlaps; same output length arithmetic as the serial mode."""
    mel = tiny_pipe.mel
    sr = mel.get_sample_rate()
    slice_size = mel.x_res * mel.hop_length
    overlap_secs = 0.1
    stride = slice_size - int(overlap_secs * sr)
    track_audio = np.random.default_rng(1).standard_normal(3 * slice_size).astype(np.float32) * 0.1
    out = remix(tiny_pipe, track_audio, start_step=1, overlap_secs=overlap_secs,
                steps=2, parallel=True)
    n_windows = len(track_audio) // stride
    gen_len = (mel.x_res - 1) * mel.hop_length
    expected = gen_len + (n_windows - 1) * (gen_len - int(overlap_secs * sr))
    assert len(out) == expected
    assert np.isfinite(out).all()
    # Every window shares the pinned initial noise (the serial semantics) but
    # sees its own input slice, so windows must differ.
    assert not np.array_equal(out[:gen_len], out[-gen_len:])


def test_stitch_rejects_oversized_overlap(tiny_pipe):
    """An overlap >= the model's generation window used to yield silently
    empty / non-advancing output (caught by the examples smoke on a tiny
    model) — now a ValueError naming the window length."""
    import pytest

    from audio_diffusion_tpu.pipelines.stitch import outpaint

    slice_secs = tiny_pipe.mel.x_res * tiny_pipe.mel.hop_length / tiny_pipe.mel.get_sample_rate()
    audio = np.zeros(4096, np.float32)
    with pytest.raises(ValueError, match="generation window"):
        outpaint(tiny_pipe, audio, num_windows=1, overlap_secs=slice_secs + 1)
    with pytest.raises(ValueError, match="generation window"):
        remix(tiny_pipe, audio, start_step=1, steps=2, overlap_secs=slice_secs + 1)
    with pytest.raises(ValueError, match="generation window"):
        remix(tiny_pipe, audio, start_step=1, steps=2, overlap_secs=slice_secs + 1,
              parallel=True)
