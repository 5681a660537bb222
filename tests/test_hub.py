"""Hub interop gates: load-by-model-id resolution and push-after-train wiring
(reference surface: audiodiffusion/__init__.py:24-30 loads by "local directory
or Hugging Face Hub" id; scripts/train_unet.py:192-197,306-311,385-388 creates
the repo before training and pushes every model save). The network itself is
mocked — this environment has no egress — so these tests pin the resolution
logic, the fail-fast ordering, and the exact upload call the trainer makes."""

import os

import jax
import numpy as np
import pytest

from audio_diffusion_tpu.mel import Mel
from audio_diffusion_tpu.models import UNet2D, UNetConfig
from audio_diffusion_tpu.pipelines import AudioDiffusionPipeline
from audio_diffusion_tpu.schedulers import DDIMScheduler, SchedulerConfig
from audio_diffusion_tpu.utils.hub import looks_like_model_id, resolve_pretrained

RES = 16
HOP = 512


def tiny_pipeline():
    cfg = UNetConfig(
        sample_size=(RES, RES),
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
    )
    unet = UNet2D(cfg)
    return AudioDiffusionPipeline(
        unet,
        unet.init_params(jax.random.key(0)),
        Mel(x_res=RES, y_res=RES, hop_length=HOP),
        DDIMScheduler(SchedulerConfig(num_train_timesteps=100)),
    )


def test_looks_like_model_id():
    assert looks_like_model_id("teticio/audio-diffusion-256")
    assert looks_like_model_id("user/model.v2")
    assert not looks_like_model_id("just-a-name")
    assert not looks_like_model_id("a/b/c")
    assert not looks_like_model_id("/absolute/path")
    assert not looks_like_model_id("./relative/path")


def test_resolve_local_dir_passthrough(tmp_path):
    d = str(tmp_path)
    assert resolve_pretrained(d) == d


def test_resolve_rejects_non_id_non_dir():
    with pytest.raises(FileNotFoundError, match="neither a local directory nor a Hub model id"):
        resolve_pretrained("no-such-directory-anywhere")


def test_from_pretrained_by_model_id(tmp_path, monkeypatch):
    """A Hub id resolves through snapshot_download and the snapshot loads as a
    normal pipeline directory (cache-first: local_files_only on the first try)."""
    saved = str(tmp_path / "snapshot")
    tiny_pipeline().save_pretrained(saved)

    calls = []

    def fake_snapshot_download(repo_id, local_files_only=False, **kw):
        calls.append((repo_id, local_files_only))
        return saved

    monkeypatch.setattr("huggingface_hub.snapshot_download", fake_snapshot_download)
    pipe = AudioDiffusionPipeline.from_pretrained("user/tiny-model")
    assert calls == [("user/tiny-model", True)]  # cache hit on the offline try
    raw = pipe(batch_size=1, steps=2, return_images_only=True)
    assert raw.shape == (1, RES, RES)


def test_resolve_unfetchable_id_is_actionable(monkeypatch):
    def fake_snapshot_download(repo_id, **kw):
        raise ConnectionError("no egress")

    monkeypatch.setattr("huggingface_hub.snapshot_download", fake_snapshot_download)
    with pytest.raises(FileNotFoundError, match="user/missing-model"):
        resolve_pretrained("user/missing-model")


class FakeHfApi:
    """Records the calls the trainer makes. Class-level log so the instances
    constructed inside the library are observable from the test."""

    log = []
    fail_create = False

    def __init__(self, token=None):
        self.token = token

    def whoami(self):
        return {"name": "testuser"}

    def create_repo(self, repo_id, private=False, exist_ok=False):
        if FakeHfApi.fail_create:
            raise ConnectionError("no egress")
        FakeHfApi.log.append(("create_repo", repo_id, private, self.token))
        # Like the real API: a bare name resolves under the token's namespace,
        # and the RepoUrl's repo_id is the full id pushes must target.
        full = repo_id if "/" in repo_id else f"{self.whoami()['name']}/{repo_id}"
        return type("RepoUrl", (), {"repo_id": full})()

    def upload_folder(self, folder_path, repo_id, commit_message, ignore_patterns=None):
        # Snapshot what is actually uploadable at push time: the pipeline must
        # already be saved, and resume/monitoring artifacts must be excluded.
        FakeHfApi.log.append(
            ("upload_folder", folder_path, repo_id, commit_message,
             tuple(ignore_patterns or ()),
             os.path.exists(os.path.join(folder_path, "model_index.json")))
        )


def test_ensure_repo_returns_namespaced_id(monkeypatch):
    """A bare --hub_model_id like 'myrepo' is created under the token's
    namespace; pushes must target THAT id, not the bare name (which 404s)."""
    from audio_diffusion_tpu.utils.hub import ensure_repo

    monkeypatch.setattr("huggingface_hub.HfApi", FakeHfApi)
    FakeHfApi.log, FakeHfApi.fail_create = [], False
    assert ensure_repo("myrepo", "out") == "testuser/myrepo"
    assert ensure_repo("org/myrepo", "out") == "org/myrepo"
    assert ensure_repo(None, "runs/mymodel") == "testuser/mymodel"


@pytest.fixture
def hub_dataset(tmp_path_factory):
    from audio_diffusion_tpu.data.prepare import audio_to_images
    from audio_diffusion_tpu.ops.audio_io import write_wav
    from conftest import synth_audio

    d = tmp_path_factory.mktemp("hub_audio")
    write_wav(str(d / "a.wav"), synth_audio(2 * (RES * HOP - 1) + 50, seed=0), 22050)
    out = str(tmp_path_factory.mktemp("hub_ds") / "data")
    audio_to_images(str(d), out, resolution=(RES, RES), hop_length=HOP)
    return out


def test_training_pushes_on_save(hub_dataset, tmp_path, monkeypatch):
    from audio_diffusion_tpu.training.loop import RunConfig, run_training
    from audio_diffusion_tpu.training.train_unet import TrainConfig

    monkeypatch.setattr("huggingface_hub.HfApi", FakeHfApi)
    FakeHfApi.log, FakeHfApi.fail_create = [], False

    seed_dir = str(tmp_path / "seed")
    tiny_pipeline().save_pretrained(seed_dir)
    out = str(tmp_path / "model")
    run = RunConfig(
        dataset=hub_dataset, output_dir=out, num_epochs=1, train_batch_size=1,
        eval_batch_size=1, save_images_epochs=1000, save_model_epochs=1,
        scheduler="ddim", num_train_steps=100, hop_length=HOP, max_steps=2,
        from_pretrained=seed_dir,
        push_to_hub=True, hub_token="tok", hub_private_repo=True,
    )
    result = run_training(run, TrainConfig(lr_warmup_steps=2, use_ema=True))
    assert result["steps"] == 2

    creates = [c for c in FakeHfApi.log if c[0] == "create_repo"]
    uploads = [c for c in FakeHfApi.log if c[0] == "upload_folder"]
    # Repo created exactly once, BEFORE the first upload, named after
    # output_dir under the token's namespace (hub_model_id=None), private.
    assert creates == [("create_repo", "testuser/model", True, "tok")]
    assert FakeHfApi.log[0][0] == "create_repo"
    assert len(uploads) == 1
    _, folder, repo_id, message, ignores, saved_first = uploads[0]
    assert folder == out and repo_id == "testuser/model"
    assert message == "Epoch 0"
    assert saved_first, "upload must happen after save_pretrained"
    assert "checkpoints/**" in ignores and "logs/**" in ignores


def test_push_to_hub_fails_fast_without_network(monkeypatch):
    """A bad token / no egress aborts at startup — before the dataset is even
    opened (reference creates the repo before training for the same reason)."""
    from audio_diffusion_tpu.training.loop import RunConfig, run_training
    from audio_diffusion_tpu.training.train_unet import TrainConfig

    monkeypatch.setattr("huggingface_hub.HfApi", FakeHfApi)
    FakeHfApi.log, FakeHfApi.fail_create = [], True
    run = RunConfig(dataset="does-not-exist-never-opened",
                    push_to_hub=True, hub_model_id="user/m")
    with pytest.raises(RuntimeError, match="push_to_hub .*could not be created"):
        run_training(run, TrainConfig())
    FakeHfApi.fail_create = False
