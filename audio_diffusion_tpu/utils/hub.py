"""Hugging Face Hub interop: load models by Hub id, push trained pipelines.

Reference parity:

* **Load by id** — the reference's ``AudioDiffusionPipeline.from_pretrained``
  accepts either a local directory or a Hub model id like
  ``teticio/audio-diffusion-256`` (diffusers resolves the id;
  /root/reference/audiodiffusion/__init__.py:24-30 documents "local directory
  or Hugging Face Hub"). :func:`resolve_pretrained` gives this framework the
  same surface: Hub ids are materialized to a local snapshot directory (the
  torch-format loader then converts the diffusers checkpoint).
* **Push during training** — the reference creates/clones the repo BEFORE
  training so auth failures surface immediately
  (/root/reference/scripts/train_unet.py:192-197) and pushes on every model
  save with ``commit_message=f"Epoch {epoch}"`` (306-311); CLI flags at
  385-388. :func:`ensure_repo` / :func:`push_folder` are the same two moments
  over the modern HTTP API (``create_repo`` + ``upload_folder``) instead of
  the deprecated git-backed ``Repository`` the reference uses.

Zero-egress environments are first-class: id resolution tries the local HF
cache (``local_files_only=True``) before touching the network, and network
failures raise ONE actionable error instead of retrying — a training run with
``push_to_hub`` set fails in seconds at startup, not after hours at the first
save.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Optional

logger = logging.getLogger("audio_diffusion_tpu.hub")

# "namespace/name" — the Hub's repo id shape. Anchored single slash so
# relative paths like "models/run3" (which also contain one slash) are only
# treated as ids when they do NOT exist locally (checked first by callers).
_MODEL_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._\-]*/[A-Za-z0-9._\-]+$")


def looks_like_model_id(name: str) -> bool:
    return bool(_MODEL_ID_RE.match(name))


def resolve_pretrained(path_or_id: str) -> str:
    """Resolve a ``from_pretrained`` argument to a local directory.

    Local directories pass through untouched. Hub model ids resolve via the
    local HF cache first (works fully offline for anything previously
    downloaded), then the network. Anything else — and ids that cannot be
    fetched — raises ``FileNotFoundError`` with the fix spelled out.
    """
    if os.path.isdir(path_or_id):
        return path_or_id
    if not looks_like_model_id(path_or_id):
        raise FileNotFoundError(
            f"{path_or_id!r} is neither a local directory nor a Hub model id "
            "(expected 'namespace/name', e.g. 'teticio/audio-diffusion-256'). "
            "Pass the path of a saved pipeline directory or a Hub id."
        )
    from huggingface_hub import snapshot_download

    try:
        local = snapshot_download(path_or_id, local_files_only=True)
        logger.info("resolved %s from the local HF cache: %s", path_or_id, local)
        return local
    except Exception:
        pass  # not cached — fall through to the network
    try:
        return snapshot_download(path_or_id)
    except Exception as e:
        raise FileNotFoundError(
            f"Hub model {path_or_id!r} is not in the local HF cache and could "
            f"not be downloaded ({type(e).__name__}: {e}). In an offline / "
            "zero-egress environment, download the repository on a connected "
            "machine (`huggingface-cli download " + path_or_id + "`), copy it "
            "here, and pass its local path instead."
        ) from e


def ensure_repo(
    repo_id: Optional[str],
    output_dir: str,
    token: Optional[str] = None,
    private: bool = False,
) -> str:
    """Create (or reuse) the Hub repo a training run will push to, and return
    its full id. Called once at training START so a bad token / no network
    fails fast (reference: train_unet.py:192-197 clones before the loop).
    When ``repo_id`` is None the repo is named after the output directory
    under the token's namespace, like the reference's ``get_full_repo_name``.
    """
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    try:
        if repo_id is None:
            name = os.path.basename(os.path.normpath(output_dir))
            repo_id = f"{api.whoami()['name']}/{name}"
        # Return the id the Hub ACTUALLY created: a bare name like "myrepo"
        # is created under the token's namespace as "user/myrepo", and pushes
        # against the bare name would 404.
        return api.create_repo(repo_id, private=private, exist_ok=True).repo_id
    except Exception as e:
        raise RuntimeError(
            f"push_to_hub is enabled but the Hub repo {repo_id or output_dir!r} "
            f"could not be created ({type(e).__name__}: {e}). This needs network "
            "egress and a valid token (pass --hub_token or `huggingface-cli "
            "login`); in an offline environment drop --push_to_hub and upload "
            "the saved output_dir later with `huggingface-cli upload`."
        ) from e


def push_folder(
    directory: str,
    repo_id: str,
    token: Optional[str] = None,
    message: Optional[str] = None,
) -> None:
    """Upload a saved pipeline directory to the Hub (reference pushes the
    whole output_dir each save, train_unet.py:306-311). Orbax train-state
    checkpoints and tensorboard logs stay local: they are resume/monitoring
    artifacts, not part of the published model, and are far larger than the
    pipeline weights."""
    from huggingface_hub import HfApi

    HfApi(token=token).upload_folder(
        folder_path=directory,
        repo_id=repo_id,
        commit_message=message or "Upload AudioDiffusionPipeline",
        ignore_patterns=["checkpoints/**", "logs/**"],
    )
