"""Notebook smoke gates: the notebooks/ matrix mirrors the reference's
notebooks (its only test/docs surface, SURVEY.md §4) and must stay runnable —
each executes top-to-bottom at toy scale here, so a rotted notebook fails CI
instead of rotting as documentation (same contract as tests/test_examples.py
for the script forms).

Each notebook executes in its own jupyter kernel via nbclient, launched from a
subprocess whose env forces the CPU backend the same way CPU-only user scripts
do (PYTHONPATH = repo root only, dropping any site dir that registers an
accelerator backend; JAX_PLATFORMS=cpu — see CLAUDE.md). gradio_app.ipynb is
exercised too: its default (no AD_LAUNCH=1) prints instructions and must not
require gradio.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOKS = os.path.join(REPO, "notebooks")

RUNNER = """
import sys
import nbformat
from nbclient import NotebookClient

nb = nbformat.read(sys.argv[1], as_version=4)
NotebookClient(nb, timeout=900, kernel_name="python3").execute()
"""


def run_notebook(name, timeout=1200):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, os.path.join(NOTEBOOKS, name)],
        cwd=NOTEBOOKS, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{name} failed\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-5000:]}"
    )


@pytest.mark.parametrize("name", [
    "test_mel.ipynb",
    "test_model.ipynb",
    "audio_diffusion_pipeline.ipynb",
    "test_vae.ipynb",
    "train_model.ipynb",
    "conditional_generation.ipynb",
    "audio_encoder.ipynb",
    "gradio_app.ipynb",
])
def test_notebook_executes(name):
    run_notebook(name)
