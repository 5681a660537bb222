"""Demo apps are import-gated: without gradio/streamlit they exit with a
clear message instead of a traceback."""

import subprocess
import sys

import pytest


@pytest.mark.parametrize("app,dep", [("app.py", "gradio"), ("streamlit_app.py", "streamlit")])
def test_app_gated_without_dependency(app, dep):
    try:
        __import__(dep)
        pytest.skip(f"{dep} installed; gating not exercised")
    except ImportError:
        pass
    r = subprocess.run([sys.executable, app], capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert dep in (r.stderr + r.stdout)
    assert "Traceback" not in r.stderr
