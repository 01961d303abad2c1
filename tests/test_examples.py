"""The runnable examples stay runnable (reference examples/, component #29)."""
import runpy
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def _run(script: str, argv: list[str]):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(str(ROOT / script), run_name="__main__")
    finally:
        sys.argv = old


def test_data_loading_example(capsys):
    _run("examples/data_loading.py", [])
    assert "batch:" in capsys.readouterr().out


def test_finetune_from_hub_example(capsys):
    _run("examples/finetune_from_hub.py", ["--epochs", "1"])
    out = capsys.readouterr().out
    assert "epoch 0" in out
